package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Graphs, Profile}
import graft.util.Tables._

/** Community-quality & privacy-planning batch: Newman modularity of
  * the label-propagation communities and the k-anonymity
  * generalization ladder ([[graft.ops.Graphs.modularity]],
  * [[graft.ops.Profile.anonymityLadder]]).
  */
object CommunityQueries {

  private val LpaIters = 3
  private val AnonK = 5L

  val all: Seq[Q] = Seq(

    // Modularity of q128's communities on the supplier graph: per
    // community intra-edge and degree mass plus the global Q — turns
    // "here are labels" into "are they denser than chance".
    Q("q264_modularity",
      Some {
        val iterCtes = (1 to LpaIters).map { i =>
          s"""l$i AS (
             |  SELECT vertex, label FROM (
             |    SELECT s.dst AS vertex, l.label, count(*) AS c,
             |      row_number() OVER (PARTITION BY s.dst
             |        ORDER BY count(*) DESC, l.label) AS rn
             |    FROM sym s JOIN l${i - 1} l ON s.src = l.vertex
             |    GROUP BY s.dst, l.label) t
             |  WHERE rn = 1)""".stripMargin
        }.mkString(",\n")
        s"""${DepthQueries.edgesCte},
           |l0 AS (SELECT src AS vertex, src AS label FROM deg),
           |$iterCtes,
           |asg AS (SELECT vertex, label FROM l$LpaIters),
           |m AS (SELECT count(*)::BIGINT AS m FROM e0),
           |dmass AS (
           |  SELECT a.label, count(*)::BIGINT AS n_vertices,
           |    sum(d.deg)::BIGINT AS d_c
           |  FROM deg d JOIN asg a ON a.vertex = d.src
           |  GROUP BY 1),
           |intra AS (
           |  SELECT sa.label, count(*)::BIGINT AS e_c
           |  FROM e0
           |  JOIN asg sa ON sa.vertex = e0.src
           |  JOIN asg sb ON sb.vertex = e0.dst
           |  WHERE sa.label = sb.label GROUP BY 1),
           |perc AS (
           |  SELECT dm.label, dm.n_vertices,
           |    coalesce(i.e_c, 0)::BIGINT AS e_c, dm.d_c, m.m,
           |    coalesce(i.e_c, 0)::DOUBLE / m.m
           |      - (dm.d_c::DOUBLE / (2.0 * m.m))
           |        * (dm.d_c::DOUBLE / (2.0 * m.m)) AS contrib
           |  FROM dmass dm LEFT JOIN intra i USING (label)
           |  CROSS JOIN m)
           |SELECT label, n_vertices, e_c, d_c,
           |  round(contrib, 6) AS contrib_r,
           |  round(sum(round(contrib, 12)::DECIMAL(28,12)) OVER ()
           |    ::DOUBLE, 6) AS modularity_r
           |FROM perc ORDER BY label""".stripMargin
      },
      (s, d) => {
        val edges = suppEdgeTable(s, d).cache()
        Graphs.modularity(edges,
            Graphs.labelPropagation(edges, LpaIters))
          .orderBy("label")
      }),

    // k-anonymity generalization ladder over event quasi-identifiers:
    // (user, hour) → (user-decile, day) → (user-decile, week) — how
    // much coarsening before every equivalence class reaches k = 5.
    Q("q265_anon_ladder",
      Some(s"""WITH base AS (
              |  SELECT user_id, user_id % 10 AS ub,
              |    date_trunc('hour', ts) AS hh, ts::DATE AS dd,
              |    date_trunc('week', ts)::DATE AS ww
              |  FROM events),
              |lv AS (
              |  SELECT 'L0_user_hour' AS level, count(*)::BIGINT AS sz
              |  FROM base GROUP BY user_id, hh
              |  UNION ALL
              |  SELECT 'L1_bucket_day', count(*)::BIGINT
              |  FROM base GROUP BY ub, dd
              |  UNION ALL
              |  SELECT 'L2_bucket_week', count(*)::BIGINT
              |  FROM base GROUP BY ub, ww)
              |SELECT level, count(*)::BIGINT AS n_classes,
              |  min(sz)::BIGINT AS min_k,
              |  round(quantile_cont(sz, 0.5), 6) AS median_k_r,
              |  sum(CASE WHEN sz < $AnonK THEN 1 ELSE 0 END)::BIGINT
              |    AS n_below_k,
              |  sum(CASE WHEN sz < $AnonK THEN 1 ELSE 0 END) = 0
              |    AS k_anonymous
              |FROM lv GROUP BY 1 ORDER BY level""".stripMargin),
      (s, d) => Profile.anonymityLadder(events(s, d),
          Seq(
            "L0_user_hour" -> Seq(col("user_id"),
              date_trunc("hour", col("ts"))),
            "L1_bucket_day" -> Seq(col("user_id") % 10,
              to_date(col("ts"))),
            "L2_bucket_week" -> Seq(col("user_id") % 10,
              date_trunc("week", col("ts")).cast("date"))),
          AnonK)
        .orderBy("level")))
}
