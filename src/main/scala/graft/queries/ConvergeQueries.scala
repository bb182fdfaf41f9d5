package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Graphs, Infer}
import graft.util.Tables._

/** Round-12 closers: the delta-dedup probe against the PERSISTED
  * shingle/band layout (the round's storage theme closed end-to-end),
  * Storey's adaptive-FDR π₀, and the PageRank convergence audit on the
  * persisted bucketed edge table. */
object ConvergeQueries {

  private val StoreyLambda = 0.5
  private val PrcIters = 6
  private val PrcDamping = 0.85

  val all: Seq[Q] = Seq(

    // q147's incremental near-dup, now probing the PERSISTED band/
    // shingle index: the base corpus is NOT re-shingled — its persisted
    // tables are filtered to base ids (pushdown on the bucketed scan);
    // only the 10% delta slice is hashed. Result equals q147 exactly
    // (same SQL twin) — the daily-ETL shape the deltaNearDupsOnIndex
    // seam exists for, now measured against the real layout.
    Q("q435_delta_neardup_indexed",
      Registry0.q147Sql,
      (s, d) => {
        val docs = documents(s, d)
        Dedup.deltaNearDupsOnIndex(
            docBandTable(s, d)
              .where(pmod(col("doc_id"), lit(10)) =!= 0),
            docShingleTable(s, d)
              .where(pmod(col("doc_id"), lit(10)) =!= 0),
            docs.filter(pmod(col("doc_id"), lit(10)) === 0),
            "doc_id", "text", 0.5)
          .orderBy("doc_new", "doc_base")
      }),

    // Storey's pi0 over the q232 per-type z-test p-values: the
    // true-null fraction that upgrades BH to the adaptive procedure.
    Q("q436_storey_pi0",
      Some(s"""WITH v AS (
              |  SELECT event_type,
              |    CAST(round(value * 1000000) AS BIGINT) AS v6
              |  FROM events),
              |g AS (
              |  SELECT count(*)::BIGINT AS n, sum(v6)::DOUBLE AS s,
              |    sum(v6::HUGEINT * v6)::DOUBLE AS ss
              |  FROM v),
              |t AS (
              |  SELECT event_type, count(*)::BIGINT AS n_g,
              |    sum(v6)::DOUBLE AS s_g
              |  FROM v GROUP BY 1),
              |z AS (
              |  SELECT event_type,
              |    (s_g / n_g - s / n)
              |      / sqrt(((ss - s * s / n) / (n - 1)) / n_g) AS z
              |  FROM t, g WHERE (ss - s * s / n) / (n - 1) > 0),
              |p AS (
              |  SELECT 2.0 * (1.0 - ${Infer.normalCdfSql("abs(z)")})
              |    AS p
              |  FROM z)
              |SELECT count(*)::BIGINT AS m,
              |  sum(CASE WHEN p > $StoreyLambda THEN 1 ELSE 0 END)
              |    ::BIGINT AS n_above_lambda,
              |  round(least(1.0,
              |    sum(CASE WHEN p > $StoreyLambda THEN 1 ELSE 0 END)
              |      ::DOUBLE / (${1.0 - StoreyLambda} * count(*))), 6)
              |    AS pi0_r
              |FROM p""".stripMargin),
      (s, d) => {
        val v = events(s, d).select(col("event_type"),
          round(col("value") * lit(1000000.0)).cast("long").as("_v6"))
        val g = v.agg(count(lit(1)).as("n"),
          sum(col("_v6")).cast("double").as("s"),
          sum(col("_v6").cast("decimal(38,0)") * col("_v6"))
            .cast("double").as("ss"))
        val t = v.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_g"),
            sum(col("_v6")).cast("double").as("s_g"))
        val vg = (col("ss") - col("s") * col("s") / col("n")) /
          (col("n") - lit(1))
        val p = t.crossJoin(broadcast(g))
          .where(vg > 0)
          .withColumn("z", (col("s_g") / col("n_g")
            - col("s") / col("n")) / sqrt(vg / col("n_g")))
          .select((lit(2.0) * (lit(1.0) - Infer.normalCdf(abs(col("z")))))
            .as("p"))
        Infer.storeyPi0(p, "p", StoreyLambda)
      }),

    // PageRank convergence audit on the persisted supplier edge table:
    // per-iteration L1 movement — how many iterations this graph
    // actually needs (the iteration-budget diagnostic).
    Q("q437_pagerank_convergence", {
        val iterCtes = (1 to PrcIters).map { i =>
          s"""r$i AS MATERIALIZED (
             |  SELECT s.dst AS vertex,
             |    ${1.0 - PrcDamping}::DOUBLE / nn.n +
             |    $PrcDamping::DOUBLE * sum(r.pr / d.deg) AS pr
             |  FROM sym s JOIN r${i - 1} r ON s.src = r.vertex
             |    JOIN deg d ON s.src = d.src, nn
             |  GROUP BY s.dst, nn.n),
             |d$i AS (
             |  SELECT $i AS iter,
             |    round(sum(round(abs(round(a.pr, 9) - round(b.pr, 9)),
             |      12)::DECIMAL(28,12))::DOUBLE, 9) AS l1_delta_r
             |  FROM r$i a JOIN r${i - 1} b USING (vertex))"""
            .stripMargin
        }.mkString(",\n")
        Some(s"""${DepthQueries.edgesCte},
           |r0 AS (SELECT src AS vertex, 1.0 / n AS pr FROM deg, nn),
           |$iterCtes
           |SELECT iter, l1_delta_r FROM (
           |  ${(1 to PrcIters).map(i => s"SELECT * FROM d$i")
              .mkString("\n  UNION ALL ")})
           |ORDER BY iter""".stripMargin)
      },
      (s, d) => Graphs.pageRankConvergence(suppEdgeTable(s, d),
        PrcIters, PrcDamping).orderBy("iter"))
  )
}

/** q147's oracle SQL, shared verbatim with q435 (the persisted-index
  * path must produce the identical result). */
private object Registry0 {
  val q147Sql: Option[String] =
    TextQueries.all.find(_.name == "q147_delta_neardup").get.oracle
}
