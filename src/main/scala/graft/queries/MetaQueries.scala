package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Graphs, Infer, TextOps}
import graft.util.Tables._

/** Round-12 closer batch: attribute assortativity on the PERSISTED
  * supplier edge table (the q367 amortized layout's newest consumer),
  * Chao2 incidence richness, DerSimonian–Laird random-effects
  * meta-analysis with Egger's small-study test, and a deterministic
  * md5 sign-flip randomization test — the 500th oracled query lands
  * in this batch.
  */
object MetaQueries {

  /** The q477/q499 stratified 2×2 source: urgent-priority exposure vs
    * high-value outcome. */
  private val StrataSql =
    """j AS (SELECT c_nationkey AS s,
      |  (o_orderpriority = '1-URGENT') AS e,
      |  (o_totalprice > 150000) AS y
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |tab AS (SELECT s,
      |  sum(CASE WHEN e AND y THEN 1 ELSE 0 END)::BIGINT AS a,
      |  sum(CASE WHEN e AND NOT y THEN 1 ELSE 0 END)::BIGINT AS b,
      |  sum(CASE WHEN NOT e AND y THEN 1 ELSE 0 END)::BIGINT AS c,
      |  sum(CASE WHEN NOT e AND NOT y THEN 1 ELSE 0 END)::BIGINT
      |    AS d
      |  FROM j GROUP BY 1),
      |lor AS (SELECT s,
      |  round(ln((a + 0.5) * (d + 0.5)
      |    / ((b + 0.5) * (c + 0.5))), 12) AS y,
      |  round(1.0 / (a + 0.5) + 1.0 / (b + 0.5) + 1.0 / (c + 0.5)
      |    + 1.0 / (d + 0.5), 12) AS v
      |  FROM tab)""".stripMargin

  private def strataSpark(s: org.apache.spark.sql.SparkSession,
      d: String) =
    orders(s, d).join(customer(s, d),
      col("o_custkey") === col("c_custkey"))

  val all: Seq[Q] = Seq(

    // Newman attribute assortativity of supplier NATION on the
    // persisted co-occurrence edge table: do cross-nation supplier
    // pairs co-occur less than nation sizes predict?
    Q("q497_attr_assortativity",
      Some("""WITH items AS (
             |  SELECT DISTINCT l_orderkey AS g, l_suppkey AS i
             |  FROM lineitem),
             |edges AS (
             |  SELECT a.i AS src, b.i AS dst
             |  FROM items a JOIN items b ON a.g = b.g AND a.i < b.i
             |  GROUP BY 1, 2 HAVING count(*) >= 5),
             |sym AS (SELECT src, dst FROM edges
             |  UNION ALL SELECT dst AS src, src AS dst FROM edges),
             |e AS (SELECT sa.s_nationkey AS ai, sb.s_nationkey AS aj
             |  FROM sym
             |  JOIN supplier sa ON sa.s_suppkey = sym.src
             |  JOIN supplier sb ON sb.s_suppkey = sym.dst),
             |cells AS (SELECT ai, aj, count(*)::BIGINT AS c FROM e
             |  GROUP BY 1, 2),
             |rows_ AS (SELECT ai, sum(c)::BIGINT AS r FROM cells
             |  GROUP BY 1),
             |m AS (SELECT sum(r)::BIGINT AS t,
             |  count(*)::BIGINT AS n_classes,
             |  sum(r * r)::BIGINT AS r2 FROM rows_),
             |dg AS (SELECT sum(CASE WHEN ai = aj THEN c ELSE 0 END)
             |  ::BIGINT AS diag FROM cells)
             |SELECT t // 2 AS n_edges, n_classes,
             |  round(diag::DOUBLE / t::DOUBLE, 6) AS diag_share_r,
             |  CASE WHEN t * t - r2 > 0 THEN
             |    round((t * diag - r2)::DOUBLE
             |      / (t * t - r2)::DOUBLE, 6) END AS assort_r
             |FROM m, dg""".stripMargin),
      (s, d) => Graphs.attributeAssortativity(suppEdgeTable(s, d),
        supplier(s, d), "s_suppkey", "s_nationkey")),

    // Chao2 incidence richness: how much vocabulary do the observed
    // DOCUMENTS still hide? (abundance sibling: q410 Chao1)
    Q("q498_chao2_incidence",
      Some(s"""WITH inc AS (SELECT DISTINCT doc_id, tok FROM (
              |  SELECT doc_id,
              |    unnest(string_split(${TextQueries.normSql}, ' '))
              |      AS tok
              |  FROM documents) t),
              |nd AS (SELECT count(DISTINCT doc_id)::BIGINT AS n_docs
              |  FROM documents),
              |pt AS (SELECT tok, count(*)::BIGINT AS q FROM inc
              |  GROUP BY 1),
              |a AS (SELECT count(*)::BIGINT AS s_obs,
              |  sum(CASE WHEN q = 1 THEN 1 ELSE 0 END)::BIGINT AS q1,
              |  sum(CASE WHEN q = 2 THEN 1 ELSE 0 END)::BIGINT AS q2
              |  FROM pt)
              |SELECT n_docs, s_obs, q1, q2,
              |  round(s_obs::DOUBLE + CASE WHEN q2 > 0
              |    THEN (n_docs - 1)::DOUBLE / n_docs::DOUBLE
              |      * (q1 * q1)::DOUBLE / (2.0 * q2::DOUBLE)
              |    ELSE (n_docs - 1)::DOUBLE / n_docs::DOUBLE
              |      * (q1 * (q1 - 1))::DOUBLE / 2 END, 6) AS chao2_r
              |FROM a, nd""".stripMargin),
      (s, d) => TextOps.chao2Incidence(documents(s, d), "doc_id",
        "text")),

    // DerSimonian–Laird random-effects meta-analysis of the
    // urgent↔high-value log odds ratio across the 25 nations: Q, τ²,
    // I², and both pooled effects.
    Q("q499_meta_dl",
      Some(s"""WITH $StrataSql,
              |m1 AS (SELECT count(*)::BIGINT AS k,
              |  sum(round(1.0 / v, 12)::DECIMAL(28,12))::DOUBLE AS sw,
              |  sum(round(y / v, 12)::DECIMAL(28,12))::DOUBLE AS swy,
              |  sum(round(y * y / v, 12)::DECIMAL(28,12))::DOUBLE
              |    AS swy2,
              |  sum(round(1.0 / (v * v), 12)::DECIMAL(28,12))::DOUBLE
              |    AS sw2
              |  FROM lor),
              |m2 AS (SELECT *,
              |  round(swy2 - swy * swy / sw, 12) AS q FROM m1),
              |m3 AS (SELECT *, round(greatest(0.0,
              |  (q - (k - 1)::DOUBLE) / (sw - sw2 / sw)), 12) AS tau2
              |  FROM m2),
              |re AS (SELECT k, sw, swy, q, tau2,
              |  sum(round(1.0 / (v + tau2), 12)::DECIMAL(28,12))
              |    ::DOUBLE AS srw,
              |  sum(round(y / (v + tau2), 12)::DECIMAL(28,12))
              |    ::DOUBLE AS srwy
              |  FROM lor, m3 GROUP BY 1, 2, 3, 4, 5)
              |SELECT k, round(swy / sw, 6) AS fixed_lor_r,
              |  round(q, 6) AS q_r, round(tau2, 6) AS tau2_r,
              |  CASE WHEN q > 0 THEN round(greatest(0.0,
              |    (q - (k - 1)::DOUBLE) / q), 6) END AS i2_r,
              |  round(srwy / srw, 6) AS random_lor_r
              |FROM re""".stripMargin),
      (s, d) => Infer.metaDL(strataSpark(s, d), "c_nationkey",
        col("o_orderpriority") === "1-URGENT",
        col("o_totalprice") > 150000)),

    // Egger's small-study asymmetry test on the same nation strata.
    Q("q500_egger_asymmetry",
      Some(s"""WITH $StrataSql,
              |pts AS (SELECT round(y / sqrt(v), 12) AS z,
              |  round(1.0 / sqrt(v), 12) AS p FROM lor),
              |agg AS (SELECT count(*)::BIGINT AS k,
              |  sum(round(p, 12)::DECIMAL(28,12))::DOUBLE AS sx,
              |  sum(round(z, 12)::DECIMAL(28,12))::DOUBLE AS sy,
              |  sum(round(p * p, 12)::DECIMAL(28,12))::DOUBLE AS sxx,
              |  sum(round(p * z, 12)::DECIMAL(28,12))::DOUBLE AS sxy,
              |  sum(round(z * z, 12)::DECIMAL(28,12))::DOUBLE AS syy
              |  FROM pts),
              |cen AS (SELECT k, sx, sy,
              |  sxx - sx * sx / k AS cxx,
              |  sxy - sx * sy / k AS cxy,
              |  syy - sy * sy / k AS cyy FROM agg)
              |SELECT k,
              |  CASE WHEN cxx > 0 THEN
              |    round(sy / k - cxy / cxx * sx / k, 6) END
              |    AS intercept_r,
              |  CASE WHEN cxx > 0 THEN round(cxy / cxx, 6) END
              |    AS slope_r,
              |  CASE WHEN cxx > 0 AND cyy > 0 THEN
              |    round(cxy * cxy / (cxx * cyy), 6) END AS r2_r
              |FROM cen""".stripMargin),
      (s, d) => Infer.eggerSmallStudy(strataSpark(s, d), "c_nationkey",
        col("o_orderpriority") === "1-URGENT",
        col("o_totalprice") > 150000)),

    // Deterministic md5 sign-flip randomization test: is the daily
    // purchase−view count difference symmetric around zero?
    Q("q501_sign_flip",
      Some("""WITH daily AS (SELECT ts::DATE AS day,
             |  sum(CASE WHEN event_type = 'purchase' THEN 1
             |    WHEN event_type = 'view' THEN -1 ELSE 0 END)
             |    ::BIGINT AS d
             |  FROM events GROUP BY 1),
             |obs AS (SELECT sum(d)::BIGINT AS tobs,
             |  count(*)::BIGINT AS n_days FROM daily),
             |fl AS (SELECT b,
             |  sum(CASE WHEN ('0x' || substr(md5(day::VARCHAR || '_'
             |      || b::VARCHAR), 1, 1))::BIGINT % 2 = 0
             |    THEN d ELSE -d END)::BIGINT AS tb
             |  FROM daily, (SELECT unnest(generate_series(0, 199))
             |    ::INT AS b) g
             |  GROUP BY 1)
             |SELECT n_days, tobs AS t_obs, count(*)::BIGINT AS n_b,
             |  round((sum(CASE WHEN abs(tb) >= abs(tobs) THEN 1
             |    ELSE 0 END) + 1)::DOUBLE / (count(*) + 1)::DOUBLE,
             |    6) AS p_r
             |FROM fl, obs GROUP BY 1, 2""".stripMargin),
      (s, d) => {
        val daily = events(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1)
            .when(col("event_type") === "view", -1).otherwise(0)
            .cast("long")).as("d"))
        Infer.signFlipTest(daily, "day", "d", 200)
      }))
}
