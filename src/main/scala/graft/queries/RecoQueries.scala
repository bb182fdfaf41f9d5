package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Graphs, Infer}
import graft.util.Tables._

/** Recommendation & sequential-decision batch: item–item cosine
  * (collaborative filtering), Wald's SPRT over a daily conversion
  * stream, and empirical-Bayes rate shrinkage
  * ([[graft.ops.Graphs.itemCosine]], [[graft.ops.Infer]]).
  */
object RecoQueries {

  private val SprtP0 = 0.18
  private val SprtP1 = 0.22
  private val SprtAlpha = 0.05
  private val SprtBeta = 0.05

  val all: Seq[Q] = Seq(

    // Item–item cosine over the PART basket graph (support ≥ 2):
    // normalized CF similarity, not raw co-counts.
    Q("q256_item_cosine",
      Some("""WITH items AS (
             |  SELECT DISTINCT l_orderkey AS g, l_partkey AS i
             |  FROM lineitem),
             |deg AS (SELECT i, count(*)::BIGINT AS deg
             |        FROM items GROUP BY 1),
             |e0 AS (
             |  SELECT a.i AS src, b.i AS dst, count(*)::BIGINT AS support
             |  FROM items a JOIN items b ON a.g = b.g AND a.i < b.i
             |  GROUP BY 1, 2 HAVING count(*) >= 2)
             |SELECT e0.src, e0.dst, e0.support,
             |  round(support::DOUBLE
             |    / (sqrt(da.deg::DOUBLE) * sqrt(db.deg::DOUBLE)), 6)
             |    AS cos_r
             |FROM e0 JOIN deg da ON da.i = e0.src
             |JOIN deg db ON db.i = e0.dst
             |ORDER BY src, dst""".stripMargin),
      (s, d) => Graphs.itemCosine(lineitem(s, d), "l_orderkey",
          "l_partkey", 2L)
        .orderBy("src", "dst")),

    // Wald SPRT: is the purchase share 0.22 rather than 0.18? Daily
    // integer (n, k), shared double LLR coefficients, running total in
    // day order, ln B / ln A decision state per day.
    Q("q257_sprt",
      Some {
        val cPos = math.log(SprtP1 / SprtP0)
        val cNeg = math.log((1 - SprtP1) / (1 - SprtP0))
        val upper = math.log((1 - SprtBeta) / SprtAlpha)
        val lower = math.log(SprtBeta / (1 - SprtAlpha))
        s"""WITH daily AS (
           |  SELECT ts::DATE AS day, count(*)::BIGINT AS n,
           |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           |      ::BIGINT AS k
           |  FROM events GROUP BY 1),
           |c AS (
           |  SELECT day, n, k,
           |    k * $cPos + (n - k) * $cNeg AS llr,
           |    sum(k * $cPos + (n - k) * $cNeg)
           |      OVER (ORDER BY day
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS cum
           |  FROM daily)
           |SELECT day, n, k, round(llr, 6) AS llr_r,
           |  round(cum, 6) AS cum_llr_r,
           |  CASE WHEN cum >= $upper THEN 'accept_h1'
           |       WHEN cum <= $lower THEN 'accept_h0'
           |       ELSE 'continue' END AS decision
           |FROM c ORDER BY day""".stripMargin
      },
      (s, d) => Infer.sprtDaily(events(s, d), "ts",
          col("event_type") === "purchase", SprtP0, SprtP1,
          SprtAlpha, SprtBeta)
        .orderBy("day")),

    // Empirical-Bayes beta-binomial shrinkage of per-user purchase
    // rates: MoM fit over 12-dp DECIMAL rate moments, posterior-mean
    // rates that pull small-n users toward the global mean.
    Q("q258_eb_shrinkage",
      Some("""WITH seg AS (
             |  SELECT user_id, count(*)::BIGINT AS n,
             |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |      ::BIGINT AS k
             |  FROM events GROUP BY 1),
             |mom AS (
             |  SELECT count(*)::BIGINT AS m0,
             |    sum(round(k::DOUBLE / n, 12)::DECIMAL(28,12))::DOUBLE
             |      AS sp,
             |    sum(round((k::DOUBLE / n) * (k::DOUBLE / n), 12)
             |      ::DECIMAL(28,12))::DOUBLE AS spp
             |  FROM seg),
             |f AS (
             |  SELECT m0, sp / m0 AS m,
             |    spp / m0 - (sp / m0) * (sp / m0) AS v
             |  FROM mom),
             |g AS (
             |  SELECT m0, m, v, m * (1.0 - m) / v - 1.0 AS prec
             |  FROM f)
             |SELECT s.user_id, s.n, s.k,
             |  round(s.k::DOUBLE / s.n, 6) AS rate_r,
             |  CASE WHEN m0 >= 2 AND v > 0 AND m * (1.0 - m) / v - 1.0 > 0
             |    THEN round(m * prec, 6) END AS alpha_r,
             |  CASE WHEN m0 >= 2 AND v > 0 AND m * (1.0 - m) / v - 1.0 > 0
             |    THEN round((1.0 - m) * prec, 6) END AS beta_r,
             |  CASE WHEN m0 >= 2 AND v > 0 AND m * (1.0 - m) / v - 1.0 > 0
             |    THEN round((s.k + m * prec)
             |      / (s.n + m * prec + (1.0 - m) * prec), 6) END
             |    AS shrunk_r
             |FROM seg s CROSS JOIN g
             |ORDER BY user_id""".stripMargin),
      (s, d) => Infer.ebShrinkage(events(s, d), "user_id",
          col("event_type") === "purchase")
        .orderBy("user_id")))
}
