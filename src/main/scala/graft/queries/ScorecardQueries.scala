package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Fit, Forecast, Nonparam, Similarity}
import graft.util.Tables._

/** Round-12 model/representation scorecard batch: a real multivariate
  * GLM (two-feature logistic IRLS on the binned design), linear CKA
  * between embedding half-spaces, Wang–Isola alignment/uniformity,
  * the two-sample Anderson–Darling test, and the M-competition
  * forecast scorecard (MASE/sMAPE/RMSSE).
  */
object ScorecardQueries {

  private val IrlsIters = 4

  /** One IRLS step as two CTE layers (mirrors Fit.logistic2Irls's
    * loop body; b0 holds the init). */
  private def irlsStepSql(k: Int): String =
    s"""s$k AS (SELECT
       |  sum(round(w, 12)::DECIMAL(28,12))::DOUBLE AS sw,
       |  sum(round(w * l1, 12)::DECIMAL(28,12))::DOUBLE AS sw1,
       |  sum(round(w * l2, 12)::DECIMAL(28,12))::DOUBLE AS sw2,
       |  sum(round(w * l1 * l1, 12)::DECIMAL(28,12))::DOUBLE AS sw11,
       |  sum(round(w * l1 * l2, 12)::DECIMAL(28,12))::DOUBLE AS sw12,
       |  sum(round(w * l2 * l2, 12)::DECIMAL(28,12))::DOUBLE AS sw22,
       |  sum(round(r, 12)::DECIMAL(28,12))::DOUBLE AS sr,
       |  sum(round(r * l1, 12)::DECIMAL(28,12))::DOUBLE AS sr1,
       |  sum(round(r * l2, 12)::DECIMAL(28,12))::DOUBLE AS sr2,
       |  any_value(b0) AS b0, any_value(b1) AS b1,
       |  any_value(b2) AS b2
       |  FROM (SELECT l1, l2, b0, b1, b2,
       |    n * p * (1.0 - p) AS w, k - n * p AS r
       |    FROM (SELECT c.l1, c.l2, c.n, c.k, b.b0, b.b1, b.b2,
       |      round(1.0 / (1.0 + exp(-round(b.b0 + b.b1 * c.l1
       |        + b.b2 * c.l2, 12))), 12) AS p
       |      FROM cells c, b${k - 1} b))),
       |b$k AS (SELECT
       |  round(b0 + (sr * (sw11 * sw22 - sw12 * sw12)
       |    - sw1 * (sr1 * sw22 - sw12 * sr2)
       |    + sw2 * (sr1 * sw12 - sw11 * sr2))
       |    / (sw * (sw11 * sw22 - sw12 * sw12)
       |    - sw1 * (sw1 * sw22 - sw12 * sw2)
       |    + sw2 * (sw1 * sw12 - sw11 * sw2)), 12) AS b0,
       |  round(b1 + (sw * (sr1 * sw22 - sw12 * sr2)
       |    - sr * (sw1 * sw22 - sw12 * sw2)
       |    + sw2 * (sw1 * sr2 - sr1 * sw2))
       |    / (sw * (sw11 * sw22 - sw12 * sw12)
       |    - sw1 * (sw1 * sw22 - sw12 * sw2)
       |    + sw2 * (sw1 * sw12 - sw11 * sw2)), 12) AS b1,
       |  round(b2 + (sw * (sw11 * sr2 - sr1 * sw12)
       |    - sw1 * (sw1 * sr2 - sr1 * sw2)
       |    + sr * (sw1 * sw12 - sw11 * sw2))
       |    / (sw * (sw11 * sw22 - sw12 * sw12)
       |    - sw1 * (sw1 * sw22 - sw12 * sw2)
       |    + sw2 * (sw1 * sw12 - sw11 * sw2)), 12) AS b2
       |  FROM s$k)""".stripMargin

  val all: Seq[Q] = Seq(

    // Two-feature logistic IRLS: P(purchase-heavy | ln views,
    // ln clicks) on the binned (views, clicks) design.
    Q("q492_logistic2_irls",
      Some(s"""WITH u AS (SELECT user_id,
              |  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              |    ::BIGINT AS views,
              |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              |    ::BIGINT AS clicks,
              |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
              |    END)::BIGINT AS purch,
              |  count(*)::BIGINT AS tot
              |  FROM events GROUP BY 1),
              |cells AS MATERIALIZED (SELECT
              |  round(ln(1.0 + views::DOUBLE), 12) AS l1,
              |  round(ln(1.0 + clicks::DOUBLE), 12) AS l2,
              |  count(*)::DOUBLE AS n,
              |  sum(CASE WHEN 5 * purch > tot THEN 1 ELSE 0 END)
              |    ::DOUBLE AS k
              |  FROM u GROUP BY views, clicks),
              |b0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2),
              |${(1 to IrlsIters).map(irlsStepSql).mkString(",\n")},
              |fin AS (SELECT c.n, c.k,
              |  least(greatest(round(1.0 / (1.0 + exp(-round(b.b0
              |      + b.b1 * c.l1 + b.b2 * c.l2, 12))), 12), 1e-12),
              |    (1.0 - 1e-12)) AS pc,
              |  b.b0, b.b1, b.b2
              |  FROM cells c, b$IrlsIters b)
              |SELECT sum(n)::BIGINT AS n_trials,
              |  sum(k)::BIGINT AS k_pos,
              |  round(any_value(b0), 6) AS b0_r,
              |  round(any_value(b1), 6) AS b1_r,
              |  round(any_value(b2), 6) AS b2_r,
              |  round(sum(round(-2.0 * (k * ln(pc)
              |    + (n - k) * ln(1.0 - pc)), 12)
              |    ::DECIMAL(28,12))::DOUBLE, 6) AS deviance_r
              |FROM fin""".stripMargin),
      (s, d) => {
        val cells = events(s, d).groupBy(col("user_id"))
          .agg(
            sum(when(col("event_type") === "view", 1L).otherwise(0L))
              .as("views"),
            sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .as("clicks"),
            sum(when(col("event_type") === "purchase", 1L)
              .otherwise(0L)).as("purch"),
            count(lit(1)).as("tot"))
          .groupBy(col("views"), col("clicks"))
          .agg(count(lit(1)).as("n"),
            sum(when(lit(5) * col("purch") > col("tot"), 1L)
              .otherwise(0L)).as("k"))
        Fit.logistic2Irls(cells, "views", "clicks", "n", "k",
          IrlsIters)
      }),

    // Linear CKA between the two 32-dim halves of the embedding
    // space: do they encode the same example geometry?
    Q("q493_linear_cka",
      Some("""WITH dims AS MATERIALIZED (
             |  SELECT vec_id AS id, i - 1 AS i,
             |    embedding[i]::DOUBLE AS v
             |  FROM embeddings,
             |    unnest(generate_series(1, len(embedding))) AS g(i)),
             |nf AS (SELECT count(*)::BIGINT AS n FROM embeddings),
             |means AS (SELECT i, n,
             |  sum(round(v, 12)::DECIMAL(28,12))::DOUBLE / n::DOUBLE
             |    AS m
             |  FROM dims, nf GROUP BY 1, 2),
             |s AS (SELECT a.i AS i, b.i AS j,
             |  sum(round(a.v * b.v, 12)::DECIMAL(28,12))::DOUBLE AS s
             |  FROM dims a JOIN dims b USING (id) GROUP BY 1, 2),
             |c AS (SELECT s.i, s.j, mi.n,
             |  s.s - mi.n::DOUBLE * mi.m * mj.m AS c
             |  FROM s JOIN means mi ON mi.i = s.i
             |  JOIN means mj ON mj.i = s.j),
             |b AS (SELECT n,
             |  sum(round(CASE WHEN i < 32 AND j >= 32
             |    THEN c * c ELSE 0.0 END, 12)::DECIMAL(28,12))
             |    ::DOUBLE AS fxy2,
             |  sum(round(CASE WHEN i < 32 AND j < 32
             |    THEN c * c ELSE 0.0 END, 12)::DECIMAL(28,12))
             |    ::DOUBLE AS fxx2,
             |  sum(round(CASE WHEN i >= 32 AND j >= 32
             |    THEN c * c ELSE 0.0 END, 12)::DECIMAL(28,12))
             |    ::DOUBLE AS fyy2
             |  FROM c GROUP BY n)
             |SELECT n,
             |  round(fxy2 / (sqrt(fxx2) * sqrt(fyy2)), 6) AS cka_r,
             |  round(fxy2, 6) AS fxy2_r,
             |  round(sqrt(fxx2), 6) AS fxx_r,
             |  round(sqrt(fyy2), 6) AS fyy_r
             |FROM b""".stripMargin),
      (s, d) => Similarity.linearCkaBlocks(embeddings(s, d), "vec_id",
        "embedding", 32)),

    // Wang–Isola alignment/uniformity on a 128-vector md5 sample.
    Q("q494_uniformity_alignment",
      Some("""WITH sam AS MATERIALIZED (
             |  SELECT vec_id AS id, embedding AS vec, label AS lab
             |  FROM embeddings
             |  ORDER BY md5(vec_id::VARCHAR) LIMIT 128),
             |d2 AS (SELECT a.id AS ia, b.id AS ib,
             |  a.lab AS la, b.lab AS lb,
             |  round(sum(round((a.vec[i]::DOUBLE - b.vec[i]::DOUBLE)
             |    * (a.vec[i]::DOUBLE - b.vec[i]::DOUBLE), 12)
             |    ::DECIMAL(28,12))::DOUBLE, 12) AS d2
             |  FROM sam a JOIN sam b ON a.id < b.id,
             |    unnest(generate_series(1, len(a.vec))) AS g(i)
             |  GROUP BY 1, 2, 3, 4)
             |SELECT 128 AS k_vecs, count(*)::BIGINT AS n_pairs,
             |  sum(CASE WHEN la = lb THEN 1 ELSE 0 END)::BIGINT
             |    AS n_pos_pairs,
             |  CASE WHEN sum(CASE WHEN la = lb THEN 1 ELSE 0 END) > 0
             |    THEN round(sum(CASE WHEN la = lb
             |      THEN round(d2, 12)::DECIMAL(28,12)
             |      ELSE 0::DECIMAL(28,12) END)::DOUBLE
             |    / sum(CASE WHEN la = lb THEN 1 ELSE 0 END)::DOUBLE,
             |    6) END AS alignment_r,
             |  round(ln(sum(round(exp(-2.0 * d2), 12)
             |    ::DECIMAL(28,12))::DOUBLE / count(*)::DOUBLE), 6)
             |    AS uniformity_r
             |FROM d2""".stripMargin),
      (s, d) => Similarity.uniformityAlignment(embeddings(s, d),
        "vec_id", "embedding", "label", 128)),

    // Two-sample Anderson–Darling on view vs purchase value cents:
    // the tail-weighted ECDF test next to q372's CvM.
    Q("q495_ad_two_sample",
      Some("""WITH src AS (SELECT event_type AS g,
             |    CAST(round(value * 100) AS BIGINT) AS v FROM events
             |  WHERE event_type IN ('view', 'purchase')),
             |per AS (SELECT v,
             |  sum(CASE WHEN g = 'view' THEN 1 ELSE 0 END)::BIGINT
             |    AS na,
             |  sum(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END)
             |    ::BIGINT AS nb
             |  FROM src GROUP BY 1),
             |c AS (SELECT v, na, nb, na + nb AS m,
             |  sum(na + nb) OVER (ORDER BY v)::BIGINT AS ct,
             |  sum(na) OVER (ORDER BY v)::BIGINT AS ca
             |  FROM per),
             |tot AS (SELECT sum(na)::BIGINT AS n_a,
             |  sum(nb)::BIGINT AS n_b FROM per),
             |g AS (SELECT c.*, n_a, n_b, n_a + n_b AS nn
             |  FROM c, tot)
             |SELECT n_a, n_b,
             |  round(sum(round(m::DOUBLE
             |    * ((nn * ca - n_a * ct)::DOUBLE
             |      * (nn * ca - n_a * ct)::DOUBLE)
             |    / (ct::DOUBLE * (nn - ct)::DOUBLE), 12)
             |    ::DECIMAL(28,12))::DOUBLE
             |    / (n_a::DOUBLE * n_b::DOUBLE), 6) AS a2_r
             |FROM g WHERE ct < nn GROUP BY n_a, n_b""".stripMargin),
      (s, d) => Nonparam.adTwoSample(
        events(s, d).select(col("event_type").as("g"),
          round(col("value") * 100).cast("bigint").as("v")),
        "v", "g", "view", "purchase", 1024.0)),

    // M-competition forecast scorecard per event type: MASE, sMAPE,
    // RMSSE of the lag-7 seasonal-naïve forecast.
    Q("q496_forecast_scorecard",
      Some("""WITH daily AS (
             |  SELECT event_type, ts::DATE AS day,
             |    count(*)::BIGINT AS x
             |  FROM events GROUP BY 1, 2),
             |bounds AS (
             |  SELECT event_type, min(day) AS d0, max(day) AS d1
             |  FROM daily GROUP BY 1),
             |spine AS (
             |  SELECT event_type,
             |    unnest(generate_series(d0, d1, INTERVAL 1 DAY))
             |      ::DATE AS day
             |  FROM bounds),
             |filled AS (
             |  SELECT s.event_type, s.day,
             |    coalesce(d.x, 0)::BIGINT AS x
             |  FROM spine s LEFT JOIN daily d USING (event_type, day)),
             |f7 AS (SELECT event_type, day + 7 AS day, x AS p
             |  FROM filled),
             |f1 AS (SELECT event_type, day + 1 AS day, x AS p1
             |  FROM filled),
             |j AS (SELECT f.event_type, f.x, a.p, b.p1
             |  FROM filled f JOIN f7 a USING (event_type, day)
             |  JOIN f1 b USING (event_type, day))
             |SELECT event_type, count(*)::BIGINT AS n_days,
             |  CASE WHEN sum(abs(x - p1)) > 0 THEN
             |    round(sum(abs(x - p))::DOUBLE
             |      / sum(abs(x - p1))::DOUBLE, 6) END AS mase_r,
             |  CASE WHEN sum(CASE WHEN x + p > 0 THEN 1 ELSE 0 END)
             |      > 0 THEN
             |    round(sum(CASE WHEN x + p > 0 THEN
             |      round(2.0 * abs(x - p)::DOUBLE
             |        / (x + p)::DOUBLE, 12)::DECIMAL(28,12)
             |      ELSE 0::DECIMAL(28,12) END)::DOUBLE
             |    / sum(CASE WHEN x + p > 0 THEN 1 ELSE 0 END)::DOUBLE,
             |    6) END AS smape_r,
             |  CASE WHEN sum((x - p1) * (x - p1)) > 0 THEN
             |    round(sqrt(sum((x - p) * (x - p))::DOUBLE
             |      / sum((x - p1) * (x - p1))::DOUBLE), 6) END
             |    AS rmsse_r
             |FROM j GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => Forecast.forecastScorecard(events(s, d), "event_type",
          "ts", 7)
        .orderBy("event_type")))
}
