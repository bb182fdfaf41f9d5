package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Curation, Robust}
import graft.util.Tables._

/** Round-12 robust-estimator batch: iterative classical estimators on
  * bounded grains — GESD-style outlier peeling, Huber IRLS trend, 1-D
  * two-component GMM by EM, Cox proportional hazards (binary
  * covariate), Neyman sample allocation. Every iterative op follows the
  * fixed-step 12-dp-param discipline so the DuckDB oracle replays the
  * identical trajectory step for step.
  */
object EstimatorQueries {

  private val GesdRounds = 3
  private val HuberDelta = 2.0
  private val HuberIters = 3
  private val GmmIters = 3
  private val CoxNewton = 2
  private val NeymanBudget = 10000L

  /** Daily revenue in exact cents (BIGINT) — the shared bounded grain. */
  private val dailySql =
    """WITH daily AS MATERIALIZED (
      |  SELECT o_orderdate AS day,
      |    sum(round(o_totalprice * 100))::BIGINT AS y
      |  FROM orders GROUP BY 1)""".stripMargin

  /** One GESD peel round in SQL: stats over d<i>, peel the max-|dev|
    * day (ties by day), leave d<i+1>. */
  private def gesdRoundSql(i: Int): String = {
    val src = if (i == 1) "daily" else s"d$i"
    s"""s$i AS (SELECT count(*)::BIGINT AS n, sum(y::HUGEINT) AS s,
       |  sum(y::HUGEINT * y::HUGEINT) AS s2 FROM $src),
       |r$i AS MATERIALIZED (
       |  SELECT $i AS peel_round, day, y, n AS n_remaining,
       |    round(s::DOUBLE / n, 6) AS mean_r,
       |    round(sqrt((s2::DOUBLE - s::DOUBLE * s::DOUBLE / n)
       |      / (n - 1)), 6) AS sd_r,
       |    round(abs(y::DOUBLE - s::DOUBLE / n)
       |      / sqrt((s2::DOUBLE - s::DOUBLE * s::DOUBLE / n)
       |        / (n - 1)), 6) AS r_stat_r
       |  FROM $src, s$i
       |  ORDER BY abs(y::DOUBLE - s::DOUBLE / n) DESC, day LIMIT 1),
       |d${i + 1} AS MATERIALIZED (
       |  SELECT * FROM $src
       |  WHERE day NOT IN (SELECT day FROM r$i))""".stripMargin
  }

  /** The weighted-least-squares step in SQL over a frame `src(x, yv, w)`
    * → one row (a, b, ndw, wmin, sw) with the op's exact
    * parenthesization (a uses the UNROUNDED b expression). */
  private def wlsSql(name: String, src: String): String =
    s"""$name AS MATERIALIZED (
       |  SELECT
       |    round((sw * swxy - swx * swy) / (sw * swxx - swx * swx), 12)
       |      AS b,
       |    round((swy - ((sw * swxy - swx * swy)
       |      / (sw * swxx - swx * swx)) * swx) / sw, 12) AS a,
       |    ndw, wmin
       |  FROM (
       |    SELECT sum(round(w, 12)::DECIMAL(28,12))::DOUBLE AS sw,
       |      sum(round(w * x, 12)::DECIMAL(28,12))::DOUBLE AS swx,
       |      sum(round(w * yv, 12)::DECIMAL(28,12))::DOUBLE AS swy,
       |      sum(round(w * x * x, 12)::DECIMAL(28,12))::DOUBLE AS swxx,
       |      sum(round(w * x * yv, 12)::DECIMAL(28,12))::DOUBLE AS swxy,
       |      sum(round(CASE WHEN w < 1.0 THEN 1.0 ELSE 0.0 END, 12)
       |        ::DECIMAL(28,12))::DOUBLE AS ndw,
       |      min(round(w, 6)) AS wmin
       |    FROM $src) t)""".stripMargin

  /** One IRLS re-weighting in SQL: residuals against p<i-1>'s (a, b),
    * Huber weights at delta. */
  private def irlsPassSql(i: Int, prev: String): String =
    s"""w$i AS MATERIALIZED (
       |  SELECT x, yv,
       |    CASE WHEN abs(round(yv - a - b * x, 12)) <= $HuberDelta
       |      THEN 1.0
       |      ELSE round($HuberDelta
       |        / abs(round(yv - a - b * x, 12)), 12) END AS w
       |  FROM g, $prev)""".stripMargin

  /** One EM step in SQL: responsibilities against p<i-1>, then the
    * 12-dp-rounded parameter update (the op's exact forms). */
  private def emStepSql(i: Int, prev: String): String =
    s"""e$i AS MATERIALIZED (
       |  SELECT yv,
       |    round(1.0 / (1.0 + exp(round(
       |      ln(1.0 - pi1) - ln(pi1)
       |      + 0.5 * ln(v1) - 0.5 * ln(v2)
       |      + 0.5 * (yv - mu1) * (yv - mu1) / v1
       |      - 0.5 * (yv - mu2) * (yv - mu2) / v2, 12))), 12) AS g1
       |  FROM g, $prev),
       |p$i AS MATERIALIZED (
       |  SELECT n,
       |    round(t1 / n, 12) AS pi1,
       |    round(ty1 / t1, 12) AS mu1,
       |    round(ty2 / (n - t1), 12) AS mu2,
       |    round(greatest(tyy1 / t1 - (ty1 / t1) * (ty1 / t1),
       |      0.000001), 12) AS v1,
       |    round(greatest(tyy2 / (n - t1)
       |      - (ty2 / (n - t1)) * (ty2 / (n - t1)),
       |      0.000001), 12) AS v2
       |  FROM (
       |    SELECT (SELECT n FROM p0) AS n,
       |      sum(round(g1, 12)::DECIMAL(28,12))::DOUBLE AS t1,
       |      sum(round(g1 * yv, 12)::DECIMAL(28,12))::DOUBLE AS ty1,
       |      sum(round(g1 * yv * yv, 12)::DECIMAL(28,12))::DOUBLE
       |        AS tyy1,
       |      sum(round((1.0 - g1) * yv, 12)::DECIMAL(28,12))::DOUBLE
       |        AS ty2,
       |      sum(round((1.0 - g1) * yv * yv, 12)::DECIMAL(28,12))
       |        ::DOUBLE AS tyy2
       |    FROM e$i) t)""".stripMargin

  /** One Cox Newton step in SQL against beta frame b<i-1>(beta) →
    * b<i>(beta) plus the step's observed information i<i>(i). */
  private def coxStepSql(i: Int, prev: String): String =
    s"""st$i AS MATERIALIZED (
       |  SELECT
       |    sum(round(s::DOUBLE - d::DOUBLE * nr1::DOUBLE * eb
       |      / (nr0::DOUBLE + nr1::DOUBLE * eb), 12)
       |      ::DECIMAL(28,12))::DOUBLE AS u,
       |    sum(round(d::DOUBLE * nr0::DOUBLE * nr1::DOUBLE * eb
       |      / ((nr0::DOUBLE + nr1::DOUBLE * eb)
       |        * (nr0::DOUBLE + nr1::DOUBLE * eb)), 12)
       |      ::DECIMAL(28,12))::DOUBLE AS i,
       |    first(b0) AS b0
       |  FROM (SELECT risk.*, round(exp(round(beta, 12)), 12) AS eb,
       |          round(beta, 12) AS b0
       |        FROM risk, $prev) t),
       |b$i AS (SELECT round(b0 + u / nullif(i, 0.0), 12) AS beta
       |        FROM st$i)""".stripMargin

  val all: Seq[Q] = Seq(

    // Iterative outlier peeling (GESD family) on the daily-revenue
    // grain: 3 rounds of (stats over remaining, peel max |dev|).
    Q("q413_gesd_revenue",
      Some(s"""$dailySql,
              |${gesdRoundSql(1)},
              |${gesdRoundSql(2)},
              |${gesdRoundSql(3)}
              |SELECT peel_round, day, y, n_remaining, mean_r, sd_r,
              |  r_stat_r
              |FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2
              |      UNION ALL SELECT * FROM r3)
              |ORDER BY peel_round""".stripMargin),
      (s, d) => {
        val daily = orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long"))
            .as("y"))
        Robust.gesdPeel(daily, "day", "y", GesdRounds)
          .withColumnRenamed("round", "peel_round")
          .orderBy("peel_round")
      }),

    // Huber IRLS trend of daily revenue (1e8-cents units) vs day
    // index: OLS start, 3 re-weighted steps at delta = 2.0 — the
    // outlier-resistant slope next to q127's OLS trend.
    Q("q414_huber_trend",
      Some(s"""$dailySql,
              |mn AS (SELECT min(day) AS d0 FROM daily),
              |g AS MATERIALIZED (
              |  SELECT datediff('day', d0, day)::DOUBLE AS x,
              |    round(y / 1e8, 12) AS yv
              |  FROM daily, mn),
              |w0 AS (SELECT x, yv, 1.0 AS w FROM g),
              |${wlsSql("p0", "w0")},
              |${irlsPassSql(1, "p0")},
              |${wlsSql("p1", "w1")},
              |${irlsPassSql(2, "p1")},
              |${wlsSql("p2", "w2")},
              |${irlsPassSql(3, "p2")},
              |${wlsSql("p3", "w3")}
              |SELECT (SELECT count(*) FROM g)::BIGINT AS n,
              |  round(p0.a, 6) AS a_ols_r, round(p0.b, 6) AS b_ols_r,
              |  round(p3.a, 6) AS a_r, round(p3.b, 6) AS b_r,
              |  p3.wmin AS w_min_r, p3.ndw::BIGINT AS n_downweighted
              |FROM p0, p3""".stripMargin),
      (s, d) => {
        val daily = orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long"))
            .as("y"))
        val d0 = daily.agg(min(col("day")).as("_d0"))
        val g = daily.crossJoin(broadcast(d0))
          .select(datediff(col("day"), col("_d0")).cast("double")
            .as("x"), round(col("y") / 1e8, 12).as("yv"))
        Robust.huberIrls(g, "x", "yv", HuberDelta, HuberIters)
      }),

    // Two-component GMM by EM on the daily-revenue units: 3 fixed
    // steps from the deterministic (min, max, pooled-var) start —
    // "is the revenue distribution one regime or two".
    Q("q415_gmm2_revenue",
      Some(s"""$dailySql,
              |g AS MATERIALIZED (
              |  SELECT round(y / 1e8, 12) AS yv FROM daily),
              |p0 AS MATERIALIZED (
              |  SELECT count(*)::BIGINT AS n, 0.5 AS pi1,
              |    round(min(yv), 12) AS mu1,
              |    round(max(yv), 12) AS mu2,
              |    round(greatest(
              |      (sum(round(yv * yv, 12)::DECIMAL(28,12))::DOUBLE
              |        - sum(round(yv, 12)::DECIMAL(28,12))::DOUBLE
              |          * sum(round(yv, 12)::DECIMAL(28,12))::DOUBLE
              |          / count(*))
              |      / count(*), 0.000001), 12) AS v1,
              |    round(greatest(
              |      (sum(round(yv * yv, 12)::DECIMAL(28,12))::DOUBLE
              |        - sum(round(yv, 12)::DECIMAL(28,12))::DOUBLE
              |          * sum(round(yv, 12)::DECIMAL(28,12))::DOUBLE
              |          / count(*))
              |      / count(*), 0.000001), 12) AS v2
              |  FROM g),
              |${emStepSql(1, "p0")},
              |${emStepSql(2, "p1")},
              |${emStepSql(3, "p2")}
              |SELECT n, round(pi1, 6) AS pi1_r, round(mu1, 6) AS mu1_r,
              |  round(mu2, 6) AS mu2_r, round(sqrt(v1), 6) AS sd1_r,
              |  round(sqrt(v2), 6) AS sd2_r
              |FROM p3""".stripMargin),
      (s, d) => {
        val daily = orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long"))
            .as("y"))
        Robust.gmm2Em(daily.select(round(col("y") / 1e8, 12).as("yv")),
          "yv", GmmIters)
      }),

    // Cox proportional hazards (binary covariate = user parity) on
    // time from signup to FIRST purchase, censored at the corpus
    // horizon — 2 Newton steps on the bounded event-time grain.
    Q("q416_cox_ph",
      Some(s"""WITH su AS MATERIALIZED (
              |  SELECT user_id, min(ts) AS t0 FROM events
              |  WHERE event_type = 'signup' GROUP BY 1),
              |fp AS MATERIALIZED (
              |  SELECT user_id, min(ts) AS tp FROM events e
              |  WHERE event_type = 'purchase'
              |    AND EXISTS (SELECT 1 FROM su
              |      WHERE su.user_id = e.user_id AND e.ts >= su.t0)
              |  GROUP BY 1),
              |mx AS (SELECT max(ts) AS tmax FROM events),
              |subj AS MATERIALIZED (
              |  SELECT
              |    CASE WHEN fp.tp IS NOT NULL
              |      THEN datediff('day', su.t0::DATE, fp.tp::DATE)
              |      ELSE datediff('day', su.t0::DATE, mx.tmax::DATE)
              |    END::BIGINT AS t,
              |    CASE WHEN fp.tp IS NOT NULL THEN 1 ELSE 0 END AS e,
              |    (su.user_id % 2)::BIGINT AS x
              |  FROM su LEFT JOIN fp USING (user_id), mx),
              |perT AS MATERIALIZED (
              |  SELECT t, sum(e)::BIGINT AS d,
              |    sum(e * x)::BIGINT AS s,
              |    count(*)::BIGINT AS inn, sum(x)::BIGINT AS in1
              |  FROM subj GROUP BY 1),
              |tot AS (SELECT count(*)::BIGINT AS n,
              |  sum(x)::BIGINT AS n1t, sum(e)::BIGINT AS ne FROM subj),
              |risk AS MATERIALIZED (
              |  SELECT t, d, s,
              |    ((n - n1t) - (coalesce(sum(inn) OVER (ORDER BY t
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              |      0) - coalesce(sum(in1) OVER (ORDER BY t
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              |      0)))::BIGINT AS nr0,
              |    (n1t - coalesce(sum(in1) OVER (ORDER BY t
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              |      0))::BIGINT AS nr1
              |  FROM perT, tot
              |  QUALIFY d > 0),
              |b0 AS (SELECT 0.0 AS beta),
              |${coxStepSql(1, "b0")},
              |${coxStepSql(2, "b1")}
              |SELECT n AS n_subjects, ne AS n_events,
              |  round(beta, 6) AS beta_r,
              |  round(exp(round(beta, 12)), 6) AS hr_r,
              |  round(1.0 / sqrt(st2.i), 6) AS se_r
              |FROM tot, b2, st2""".stripMargin),
      (s, d) => {
        val ev = events(s, d)
        val su = ev.where(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("_t0"))
        val fp = ev.where(col("event_type") === "purchase")
          .join(su, Seq("user_id"))
          .where(col("ts") >= col("_t0"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("_tp"))
        val mx = ev.agg(max(col("ts")).as("_tmax"))
        val subj = su.join(fp, Seq("user_id"), "left")
          .crossJoin(broadcast(mx))
          .select(
            when(col("_tp").isNotNull,
              datediff(col("_tp").cast("date"), col("_t0").cast("date")))
              .otherwise(datediff(col("_tmax").cast("date"),
                col("_t0").cast("date"))).cast("long").as("t"),
            when(col("_tp").isNotNull, 1L).otherwise(0L).as("e"),
            (col("user_id") % 2).cast("long").as("x"))
        Robust.coxPhBinary(subj, "t", "e", "x", CoxNewton)
      }),

    // Neyman (optimal) stratified-sample allocation of a 10k budget
    // across sources, weighted by N_h * sd(n_chars) — q173's Hamilton
    // allocator upgraded with the variance-optimal weights.
    Q("q417_neyman_alloc",
      Some(s"""WITH s AS MATERIALIZED (
              |  SELECT source, count(*)::BIGINT AS n,
              |    sum(n_chars::HUGEINT) AS sy,
              |    sum(n_chars::HUGEINT * n_chars::HUGEINT) AS sy2
              |  FROM documents GROUP BY 1),
              |w AS (
              |  SELECT source, n,
              |    CASE WHEN n >= 2 THEN sqrt(
              |      (sy2::DOUBLE - sy::DOUBLE * sy::DOUBLE / n)
              |      / (n - 1)) ELSE 0.0 END AS sd
              |  FROM s),
              |ww AS (SELECT source, n, sd,
              |       round(n::DOUBLE * sd, 6) AS wgt FROM w),
              |tw AS (SELECT sum(round(wgt, 12)::DECIMAL(28,12))::DOUBLE
              |       AS tw FROM ww),
              |q AS (SELECT source, n, sd,
              |      round($NeymanBudget.0 * wgt / tw, 9) AS q
              |      FROM ww, tw),
              |qq AS (SELECT source, n, sd, floor(q)::BIGINT AS base,
              |       round(q - floor(q), 9) AS rem FROM q),
              |sp AS (SELECT sum(base)::BIGINT AS spent FROM qq),
              |r AS (SELECT qq.*, spent,
              |      row_number() OVER (ORDER BY rem DESC, source) AS rk
              |      FROM qq, sp)
              |SELECT source, n, round(sd, 6) AS sd_y_r,
              |  (base + CASE WHEN rk <= $NeymanBudget - spent
              |    THEN 1 ELSE 0 END)::BIGINT AS alloc
              |FROM r ORDER BY source""".stripMargin),
      (s, d) => Curation.neymanAlloc(documents(s, d), "source",
        "n_chars", NeymanBudget).orderBy("source"))
  )
}
