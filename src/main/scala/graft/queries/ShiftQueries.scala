package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Diagnostics, Nonparam, TimeSeries}
import graft.util.Tables._

/** Round-11 shift/regime batch: stationarity and drift tests over the
  * daily-revenue spine ([[graft.ops.TimeSeries.kpss]] KPSS,
  * [[graft.ops.TimeSeries.pageHinkley]] Page–Hinkley,
  * [[graft.ops.Diagnostics.archLm]] ARCH-LM volatility clustering) and
  * whole-distribution two-sample distances over purchase values
  * ([[graft.ops.Nonparam.wasserstein1d]] earth-mover,
  * [[graft.ops.Nonparam.cramerVonMises]] CvM). Every float enters a
  * 12-dp (or documented coarser) DECIMAL grid before its
  * order-independent sum; every prefix structure is banded or
  * calendar-bounded (the q304 conventions).
  */
object ShiftQueries {

  /** The orders day-index grain (t, y exact cents) — the q304 spine. */
  private val GrainSql =
    """WITH grain AS (
      |  SELECT o_orderdate::DATE AS day,
      |    sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS y
      |  FROM orders GROUP BY 1),
      |t AS (
      |  SELECT (day - (SELECT min(day) FROM grain))::BIGINT AS t, y
      |  FROM grain)""".stripMargin

  private def grain(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val daily = orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
    val d0 = daily.agg(min(col("day")).as("_d0"))
    daily.crossJoin(broadcast(d0))
      .select(datediff(col("day"), col("_d0")).cast("long").as("t"),
        col("y"))
  }

  /** Weekday/weekend purchase cents with a two-level group label —
    * shared by the two-sample distance oracles. */
  private val PurchaseSplitSql =
    """WITH v AS (
      |  SELECT CASE WHEN extract(dow FROM ts) IN (0, 6)
      |      THEN 'we' ELSE 'wd' END AS grp,
      |    round(value * 100)::BIGINT AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |per AS (
      |  SELECT cents AS v,
      |    sum(CASE WHEN grp = 'wd' THEN 1 ELSE 0 END)::BIGINT AS na,
      |    sum(CASE WHEN grp = 'we' THEN 1 ELSE 0 END)::BIGINT AS nb
      |  FROM v GROUP BY 1),
      |cum AS (
      |  SELECT v, na, nb, sum(na) OVER w AS cuma, sum(nb) OVER w AS cumb
      |  FROM per WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED
      |    PRECEDING AND CURRENT ROW)),
      |tot AS (
      |  SELECT sum(na)::BIGINT AS n_a, sum(nb)::BIGINT AS n_b
      |  FROM per)""".stripMargin

  private def purchaseSplit(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    events(s, d).where(col("event_type") === "purchase")
      .select(when(dayofweek(col("ts")).isin(1, 7), "we")
        .otherwise("wd").as("grp"),
        round(col("value") * 100).cast("long").as("cents"))

  val all: Seq[Q] = Seq(

    // KPSS level-stationarity of daily revenue (Bartlett lags = 7, the
    // Ljung-Box lag family): partial sums of the demeaned series over
    // the long-run variance — "is level + noise even the right model"
    // in front of q305's CUSUM and q352's best break.
    Q("q368_kpss",
      Some(s"""$GrainSql,
              |b AS (
              |  SELECT t, y, row_number() OVER (ORDER BY t) AS i,
              |    sum(y::HUGEINT) OVER (ORDER BY t ROWS BETWEEN
              |      UNBOUNDED PRECEDING AND CURRENT ROW) AS c
              |  FROM t),
              |tot AS (
              |  SELECT max(i)::BIGINT AS n, arg_max(c, i) AS sy FROM b),
              |ss AS (
              |  SELECT sum(round(
              |    ((n::DOUBLE * c::DOUBLE - i::DOUBLE * sy::DOUBLE) / 1e8)
              |    * ((n::DOUBLE * c::DOUBLE - i::DOUBLE * sy::DOUBLE) / 1e8)
              |    / (n::DOUBLE * n::DOUBLE), 6)::DECIMAL(38,6)
              |    )::DOUBLE AS ss2
              |  FROM b, tot),
              |lagspec AS (SELECT range AS lag FROM range(0, 8)),
              |pairs AS (
              |  SELECT l.lag, b0.y AS y0, b1.y AS y1
              |  FROM b b0 CROSS JOIN lagspec l
              |  JOIN b b1 ON b1.i = b0.i + l.lag),
              |gam AS (
              |  SELECT lag, sum(round(
              |    ((n::DOUBLE * y0::DOUBLE - sy::DOUBLE) / 1e8)
              |    * ((n::DOUBLE * y1::DOUBLE - sy::DOUBLE) / 1e8)
              |    / (n::DOUBLE * n::DOUBLE), 6)::DECIMAL(38,6)
              |    )::DOUBLE AS g
              |  FROM pairs, tot GROUP BY 1),
              |s2 AS (
              |  SELECT
              |    sum(CASE WHEN lag = 0 THEN g ELSE
              |      2.0 * (1.0 - lag::DOUBLE / 8.0) * g END) AS s2n,
              |    sum(CASE WHEN lag = 0 THEN g END) AS g0n
              |  FROM gam)
              |SELECT n, round(g0n / n::DOUBLE, 6) AS gamma0_r,
              |  round(s2n / n::DOUBLE, 6) AS s2l_r,
              |  round(CASE WHEN s2n > 0 THEN
              |    ss2 / (n::DOUBLE * n::DOUBLE) / (s2n / n::DOUBLE)
              |    END, 6) AS kpss_r
              |FROM ss, tot, s2""".stripMargin),
      (s, d) => TimeSeries.kpss(grain(s, d), "t", "y", lags = 7)),

    // Page-Hinkley sequential drift monitor on daily revenue in k$
    // (delta = 0, lambda = 500 k$): the one-sided "has the mean moved"
    // alarm next to q305's two-sided CUSUM.
    Q("q369_page_hinkley",
      Some(s"""$GrainSql,
              |b AS (
              |  SELECT t, y, row_number() OVER w AS i,
              |    sum(y::HUGEINT) OVER w AS c
              |  FROM t WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED
              |    PRECEDING AND CURRENT ROW)),
              |inc AS (
              |  SELECT t, round((y::DOUBLE - c::DOUBLE / i::DOUBLE)
              |    / 1e5 - 0.0, 6)::DECIMAL(38,6) AS inc
              |  FROM b),
              |m AS (
              |  SELECT t, sum(inc) OVER w AS m
              |  FROM inc WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED
              |    PRECEDING AND CURRENT ROW)),
              |ph AS (
              |  SELECT t, m - min(m) OVER w AS ph
              |  FROM m WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED
              |    PRECEDING AND CURRENT ROW))
              |SELECT count(*)::BIGINT AS n,
              |  max(ph)::DOUBLE AS ph_max,
              |  (SELECT min(t) FROM ph
              |   WHERE ph = (SELECT max(ph) FROM ph))::BIGINT
              |    AS t_at_max,
              |  sum(CASE WHEN ph::DOUBLE > 500.0 THEN 1 ELSE 0
              |    END)::BIGINT AS n_alarms,
              |  min(CASE WHEN ph::DOUBLE > 500.0 THEN t END)
              |    ::BIGINT AS t_first_alarm
              |FROM ph""".stripMargin),
      (s, d) => TimeSeries.pageHinkley(grain(s, d), "t", "y",
        deltaK = 0.0, lambdaK = 500.0)),

    // ARCH-LM(1) volatility clustering of daily-revenue trend
    // residuals: do big errors follow big errors — the conditional
    // sibling of q339's Breusch-Pagan.
    Q("q370_arch_lm",
      Some(s"""$GrainSql,
              |m0 AS (
              |  SELECT count(*)::BIGINT AS n, sum(t)::BIGINT AS st,
              |    sum(t::HUGEINT * t)::HUGEINT AS stt,
              |    sum(y::HUGEINT)::HUGEINT AS sy,
              |    sum(t::HUGEINT * y)::HUGEINT AS sty
              |  FROM t),
              |fit AS (
              |  SELECT (n::DOUBLE * sty::DOUBLE - st::DOUBLE * sy::DOUBLE)
              |      / nullif(n::DOUBLE * stt::DOUBLE
              |        - st::DOUBLE * st::DOUBLE, 0) AS b,
              |    n, st, sy FROM m0),
              |fit2 AS (
              |  SELECT b, (sy::DOUBLE - b * st::DOUBLE) / n::DOUBLE AS a
              |  FROM fit),
              |z AS (
              |  SELECT t.t, round(
              |    ((y::DOUBLE - a - b * t::DOUBLE) / 1e5)
              |    * ((y::DOUBLE - a - b * t::DOUBLE) / 1e5), 6)
              |    ::DECIMAL(38,6) AS z
              |  FROM t, fit2),
              |p AS (
              |  SELECT z, lag(z) OVER w AS zlag, t,
              |    lag(t) OVER w AS tlag
              |  FROM z WINDOW w AS (ORDER BY t)),
              |pp AS (SELECT z, zlag FROM p
              |  WHERE zlag IS NOT NULL AND t = tlag + 1),
              |m AS (
              |  SELECT count(*)::BIGINT AS n, sum(zlag) AS sx,
              |    sum(z) AS sy,
              |    sum(round(zlag::DOUBLE * zlag::DOUBLE, 6)
              |      ::DECIMAL(38,6)) AS sxx,
              |    sum(round(z::DOUBLE * z::DOUBLE, 6)
              |      ::DECIMAL(38,6)) AS syy,
              |    sum(round(zlag::DOUBLE * z::DOUBLE, 6)
              |      ::DECIMAL(38,6)) AS sxy
              |  FROM pp)
              |SELECT n AS n_pairs,
              |  round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
              |    / nullif(n::DOUBLE * sxx::DOUBLE
              |      - sx::DOUBLE * sx::DOUBLE, 0), 6) AS b_r,
              |  round(CASE WHEN n::DOUBLE * sxx::DOUBLE
              |      - sx::DOUBLE * sx::DOUBLE > 0
              |    AND n::DOUBLE * syy::DOUBLE
              |      - sy::DOUBLE * sy::DOUBLE > 0 THEN
              |    (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
              |    * (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
              |    / ((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
              |      * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))
              |    END, 6) AS r2_r,
              |  round(CASE WHEN n::DOUBLE * sxx::DOUBLE
              |      - sx::DOUBLE * sx::DOUBLE > 0
              |    AND n::DOUBLE * syy::DOUBLE
              |      - sy::DOUBLE * sy::DOUBLE > 0 THEN
              |    n::DOUBLE *
              |    ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
              |    * (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
              |    / ((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
              |      * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)))
              |    END, 6) AS lm_r
              |FROM m""".stripMargin),
      (s, d) => Diagnostics.archLm(grain(s, d), "t", "y")),

    // 1-D Wasserstein distance between weekday and weekend purchase
    // values: how many cents must MOVE how far to turn one spending
    // distribution into the other — the metric sibling of q302's
    // Mann-Whitney location read.
    Q("q371_wasserstein_purchases",
      Some(s"""$PurchaseSplitSql,
              |nxt AS (
              |  SELECT v, lead(v) OVER (ORDER BY v) AS vn FROM per),
              |s AS (
              |  SELECT sum(abs(c.cuma::HUGEINT * t.n_b
              |    - c.cumb::HUGEINT * t.n_a)
              |    * (x.vn - c.v)::HUGEINT) AS s
              |  FROM cum c JOIN nxt x USING (v), tot t
              |  WHERE x.vn IS NOT NULL)
              |SELECT t.n_a, t.n_b,
              |  round(s.s::DOUBLE
              |    / (t.n_a::DOUBLE * t.n_b::DOUBLE), 6) AS w1_r
              |FROM s, tot t""".stripMargin),
      (s, d) => Nonparam.wasserstein1d(purchaseSplit(s, d), "cents",
        "grp", "wd", "we", bandWidth = 1000.0)),

    // Cramer-von Mises two-sample statistic on the same split: the L2
    // whole-distribution test (shape + variance sensitive) next to
    // q371's mass-transport metric and q302's rank location test.
    Q("q372_cvm_purchases",
      Some(s"""$PurchaseSplitSql,
              |s AS (
              |  SELECT sum(round(
              |    (c.cuma::DOUBLE / t.n_a::DOUBLE
              |      - c.cumb::DOUBLE / t.n_b::DOUBLE)
              |    * (c.cuma::DOUBLE / t.n_a::DOUBLE
              |      - c.cumb::DOUBLE / t.n_b::DOUBLE)
              |    * (c.na + c.nb)::DOUBLE, 12)::DECIMAL(28,12)
              |    )::DOUBLE AS s
              |  FROM cum c, tot t)
              |SELECT t.n_a, t.n_b,
              |  round(t.n_a::DOUBLE * t.n_b::DOUBLE
              |    / ((t.n_a::DOUBLE + t.n_b::DOUBLE)
              |      * (t.n_a::DOUBLE + t.n_b::DOUBLE)) * s.s, 6)
              |    AS t_r
              |FROM s, tot t""".stripMargin),
      (s, d) => Nonparam.cramerVonMises(purchaseSplit(s, d), "cents",
        "grp", "wd", "we", bandWidth = 1000.0))
  )
}
