package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.TimeSeries
import graft.util.Tables._

/** Trend-robustness batch: Theil–Sen median slope, the seasonal-naïve
  * forecast backtest, and lead/lag daily cross-correlation
  * ([[graft.ops.TimeSeries]]).
  */
object TrendQueries {

  private val BacktestLagDays = 7
  private val XcorrMaxLag = 3

  val all: Seq[Q] = Seq(

    // Theil–Sen per event type: median of all pairwise daily-count
    // slopes (exactQuantiles machinery — quantile_cont parity).
    Q("q246_theil_sen",
      Some("""WITH grain AS (
             |  SELECT event_type, ts::DATE AS day, count(*)::BIGINT AS x
             |  FROM events GROUP BY 1, 2),
             |p AS (
             |  SELECT a.event_type,
             |    (b.x - a.x)::DOUBLE / (b.day - a.day) AS slope
             |  FROM grain a JOIN grain b
             |    ON a.event_type = b.event_type AND a.day < b.day)
             |SELECT event_type, count(*)::BIGINT AS n,
             |  round(quantile_cont(slope, 0.5), 6) AS slope_med_r
             |FROM p GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => TimeSeries.theilSen(events(s, d), "event_type", "ts")
        .orderBy("event_type")),

    // Mann–Kendall trend test: the significance companion to q246's
    // Theil–Sen slope — S, Kendall τ and the tie-corrected,
    // continuity-corrected normal z over the same day-grain series.
    Q("q293_mann_kendall",
      Some("""WITH grain AS (
             |  SELECT event_type, ts::DATE AS day, count(*)::BIGINT AS x
             |  FROM events GROUP BY 1, 2),
             |nn AS (SELECT event_type, count(*)::BIGINT AS n FROM grain
             |       GROUP BY 1),
             |p AS (
             |  SELECT a.event_type,
             |    CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1
             |      ELSE 0 END AS sg
             |  FROM grain a JOIN grain b
             |    ON a.event_type = b.event_type AND a.day < b.day),
             |s AS (SELECT event_type, sum(sg)::BIGINT AS s_stat FROM p
             |      GROUP BY 1),
             |ties AS (SELECT event_type, x, count(*)::BIGINT AS t
             |         FROM grain GROUP BY 1, 2),
             |tc AS (SELECT event_type,
             |    sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tcorr
             |  FROM ties WHERE t > 1 GROUP BY 1),
             |a AS (
             |  SELECT s.event_type, nn.n, s.s_stat,
             |    (nn.n * (nn.n - 1) * (2 * nn.n + 5)
             |      - coalesce(tc.tcorr, 0))::BIGINT AS var18
             |  FROM s JOIN nn USING (event_type)
             |  LEFT JOIN tc USING (event_type))
             |SELECT event_type, n, s_stat,
             |  round(s_stat::DOUBLE
             |    / (n::DOUBLE * (n - 1)::DOUBLE / 2.0), 6) AS tau_r,
             |  CASE WHEN var18 > 0 AND s_stat > 0 THEN
             |      round((s_stat - 1)::DOUBLE
             |        / sqrt(var18::DOUBLE / 18.0), 6)
             |    WHEN var18 > 0 AND s_stat < 0 THEN
             |      round((s_stat + 1)::DOUBLE
             |        / sqrt(var18::DOUBLE / 18.0), 6)
             |    WHEN var18 > 0 THEN 0.0 END AS z_r
             |FROM a ORDER BY event_type""".stripMargin),
      (s, d) => TimeSeries.mannKendall(events(s, d), "event_type", "ts")
        .orderBy("event_type")),

    // Seasonal-naïve backtest at lag 7 on the zero-filled spine: MAE /
    // bias from exact integer errors; MAPE over positive-actual days
    // as 12-dp DECIMAL term sums.
    Q("q247_forecast_backtest",
      Some(s"""WITH daily AS (
              |  SELECT event_type, ts::DATE AS day,
              |    count(*)::BIGINT AS x
              |  FROM events GROUP BY 1, 2),
              |bounds AS (
              |  SELECT event_type, min(day) AS d0, max(day) AS d1
              |  FROM daily GROUP BY 1),
              |spine AS (
              |  SELECT event_type,
              |    unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE
              |      AS day
              |  FROM bounds),
              |filled AS (
              |  SELECT s.event_type, s.day, coalesce(d.x, 0)::BIGINT AS x
              |  FROM spine s LEFT JOIN daily d USING (event_type, day)),
              |j AS (
              |  SELECT f.event_type, f.x, p.x AS p
              |  FROM filled f JOIN filled p
              |    ON f.event_type = p.event_type
              |   AND f.day = p.day + $BacktestLagDays)
              |SELECT event_type, count(*)::BIGINT AS n_days,
              |  round(sum(abs(x - p))::DOUBLE / count(*), 6) AS mae_r,
              |  round(sum(x - p)::DOUBLE / count(*), 6) AS bias_r,
              |  sum(CASE WHEN x > 0 THEN 1 ELSE 0 END)::BIGINT AS n_pos,
              |  CASE WHEN sum(CASE WHEN x > 0 THEN 1 ELSE 0 END) > 0
              |    THEN round(sum(CASE WHEN x > 0
              |        THEN round(abs(x - p)::DOUBLE / x, 12)
              |          ::DECIMAL(28,12) END)::DOUBLE
              |      / sum(CASE WHEN x > 0 THEN 1 ELSE 0 END), 6)
              |  END AS mape_r
              |FROM j GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => TimeSeries.seasonalNaiveBacktest(events(s, d),
          "event_type", "ts", BacktestLagDays)
        .orderBy("event_type")),

    // view → purchase daily cross-correlation at lags −3..3 (lag > 0 =
    // views lead purchases): shared zero-filled spine, per-lag integer
    // moments, one shared Pearson parenthesization.
    Q("q248_xcorr_daily",
      Some(s"""WITH days AS (
              |  SELECT ts::DATE AS day,
              |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS a,
              |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
              |      AS b
              |  FROM events),
              |daily AS (
              |  SELECT day, sum(a)::BIGINT AS xa, sum(b)::BIGINT AS xb
              |  FROM days GROUP BY 1),
              |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
              |spine AS (
              |  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))
              |    ::DATE AS day
              |  FROM bounds),
              |filled AS (
              |  SELECT s.day, coalesce(d.xa, 0)::BIGINT AS xa,
              |    coalesce(d.xb, 0)::BIGINT AS xb
              |  FROM spine s LEFT JOIN daily d USING (day)),
              |lags AS (
              |  SELECT unnest(generate_series(-$XcorrMaxLag,
              |    $XcorrMaxLag))::INT AS lag),
              |pairs AS (
              |  SELECT l.lag, count(*)::BIGINT AS n_pairs,
              |    sum(f.xa)::BIGINT AS sx, sum(y.xb)::BIGINT AS sy,
              |    sum(f.xa * f.xa)::BIGINT AS sxx,
              |    sum(y.xb * y.xb)::BIGINT AS syy,
              |    sum(f.xa * y.xb)::BIGINT AS sxy
              |  FROM lags l
              |  JOIN filled f ON true
              |  JOIN filled y ON y.day - l.lag = f.day
              |  GROUP BY 1)
              |SELECT lag, n_pairs,
              |  CASE WHEN sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n_pairs > 0
              |        AND syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n_pairs > 0
              |    THEN round((sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n_pairs)
              |      / (sqrt(sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n_pairs)
              |         * sqrt(syy::DOUBLE - sy::DOUBLE * sy::DOUBLE
              |             / n_pairs)), 6)
              |  END AS r_r
              |FROM pairs ORDER BY lag""".stripMargin),
      (s, d) => TimeSeries.xcorrDaily(events(s, d), "ts",
          col("event_type") === "view", col("event_type") === "purchase",
          XcorrMaxLag)
        .orderBy("lag"))) :+ pacfQuery

  // Partial autocorrelation at lags 1–3 via the Durbin–Levinson closed
  // forms over q228's 6-dp ACF — "is lag-2 structure real or just
  // lag-1 echoed twice", the AR-order diagnostic ACF alone can't give.
  // Both engines derive from the SAME rounded ρ values, so the
  // recursion is bit-identical by construction. (A def, not a val:
  // `all` above references it before this point in init order.)
  private def pacfQuery: Q = Q("q335_pacf",
    Some("""WITH daily AS (
           |  SELECT event_type, ts::DATE AS day, count(*)::BIGINT AS x
           |  FROM events GROUP BY 1, 2),
           |bounds AS (
           |  SELECT event_type, min(day) AS d0, max(day) AS d1
           |  FROM daily GROUP BY 1),
           |spine AS (
           |  SELECT event_type,
           |    unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE
           |      AS day
           |  FROM bounds),
           |filled AS (
           |  SELECT s.event_type, s.day, coalesce(d.x, 0)::BIGINT AS x
           |  FROM spine s LEFT JOIN daily d USING (event_type, day)),
           |stats AS (
           |  SELECT event_type, count(*)::BIGINT AS n,
           |    sum(x)::BIGINT AS s, sum(x * x)::BIGINT AS ss
           |  FROM filled GROUP BY 1),
           |pairs AS (
           |  SELECT f1.event_type, l.lag, count(*)::BIGINT AS m,
           |    sum(f1.x * f2.x)::BIGINT AS p,
           |    sum(f1.x)::BIGINT AS a, sum(f2.x)::BIGINT AS b
           |  FROM filled f1
           |  CROSS JOIN (SELECT unnest(generate_series(1, 3))::INTEGER
           |              AS lag) l
           |  JOIN filled f2 ON f2.event_type = f1.event_type
           |    AND f2.day = f1.day + l.lag
           |  GROUP BY 1, 2),
           |acf AS (
           |  SELECT p.event_type, p.lag,
           |    CASE WHEN ss > (s::DOUBLE / n) * s THEN
           |      round((p.p - (s::DOUBLE / n) * (p.a + p.b)
           |        + p.m * (s::DOUBLE / n) * (s::DOUBLE / n))
           |        / (ss - (s::DOUBLE / n) * s), 6)
           |    END AS r
           |  FROM pairs p JOIN stats USING (event_type)),
           |pv AS (
           |  SELECT event_type,
           |    max(CASE WHEN lag = 1 THEN r END) AS r1,
           |    max(CASE WHEN lag = 2 THEN r END) AS r2,
           |    max(CASE WHEN lag = 3 THEN r END) AS r3
           |  FROM acf GROUP BY 1),
           |p2 AS (
           |  SELECT event_type, r1, r2, r3,
           |    CASE WHEN 1 - r1 * r1 <> 0 THEN
           |      (r2 - r1 * r1) / (1 - r1 * r1) END AS p22
           |  FROM pv),
           |p3 AS (SELECT event_type, r1, r2, r3, p22,
           |       r1 - p22 * r1 AS p21 FROM p2)
           |SELECT event_type, round(r1, 6) AS pacf1_r,
           |  round(p22, 6) AS pacf2_r,
           |  CASE WHEN 1 - p21 * r1 - p22 * r2 <> 0 THEN
           |    round((r3 - p21 * r2 - p22 * r1)
           |      / (1 - p21 * r1 - p22 * r2), 6) END AS pacf3_r
           |FROM p3 ORDER BY event_type""".stripMargin),
    (s, d) => {
      val acf = TimeSeries.acfDaily(events(s, d), "event_type", "ts", 3)
      val pv = acf.groupBy(col("event_type"))
        .agg(max(when(col("lag") === 1, col("acf_r"))).as("r1"),
          max(when(col("lag") === 2, col("acf_r"))).as("r2"),
          max(when(col("lag") === 3, col("acf_r"))).as("r3"))
      val p22 = when(lit(1.0) - col("r1") * col("r1") =!= 0,
        (col("r2") - col("r1") * col("r1")) /
          (lit(1.0) - col("r1") * col("r1")))
      val withP = pv.withColumn("_p22", p22)
        .withColumn("_p21", col("r1") - col("_p22") * col("r1"))
      withP.select(col("event_type"), round(col("r1"), 6).as("pacf1_r"),
        round(col("_p22"), 6).as("pacf2_r"),
        round(when(lit(1.0) - col("_p21") * col("r1")
          - col("_p22") * col("r2") =!= 0,
          (col("r3") - col("_p21") * col("r2")
            - col("_p22") * col("r1")) /
            (lit(1.0) - col("_p21") * col("r1")
              - col("_p22") * col("r2"))), 6).as("pacf3_r"))
        .orderBy("event_type")
    })
}
