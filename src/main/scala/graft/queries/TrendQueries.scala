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
        .orderBy("lag")))
}
