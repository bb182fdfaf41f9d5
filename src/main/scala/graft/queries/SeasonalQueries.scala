package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.TimeSeries
import graft.util.Tables._

/** Seasonality & robust monitoring over the daily event grid: weekday
  * seasonal indexes (plain and trend-adjusted) and rolling-MAD anomaly
  * flags — the profile a monitoring stack learns so weekly rhythm
  * doesn't page anyone. All windows run over the DAY-GRAIN table; the
  * event table is touched exactly once per query.
  */
object SeasonalQueries {

  val all: Seq[Q] = Seq(

    // Day-of-week index = weekday mean / overall mean daily count.
    Q("q221_dow_seasonal_index",
      Some("""WITH daily AS (
             |  SELECT event_type, ts::DATE AS day, count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |pd AS (
             |  SELECT event_type, dayofweek(day) AS dow,
             |    count(*)::BIGINT AS n_days, sum(n)::BIGINT AS s
             |  FROM daily GROUP BY 1, 2),
             |t AS (
             |  SELECT event_type, count(*)::BIGINT AS td,
             |    sum(n)::BIGINT AS tn
             |  FROM daily GROUP BY 1)
             |SELECT pd.event_type, dow, n_days,
             |  round(s / n_days, 6) AS mean_count_r,
             |  round((s / n_days) / (tn / td), 6) AS seasonal_index_r
             |FROM pd JOIN t ON pd.event_type = t.event_type
             |ORDER BY pd.event_type, dow""".stripMargin),
      (s, d) => TimeSeries.dowSeasonalIndex(events(s, d), "event_type",
          "ts")
        .orderBy("event_type", "dow")),

    // Trend-adjusted weekday index: ratio to the centered 7-day MA,
    // averaged per weekday as a DECIMAL sum of rounded ratios.
    Q("q222_ratio_to_ma",
      Some("""WITH daily AS (
             |  SELECT event_type, ts::DATE AS day, count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |f AS (
             |  SELECT event_type, day, n, count(*) OVER w AS wn,
             |    sum(n) OVER w AS ws
             |  FROM daily WINDOW w AS (PARTITION BY event_type
             |    ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
             |det AS (
             |  SELECT event_type, dayofweek(day) AS dow,
             |    floor(n / (ws / 7.0) * 1000000.0 + 0.5) / 1000000.0
             |      AS ratio
             |  FROM f WHERE wn = 7)
             |SELECT event_type, dow, count(*)::BIGINT AS n_obs,
             |  floor(sum(ratio::DECIMAL(18,6))::DOUBLE / count(*)
             |    * 1000000.0 + 0.5) / 1000000.0 AS seasonal_r
             |FROM det GROUP BY 1, 2
             |ORDER BY event_type, dow""".stripMargin),
      (s, d) => TimeSeries.ratioToMaSeasonal(events(s, d), "event_type",
          "ts")
        .orderBy("event_type", "dow")),

    // Rolling 14-day median/MAD anomaly flags per event type.
    Q("q223_rolling_mad_anomalies",
      Some("""WITH daily AS (
             |  SELECT event_type, ts::DATE AS day, count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |a AS (
             |  SELECT event_type, day, n,
             |    list_sort(list(n::DOUBLE) OVER (
             |      PARTITION BY event_type ORDER BY day
             |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)) AS arr
             |  FROM daily),
             |m AS (
             |  SELECT event_type, day, n, arr,
             |    CASE WHEN len(arr) % 2 = 1
             |      THEN arr[(len(arr) + 1) // 2]
             |      ELSE (arr[len(arr) // 2] + arr[len(arr) // 2 + 1])
             |        / 2.0 END AS med
             |  FROM a),
             |d AS (
             |  SELECT event_type, day, n, med,
             |    list_sort(list_transform(arr, x -> abs(x - med)))
             |      AS devs
             |  FROM m),
             |x AS (
             |  SELECT event_type, day, n, med,
             |    CASE WHEN len(devs) % 2 = 1
             |      THEN devs[(len(devs) + 1) // 2]
             |      ELSE (devs[len(devs) // 2] + devs[len(devs) // 2 + 1])
             |        / 2.0 END AS mad
             |  FROM d)
             |SELECT event_type, day, n::BIGINT AS n,
             |  round(med, 6) AS med_r, round(mad, 6) AS mad_r,
             |  abs(n - med) > 3.0 * 1.4826 * mad AS is_anomaly
             |FROM x ORDER BY event_type, day""".stripMargin),
      (s, d) => TimeSeries.rollingMadAnomalies(events(s, d),
          "event_type", "ts", windowDays = 14)
        .orderBy("event_type", "day")))
}
