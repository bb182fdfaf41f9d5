package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Infer, Ranks, TimeSeries}
import graft.util.Tables._

/** Signal-monitoring batch: single-changepoint detection (binary
  * segmentation), Wilson score intervals for segment rates, and
  * inter-event think-time quartiles via the distributed-exact
  * quantile machinery ([[graft.ops.TimeSeries.trendBreak]],
  * [[graft.ops.Infer.wilsonInterval]], [[graft.ops.Ranks]]).
  */
object SignalQueries {

  // gap_us band width for the think-time banded rank: ~1-hour bands
  private val GapBandUs = 3.6e9

  val all: Seq[Q] = Seq(

    // Binary-segmentation changepoint per event type: the day that
    // best splits the daily-count series into two level segments
    // (max between-segment SS, earliest-day tiebreak).
    Q("q240_trend_break",
      Some("""WITH grain AS (
             |  SELECT event_type, ts::DATE AS day,
             |    count(*)::BIGINT AS x
             |  FROM events GROUP BY 1, 2),
             |scan AS (
             |  SELECT event_type, day,
             |    count(*) OVER (PARTITION BY event_type ORDER BY day)
             |      ::BIGINT AS n_l,
             |    sum(x) OVER (PARTITION BY event_type ORDER BY day)
             |      ::BIGINT AS s_l,
             |    count(*) OVER (PARTITION BY event_type)::BIGINT AS n,
             |    sum(x) OVER (PARTITION BY event_type)::BIGINT AS s
             |  FROM grain),
             |sc AS (
             |  SELECT event_type, day, n_l, n - n_l AS n_r,
             |    s_l::DOUBLE / n_l AS ml,
             |    (s::DOUBLE - s_l::DOUBLE) / (n - n_l) AS mr,
             |    s_l::DOUBLE * s_l::DOUBLE / n_l
             |      + (s::DOUBLE - s_l::DOUBLE) * (s::DOUBLE - s_l::DOUBLE)
             |        / (n - n_l)
             |      - s::DOUBLE * s::DOUBLE / n AS gain
             |  FROM scan WHERE n_l < n),
             |best AS (
             |  SELECT event_type, day, n_l, n_r, ml, mr, gain,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY gain DESC, day) AS rk
             |  FROM sc)
             |SELECT event_type, day AS break_day, n_l AS n_left,
             |  n_r AS n_right, round(ml, 6) AS mean_l_r,
             |  round(mr, 6) AS mean_r_r, round(gain, 6) AS gain_r
             |FROM best WHERE rk = 1 ORDER BY event_type""".stripMargin),
      (s, d) => TimeSeries.trendBreak(events(s, d), "event_type", "ts")
        .orderBy("event_type")),

    // Wilson 95% interval for the share of high-value events (> 100)
    // per type — the small-sample-honest segment-rate ranking bound.
    Q("q241_wilson_interval",
      Some("""WITH a AS (
             |  SELECT event_type, count(*)::BIGINT AS n,
             |    sum(CASE WHEN value > 100 THEN 1 ELSE 0 END)::BIGINT
             |      AS k
             |  FROM events GROUP BY 1)
             |SELECT event_type, n, k,
             |  round(k::DOUBLE / n, 6) AS rate_r,
             |  round((k::DOUBLE / n + (1.959964 * 1.959964) / (2.0 * n))
             |      / (1.0 + (1.959964 * 1.959964) / n)
             |    - 1.959964 * sqrt(k::DOUBLE / n * (1.0 - k::DOUBLE / n)
             |        / n + (1.959964 * 1.959964) / (4.0 * n * n))
             |      / (1.0 + (1.959964 * 1.959964) / n), 6) AS lo_r,
             |  round((k::DOUBLE / n + (1.959964 * 1.959964) / (2.0 * n))
             |      / (1.0 + (1.959964 * 1.959964) / n)
             |    + 1.959964 * sqrt(k::DOUBLE / n * (1.0 - k::DOUBLE / n)
             |        / n + (1.959964 * 1.959964) / (4.0 * n * n))
             |      / (1.0 + (1.959964 * 1.959964) / n), 6) AS hi_r
             |FROM a ORDER BY event_type""".stripMargin),
      (s, d) => Infer.wilsonInterval(events(s, d), "event_type",
          col("value") > 100)
        .orderBy("event_type")),

    // Think-time quartiles per event type: exact distributed
    // percentile_cont over the gap (in µs) from each event to the same
    // user's next event — bandedRank two-level pass, no single-task
    // sort, quantile_cont parity.
    Q("q242_think_time",
      Some("""WITH e AS (
             |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
             |  FROM events),
             |g AS (
             |  SELECT event_type, event_id,
             |    lead(us) OVER (PARTITION BY user_id
             |      ORDER BY us, event_id) - us AS gap
             |  FROM e)
             |SELECT event_type, count(*)::BIGINT AS n, 0.25::DOUBLE AS q,
             |  quantile_cont(gap, 0.25) AS q_val
             |FROM g WHERE gap IS NOT NULL GROUP BY 1
             |UNION ALL
             |SELECT event_type, count(*)::BIGINT, 0.5::DOUBLE,
             |  quantile_cont(gap, 0.5) FROM g WHERE gap IS NOT NULL
             |GROUP BY 1
             |UNION ALL
             |SELECT event_type, count(*)::BIGINT, 0.75::DOUBLE,
             |  quantile_cont(gap, 0.75) FROM g WHERE gap IS NOT NULL
             |GROUP BY 1
             |ORDER BY event_type, q""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("_us"), col("event_id"))
        val gaps = events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("_us"))
          .withColumn("gap", lead(col("_us"), 1).over(w) - col("_us"))
          .where(col("gap").isNotNull)
        Ranks.exactQuantiles(gaps, "event_type", "gap", "event_id",
            bandWidth = GapBandUs, nums = Seq(1, 2, 3), den = 4)
          .orderBy("event_type", "q")
      }))
}
