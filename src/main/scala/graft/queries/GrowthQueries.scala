package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Behavior, Ranks}
import graft.util.Tables._

/** Growth-analytics batch: time-decay multi-touch attribution,
  * per-stage time-to-convert quartiles, and the cohort LTV curve
  * ([[graft.ops.Behavior]]).
  */
object GrowthQueries {

  private val LookbackUs = 7L * 86400 * 1000000 // 7 days
  private val TauUs = 86400L * 1000000 // 1 day
  private val DtBandUs = 3.6e9 // ~1-hour bands for the dt quantiles

  val all: Seq[Q] = Seq(

    // Time-decay attribution: each purchase splits one credit unit over
    // its prior-7-day view/click touches with exp(−Δt/1d) weights;
    // 12-dp DECIMAL weight and credit reductions.
    Q("q252_decay_attribution",
      Some(s"""WITH e AS (
              |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us
              |  FROM events),
              |c AS (
              |  SELECT user_id, us AS cus, event_id AS cid
              |  FROM e WHERE event_type = 'purchase'),
              |t AS (
              |  SELECT user_id, event_type AS channel, us AS tus
              |  FROM e WHERE event_type IN ('view', 'click')),
              |j AS (
              |  SELECT c.user_id, c.cid, t.channel,
              |    round(exp((t.tus - c.cus)::DOUBLE / ${TauUs.toDouble}),
              |      12)::DECIMAL(28,12) AS wr
              |  FROM c JOIN t ON c.user_id = t.user_id
              |    AND t.tus < c.cus AND c.cus - t.tus <= $LookbackUs),
              |s AS (
              |  SELECT channel, wr,
              |    sum(wr) OVER (PARTITION BY user_id, cid) AS sw
              |  FROM j)
              |SELECT channel, count(*)::BIGINT AS n_touches,
              |  round(sum(round(wr::DOUBLE / sw::DOUBLE, 12)
              |    ::DECIMAL(28,12))::DOUBLE, 6) AS credit_r
              |FROM s GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => Behavior.decayAttribution(events(s, d), "user_id",
          "event_type", "ts", "event_id", "purchase",
          Seq("view", "click"), LookbackUs, TauUs)
        .orderBy("channel")),

    // Where do users stall? Exact quartiles of the funnel's per-stage
    // transition times (view→click, click→purchase) — funnel chain
    // semantics + the distributed-exact quantile machinery.
    Q("q253_time_to_convert",
      Some("""WITH e AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS us
             |  FROM events),
             |t1s AS (
             |  SELECT user_id, event_type, us,
             |    min(CASE WHEN event_type = 'view' THEN us END)
             |      OVER (PARTITION BY user_id) AS t1
             |  FROM e),
             |t2s AS (
             |  SELECT user_id, event_type, us, t1,
             |    min(CASE WHEN event_type = 'click' AND us > t1 THEN us
             |        END) OVER (PARTITION BY user_id) AS t2
             |  FROM t1s),
             |t3s AS (
             |  SELECT user_id, t1, t2,
             |    min(CASE WHEN event_type = 'purchase' AND us > t2
             |        THEN us END) OVER (PARTITION BY user_id) AS t3
             |  FROM t2s),
             |p AS (
             |  SELECT user_id, max(t1) AS t1, max(t2) AS t2,
             |    max(t3) AS t3
             |  FROM t3s GROUP BY 1),
             |d AS (
             |  SELECT 'view->click' AS stage_pair, user_id,
             |    t2 - t1 AS dt
             |  FROM p WHERE t2 IS NOT NULL
             |  UNION ALL
             |  SELECT 'click->purchase', user_id, t3 - t2
             |  FROM p WHERE t3 IS NOT NULL)
             |SELECT stage_pair, count(*)::BIGINT AS n, 0.25::DOUBLE AS q,
             |  quantile_cont(dt, 0.25) AS q_val
             |FROM d GROUP BY 1
             |UNION ALL
             |SELECT stage_pair, count(*)::BIGINT, 0.5::DOUBLE,
             |  quantile_cont(dt, 0.5) FROM d GROUP BY 1
             |UNION ALL
             |SELECT stage_pair, count(*)::BIGINT, 0.75::DOUBLE,
             |  quantile_cont(dt, 0.75) FROM d GROUP BY 1
             |ORDER BY stage_pair, q""".stripMargin),
      (s, d) => Ranks.exactQuantiles(
          Behavior.stageDurations(events(s, d), "user_id", "event_type",
            "ts", Seq("view", "click", "purchase")),
          "stage_pair", "dt_us", "user_id", bandWidth = DtBandUs,
          nums = Seq(1, 2, 3), den = 4)
        .orderBy("stage_pair", "q")),

    // Cohort LTV: first-seen ISO-week cohorts × weeks-since, active
    // users, weekly purchase cents and the cohort running total.
    Q("q254_cohort_ltv",
      Some("""WITH wk AS (
             |  SELECT user_id, date_trunc('week', ts)::DATE AS week,
             |    CASE WHEN event_type = 'purchase'
             |      THEN CAST(round(value * 100) AS BIGINT)
             |      ELSE 0 END AS m
             |  FROM events),
             |coh AS (
             |  SELECT user_id, min(week) AS cohort_week
             |  FROM wk GROUP BY 1),
             |g AS (
             |  SELECT c.cohort_week,
             |    ((w.week - c.cohort_week) // 7)::BIGINT AS week_n,
             |    count(DISTINCT w.user_id)::BIGINT AS n_active,
             |    sum(w.m)::BIGINT AS rev
             |  FROM wk w JOIN coh c USING (user_id)
             |  GROUP BY 1, 2)
             |SELECT cohort_week, week_n, n_active, rev,
             |  sum(rev) OVER (PARTITION BY cohort_week ORDER BY week_n)
             |    ::BIGINT AS cum_rev
             |FROM g ORDER BY 1, 2""".stripMargin),
      (s, d) => Behavior.cohortLtv(events(s, d), "user_id", "ts",
          when(col("event_type") === "purchase",
            round(col("value") * 100).cast("long")).otherwise(0L))
        .orderBy("cohort_week", "week_n")))
}
