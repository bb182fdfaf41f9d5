package graft.queries

import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Round-12 batch: timer-driven typed state — the remaining surface of
  * the `transformWithState` API after round 11's ValueState/ListState/
  * MapState trio (VERDICT-r11 item 5: every prior site used
  * `TimeMode.None()`; real session-timeout emission needs event-time
  * timers). Reference scope: generalizes the reference's daily
  * incremental batch (`fetch_youtube_data.py` cron) the way a streaming
  * deployment would — idle-entity state flushed by watermark-driven
  * timers instead of growing forever.
  */
object TimerQueries {

  /** Session gap (seconds) — interpolated into the oracle SQL. */
  private val GapS = 7200L

  val all: Seq[Q] = Seq(

    // Timer-driven sessionization via transformWithState +
    // TimeMode.EventTime: gap splits emit inline ("gap"); each user's
    // trailing open session is flushed by an event-time timer at
    // (end + gap) ms + 1 once the watermark passes it ("timer") — the
    // idle-user flush that keeps per-key state bounded on an unbounded
    // stream. Under AvailableNow (watermark delay 0) emission is
    // deterministic: the final no-data micro-batch fires every timer
    // with expiry <= floor(max event us / 1000) ms (the boundary
    // inequality is PINNED by StatefulTwsSpec's edge test); sessions
    // still open against that watermark stay in state — the oracle
    // encodes exactly that gate. Timers fire only after all data here,
    // so session_idx equals the batch per-user session counter.
    Q("q408_tws_timer_sessions",
      Some(s"""WITH e AS MATERIALIZED (
              |  SELECT user_id, epoch_us(ts)::BIGINT AS us, event_id
              |  FROM events),
              |mx AS (SELECT max(us)::BIGINT AS mus FROM e),
              |o AS MATERIALIZED (
              |  SELECT user_id, us, event_id,
              |    lag(us) OVER (PARTITION BY user_id
              |      ORDER BY us, event_id) AS pus
              |  FROM e),
              |f AS MATERIALIZED (
              |  SELECT user_id, us, event_id,
              |    CASE WHEN pus IS NULL OR us - pus > ${GapS * 1000000L}
              |      THEN 1 ELSE 0 END AS brk
              |  FROM o),
              |si AS MATERIALIZED (
              |  SELECT user_id, us,
              |    sum(brk) OVER (PARTITION BY user_id
              |      ORDER BY us, event_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |      ::BIGINT AS sidx
              |  FROM f),
              |sess AS MATERIALIZED (
              |  SELECT user_id, sidx, count(*)::BIGINT AS n_events,
              |    min(us)::BIGINT AS start_us, max(us)::BIGINT AS end_us
              |  FROM si GROUP BY 1, 2),
              |k AS (
              |  SELECT user_id, sidx, n_events, start_us, end_us,
              |    sidx = max(sidx) OVER (PARTITION BY user_id) AS is_last
              |  FROM sess)
              |SELECT user_id, sidx AS session_idx, n_events, start_us,
              |  end_us,
              |  CASE WHEN NOT is_last THEN 'gap' ELSE 'timer' END
              |    AS closed_by
              |FROM k, mx
              |WHERE NOT is_last
              |   OR (end_us + ${GapS * 1000000L}) // 1000 + 1
              |     <= mus // 1000
              |ORDER BY user_id, session_idx""".stripMargin),
      (s, d) => graft.streaming.StatefulTws.timerSessions(s, d, GapS)
        .orderBy("user_id", "session_idx"))
  )
}
