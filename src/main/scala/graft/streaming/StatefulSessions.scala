package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** CUSTOM streaming state via `flatMapGroupsWithState` (SURVEY.md §2.10's
  * arbitrary-state line): gap-rule sessionization where the session
  * accumulator is user code, not a built-in — the API a pipeline reaches
  * for when `session_window` can't express its state (e.g. carrying
  * per-session aggregates, counters, or ML features across batches).
  *
  * Semantics (aligned with the batch twin `ops.Sessionize` so the DuckDB
  * oracle can check the streaming path): events of one user, ordered by
  * (event time, event_id), belong to one session while each gap is
  * ≤ `gapSeconds`; a strictly larger gap opens the next session, indexed
  * from 1 in time order.
  *
  * Emission contract = CLOSED sessions only: a session is emitted the
  * moment a later event proves it over (the gap rule fired). Each user's
  * final, still-open session stays in state — deterministic regardless of
  * watermark/timeout internals, which is what makes the result
  * oracle-checkable (the batch twin minus each user's last session). The
  * timeout-based variant that also flushes idle open sessions is
  * [[timedOutSessions]] (spec-tested; its emission set depends on
  * watermark advancement, so it's exercised with a controlled
  * MemoryStream rather than an oracle).
  *
  * Scale shape: ONE shuffle by user (the groupByKey), state is one small
  * case class per user (not the event history), and each micro-batch
  * sorts only that batch's per-user events — the same state size class as
  * Spark's own session_window.
  *
  * Cross-batch disorder policy (in-order input is unaffected): an event
  * arriving WITHIN the open session's span ± gap merges losslessly (the
  * min/max advance in [[advance]]); an event more than gap OLDER than the
  * open session's start is dropped as late data — the batch twin would
  * give it a separate earlier session, which a closed-only stream cannot
  * emit retroactively without renumbering already-emitted sessions.
  */
object StatefulSessions {

  /** One input event, event time in exact microseconds (ties broken by
    * event_id — the same total order the batch twin uses). */
  final case class Ev(user_id: Long, event_id: Long, us: Long)

  /** Per-user state: the one open session. */
  final case class Open(idx: Long, startUs: Long, endUs: Long, n: Long)

  /** One closed session. */
  final case class Sess(user_id: Long, session_idx: Long, n_events: Long,
      start_us: Long, end_us: Long)

  /** The state-transition function, shared by both emission modes:
    * fold this batch's (sorted) events into the open session, emitting
    * every session the gap rule closes. */
  private def advance(user: Long, sorted: Seq[Ev], gapUs: Long,
      state: GroupState[Open]): Iterator[Sess] = {
    val closed = Seq.newBuilder[Sess]
    var cur: Open = state.getOption.orNull
    sorted.foreach { e =>
      if (cur == null) cur = Open(1L, e.us, e.us, 1L)
      else if (e.us - cur.endUs > gapUs) {
        closed += Sess(user, cur.idx, cur.n, cur.startUs, cur.endUs)
        cur = Open(cur.idx + 1L, e.us, e.us, 1L)
      } else if (cur.startUs - e.us > gapUs) {
        // LATE DATA, dropped: an event more than gap OLDER than the open
        // session's start (possible only across micro-batches — within a
        // batch, `sorted` rules it out). The batch twin would put it in a
        // SEPARATE earlier session, but emitting that retroactively would
        // renumber sessions this stream has already emitted — closed-only
        // streaming cannot represent it. Dropping bounds the divergence
        // to the late event itself; merging instead would stretch
        // start_us backward past a true session boundary AND inflate
        // n_events. Standard watermark-style late-data policy; a no-op on
        // in-order input (the oracle-checked path). Disorder WITHIN the
        // gap is handled losslessly by the min/max advance below.
      } else cur = Open(cur.idx, math.min(cur.startUs, e.us),
        // max, not overwrite: a batch may deliver an event OLDER than the
        // open session's end (cross-batch disorder within the gap — e.g.
        // a source replay, or files not in time order). Overwriting endUs
        // backward would let the NEXT event's gap test fire spuriously
        // and split one true session in two. min/max are no-ops on
        // in-order input, so the oracle-checked path is unchanged.
        math.max(cur.endUs, e.us), cur.n + 1L)
    }
    if (cur != null) state.update(cur)
    closed.result().iterator
  }

  /** Closed sessions of the events table, computed INCREMENTALLY through
    * the streaming engine (AvailableNow) with custom state, returned as a
    * batch frame: (user_id, session_idx, n_events, sess_start, sess_end).
    * Output goes through the durable file sink — unbounded in the input,
    * so never a memory sink. */
  def closedSessions(spark: SparkSession, dir: String,
      gapSeconds: Long): DataFrame = {
    import spark.implicits._
    val sessions = closedSessionsOf(
      Streams.eventsStream(spark, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .as[Ev],
      gapSeconds)
    Streams.runToFiles(spark, sessions.toDF()
      .select(col("user_id"), col("session_idx"), col("n_events"),
        timestamp_micros(col("start_us")).as("sess_start"),
        timestamp_micros(col("end_us")).as("sess_end")))
  }

  /** The closed-only state machine as a streaming Dataset transform —
    * the core of [[closedSessions]], split out so specs can drive it
    * with a MemoryStream across controlled micro-batches. */
  def closedSessionsOf(events: org.apache.spark.sql.Dataset[Ev],
      gapSeconds: Long): org.apache.spark.sql.Dataset[Sess] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Open, Sess](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[Open]) =>
          advance(user, rows.toSeq.sortBy(e => (e.us, e.event_id)),
            gapUs, state)
      }
  }

  /** The production liveness variant: same state machine, plus an
    * EVENT-TIME TIMEOUT that flushes a user's open session once the
    * watermark passes its end + gap (idle users don't hold state
    * forever). Used with a live stream; emission timing depends on
    * watermark progress, so specs drive it with MemoryStream. */
  def sessionsWithTimeout(events: org.apache.spark.sql.Dataset[Ev],
      gapSeconds: Long): org.apache.spark.sql.Dataset[Sess] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L
    events
      .withColumn("ts", timestamp_micros(col("us")))
      .withWatermark("ts", "0 seconds")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Open, Sess](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[Open]) =>
          if (!rows.hasNext && state.hasTimedOut) {
            // watermark passed end + gap: the open session can never be
            // extended — flush and clear
            val cur = state.get
            state.remove()
            Iterator(Sess(user, cur.idx, cur.n, cur.startUs, cur.endUs))
          } else {
            val out = advance(user,
              rows.toSeq.sortBy(e => (e.us, e.event_id)), gapUs, state)
            state.getOption.foreach { cur =>
              state.setTimeoutTimestamp((cur.endUs + gapUs) / 1000L + 1L)
            }
            out
          }
      }
  }
}
