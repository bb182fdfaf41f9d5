package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key QUOTA ADMISSION via `flatMapGroupsWithState`: admit
  * each key's first `cap` events (in event-time order), drop the rest —
  * the ingestion-side rate cap a training-data pipeline puts in front of
  * an unbounded source so no key (site, user, source) floods a shard.
  * The batch twin is `Curation.capPerKey`; running it THROUGH the
  * streaming engine makes the cap hold incrementally across arbitrarily
  * many micro-batches, which a batch job re-run per day cannot (each run
  * re-admits from zero).
  *
  * Determinism contract (what the DuckDB oracle checks): with in-order
  * input, admitted = the first `cap` events per key by (event time, id),
  * each stamped with its admission index. Cross-batch disorder cannot
  * revoke an admission (admitted is admitted — the stream already
  * emitted it); a late event consumes remaining quota at arrival. This
  * is the standard streaming-quota semantics: first-come-first-admitted
  * in PROCESSING order, which equals event order on the oracle-checked
  * in-order path.
  *
  * Scale shape: ONE shuffle by key (the groupByKey); state per key is a
  * single counter (8 bytes — constant, not per-event); each micro-batch
  * sorts only its own per-key slice. Same state class as the built-in
  * dropDuplicates, far below session state.
  */
object StreamQuota {

  /** One input event: grouping key, id (tiebreak), event-time micros. */
  final case class Ev(key: String, event_id: Long, us: Long)

  /** One admitted event with its 1-based admission index. */
  final case class Adm(key: String, admit_idx: Long, event_id: Long)

  /** The counter state machine as a streaming Dataset transform, spec- and
    * MemoryStream-drivable. */
  def admittedOf(events: Dataset[Ev], cap: Long): Dataset[Adm] = {
    require(cap > 0, "cap must be > 0")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[Long, Adm](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Ev], state: GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(e => (e.us, e.event_id))
            .iterator.takeWhile(_ => n < cap)
            .map { e => n += 1; Adm(key, n, e.event_id) }
            .toVector
          state.update(n)
          out.iterator
      }
  }

  /** Per-event-type quota over the events table, computed INCREMENTALLY
    * through the streaming engine (AvailableNow) and returned as a batch
    * frame (event_type, admit_idx, event_id). Durable file sink — the
    * input is unbounded in production, so never a memory sink. */
  def admitted(spark: SparkSession, dir: String, cap: Long): DataFrame = {
    import spark.implicits._
    val adm = admittedOf(
      Streams.eventsStream(spark, dir)
        .select(col("event_type").as("key"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .as[Ev],
      cap)
    Streams.runToFiles(spark, adm.toDF()
      .select(col("key").as("event_type"), col("admit_idx"),
        col("event_id")))
  }
}
