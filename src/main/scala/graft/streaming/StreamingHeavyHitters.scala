package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming top-k heavy hitters via a Misra–Gries summary held in
  * `flatMapGroupsWithState` — the streaming twin of the batch MG sketch
  * (q102): per group (event_type), state is AT MOST `capacity` (key,
  * count) counters regardless of how many distinct keys the stream ever
  * sees — the fixed-state property that keeps a 100 TB stream's state
  * store flat where dropDuplicates/count-by-key state grows with
  * distinct keys. (Misra & Gries 1982, "Finding repeated elements";
  * same guarantees as the batch op: estimates undercount by at most
  * N/capacity, and every key with true frequency > N/capacity survives.)
  *
  * When `capacity` ≥ the group's distinct-key count the decrement step
  * never fires and the summary is EXACT — that is the oracle-checked
  * regime (q170 runs capacity 4096 over ≤1500 users); the approximate
  * regime's error bounds are property-tested in
  * StreamingHeavyHittersSpec against a reference fold.
  *
  * Emission contract: each micro-batch emits the group's current top-k
  * snapshot tagged with `version` = items processed so far; the final
  * answer is each group's max-version snapshot ([[heavyHitters]] filters
  * to it batch-side). Within a batch events fold in (event time,
  * event_id) order, so the summary is deterministic under replay for any
  * micro-batch slicing — the same total order the sessionizer uses.
  */
object StreamingHeavyHitters {

  /** One input event (event time in exact microseconds). */
  final case class Ev(event_type: String, user_id: Long, us: Long,
      event_id: Long)

  /** MG summary state: parallel key/count vectors (≤ capacity entries)
    * plus the total item count (the emission version). */
  final case class Mg(keys: Seq[Long], counts: Seq[Long], n: Long)

  /** One emitted top-k row. */
  final case class Hit(event_type: String, r: Int, user_id: Long,
      est_n: Long, version: Long)

  /** The Misra–Gries fold (pure, shared by the stream and the spec's
    * reference): counter hit → +1; room → insert; full → decrement all,
    * dropping zeros. */
  private[streaming] def mgFold(capacity: Int, init: Map[Long, Long],
      items: Iterable[Long]): Map[Long, Long] =
    items.foldLeft(init) { (m, x) =>
      if (m.contains(x)) m.updated(x, m(x) + 1L)
      else if (m.size < capacity) m.updated(x, 1L)
      else m.flatMap { case (k, c) =>
        if (c > 1L) Some(k -> (c - 1L)) else None
      }
    }

  /** The state machine as a streaming Dataset transform (spec-drivable
    * with a MemoryStream). */
  def heavyHittersOf(events: Dataset[Ev], capacity: Int,
      k: Int): Dataset[Hit] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[Mg, Hit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (typ: String, rows: Iterator[Ev], state: GroupState[Mg]) =>
          val prev = state.getOption.getOrElse(Mg(Nil, Nil, 0L))
          val batch = rows.toSeq.sortBy(e => (e.us, e.event_id))
          val folded = mgFold(capacity,
            prev.keys.zip(prev.counts).toMap, batch.map(_.user_id))
          val n = prev.n + batch.size
          val ks = folded.keys.toSeq.sorted
          state.update(Mg(ks, ks.map(folded), n))
          folded.toSeq
            .sortBy { case (key, c) => (-c, key) }
            .take(k).zipWithIndex
            .map { case ((key, c), i) => Hit(typ, i + 1, key, c, n) }
            .iterator
      }
  }

  /** Top-k per event_type over the whole events table, computed
    * incrementally (AvailableNow) with fixed per-group state, returned
    * as a batch frame: (event_type, r, user_id, est_n). Snapshots land
    * in the durable file sink (append); the final filter keeps each
    * group's max-version snapshot — a broadcast join against the tiny
    * (groups)-row max table, not a window. */
  def heavyHitters(spark: SparkSession, dir: String, capacity: Int,
      k: Int): DataFrame = {
    import spark.implicits._
    val hits = heavyHittersOf(
      Streams.eventsStream(spark, dir)
        .select(col("event_type"), col("user_id"),
          unix_micros(col("ts")).as("us"), col("event_id"))
        .as[Ev],
      capacity, k)
    val all = Streams.runToFiles(spark, hits.toDF())
    val latest = all.groupBy(col("event_type").as("_t"))
      .agg(max(col("version")).as("_v"))
    all.join(broadcast(latest),
        col("event_type") === col("_t") && col("version") === col("_v"))
      .select("event_type", "r", "user_id", "est_n")
  }
}
