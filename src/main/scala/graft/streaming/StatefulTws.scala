package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** CUSTOM streaming state via `transformWithState` — Spark 4's
  * successor to `flatMapGroupsWithState` (the [[StatefulSessions]]
  * API): typed state handles (`ValueState`/`ListState`/`MapState`)
  * with per-state TTL, timers, and a mandatory RocksDB state store —
  * the API a 100 TB streaming deployment targets, because state lives
  * off-heap/on-disk per executor instead of in the JVM heap of the
  * HDFS-backed provider.
  *
  * The op: per-user running purchase accumulator. For every purchase
  * event, emit (user_id, purchase_seq, event_id, cum_cents) — the
  * "customer lifetime spend so far" enrichment a feature store keeps
  * hot. State per user is ONE (seq, cum) pair in a `ValueState` —
  * constant bytes per key, never the event history.
  *
  * Determinism contract (the [[StatefulSessions]] disorder policy's
  * sibling): rows WITHIN a micro-batch are sorted by (event time,
  * event_id) before folding, so under AvailableNow over the driver
  * fixtures (one batch) the output is exactly the batch prefix-sum
  * window and the DuckDB oracle checks it row-for-row. Cross-batch
  * disorder folds in arrival order — documented, spec-exercised via
  * MemoryStream (state carries across batches).
  */
object StatefulTws {

  /** One purchase, event time in exact microseconds, value in cents. */
  final case class Purchase(user_id: Long, event_id: Long, us: Long,
      cents: Long)

  /** The running accumulator state: purchases seen, cents so far. */
  final case class Agg(seq: Long, cum: Long)

  /** One emitted enrichment row. */
  final case class Running(user_id: Long, purchase_seq: Long,
      event_id: Long, cum_cents: Long)

  /** The processor: fold each user's batch rows (sorted) into the
    * ValueState accumulator, emitting one row per purchase. */
  class SpendProcessor extends StatefulProcessor[Long, Purchase, Running] {
    @transient private var st: ValueState[Agg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Agg]("agg", Encoders.product[Agg],
        TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Purchase],
        tv: TimerValues): Iterator[Running] = {
      val sorted = rows.toSeq.sortBy(p => (p.us, p.event_id))
      var cur = if (st.exists()) st.get() else Agg(0L, 0L)
      val out = sorted.map { p =>
        cur = Agg(cur.seq + 1, cur.cum + p.cents)
        Running(user, cur.seq, p.event_id, cur.cum)
      }
      st.update(cur)
      out.iterator
    }
  }

  /** One emitted trail row: the ≤k purchases BEFORE this one. */
  final case class TrailRow(user_id: Long, event_id: Long,
      n_prior: Long, trail: String)

  /** ListState sibling of [[SpendProcessor]]: per user, keep the last
    * `k` purchase event ids (a bounded FIFO — `ListState` is the right
    * handle because RocksDB appends are O(1) and the list never holds
    * the full history), and emit each purchase with its ≤k-item prior
    * trail — the "recent context" enrichment a recommender join keeps
    * hot. State per user is AT MOST k longs, whatever the history
    * length. Same within-batch (event time, event_id) sort contract as
    * SpendProcessor; the trail string is chronological oldest→newest. */
  class TrailProcessor(k: Int) extends
      StatefulProcessor[Long, Purchase, TrailRow] {
    @transient private var st: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getListState[Long]("trail", Encoders.scalaLong,
        TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Purchase],
        tv: TimerValues): Iterator[TrailRow] = {
      val sorted = rows.toSeq.sortBy(p => (p.us, p.event_id))
      var cur: Seq[Long] = st.get().toSeq
      val out = sorted.map { p =>
        val row = TrailRow(user, p.event_id, cur.length,
          cur.mkString(","))
        cur = (cur :+ p.event_id).takeRight(k)
        row
      }
      st.clear()
      st.put(cur.toArray)
      out.iterator
    }
  }

  /** One typed event, time in exact microseconds. */
  final case class Ev(user_id: Long, event_id: Long, us: Long,
      typ: String)

  /** One emitted per-type sequence row. */
  final case class TypeSeq(user_id: Long, event_id: Long,
      event_type: String, seq_in_type: Long)

  /** MapState member of the typed-state trio ([[SpendProcessor]] =
    * ValueState, [[TrailProcessor]] = ListState): per user, a
    * MapState[event_type → count] — state is |distinct types| entries
    * per key (bounded by the type vocabulary, never the history), and
    * each event is emitted with its 1-based sequence number WITHIN its
    * type. Same within-batch (event time, event_id) sort contract. */
  class TypeCountProcessor extends StatefulProcessor[Long, Ev, TypeSeq] {
    @transient private var st: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Ev],
        tv: TimerValues): Iterator[TypeSeq] = {
      val sorted = rows.toSeq.sortBy(e => (e.us, e.event_id))
      sorted.map { e =>
        val next = (if (st.containsKey(e.typ)) st.getValue(e.typ)
          else 0L) + 1L
        st.updateValue(e.typ, next)
        TypeSeq(user, e.event_id, e.typ, next)
      }.iterator
    }
  }

  /** The open-session accumulator for [[TimerSessionProcessor]].
    * `n == 0` marks "no open session" while PRESERVING the session
    * counter — a timer closure must not reset the per-user index, so
    * the state row survives the close with the window zeroed (one
    * ValueState instead of a separate counter state). */
  final case class OpenTs(idx: Long, n: Long, startUs: Long, endUs: Long)

  /** One emitted closed session; `closed_by` is "gap" (a later event
    * split the session inline) or "timer" (the event-time timer fired
    * once the watermark passed end + gap — the idle-user flush). */
  final case class SessOut(user_id: Long, session_idx: Long,
      n_events: Long, start_us: Long, end_us: Long, closed_by: String)

  /** TIMER-driven sessionization — the `transformWithState` sibling of
    * [[StatefulSessions.sessionsWithTimeout]] and the remaining surface
    * of the new API after the typed-state trio: `TimeMode.EventTime()`,
    * `registerTimer`/`deleteTimer`/`listTimers`, and
    * `handleExpiredTimer`. Gap splits emit inline ("gap"); the trailing
    * open session is flushed by an event-time timer at
    * (end + gap) ms + 1 once the watermark passes it ("timer") — idle
    * users do not hold state forever, which is what makes per-key state
    * bounded on a 100 TB stream. Exactly ONE live timer per user: the
    * stale timer is deleted on every input batch before the fresh one
    * is registered (leaked timers would fire spurious expiry callbacks).
    * Same within-batch (event time, event_id) sort contract as the rest
    * of the trio. Session split convention: a gap STRICTLY GREATER than
    * `gapSeconds` opens a new session. */
  class TimerSessionProcessor(gapSeconds: Long)
      extends StatefulProcessor[Long, Ev, SessOut] {
    private val gapUs = gapSeconds * 1000000L
    @transient private var open: ValueState[OpenTs] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenTs]("open",
        Encoders.product[OpenTs], TTLConfig.NONE)

    private def timerMs(endUs: Long): Long = (endUs + gapUs) / 1000L + 1L

    override def handleInputRows(user: Long, rows: Iterator[Ev],
        tv: TimerValues): Iterator[SessOut] = {
      val sorted = rows.toSeq.sortBy(e => (e.us, e.event_id))
      val out = scala.collection.mutable.ArrayBuffer.empty[SessOut]
      var cur = if (open.exists()) open.get() else OpenTs(0L, 0L, 0L, 0L)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      sorted.foreach { e =>
        if (cur.n == 0L)
          cur = OpenTs(cur.idx + 1, 1L, e.us, e.us)
        else if (e.us - cur.endUs > gapUs) {
          out += SessOut(user, cur.idx, cur.n, cur.startUs, cur.endUs,
            "gap")
          cur = OpenTs(cur.idx + 1, 1L, e.us, e.us)
        } else
          cur = OpenTs(cur.idx, cur.n + 1, cur.startUs,
            math.max(cur.endUs, e.us))
      }
      open.update(cur)
      if (cur.n > 0L) getHandle.registerTimer(timerMs(cur.endUs))
      out.iterator
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[SessOut] = {
      if (!open.exists()) Iterator.empty
      else {
        val cur = open.get()
        if (cur.n == 0L) Iterator.empty
        else {
          // zero the window, KEEP the counter (see OpenTs scaladoc)
          open.update(OpenTs(cur.idx, 0L, 0L, 0L))
          Iterator(SessOut(user, cur.idx, cur.n, cur.startUs, cur.endUs,
            "timer"))
        }
      }
    }
  }

  /** Run timer sessionization over the events fixture with AvailableNow
    * (watermark delay 0) and return the (batch) result. Emission under
    * AvailableNow is deterministic: all gap splits emit inline, and the
    * trailing no-data micro-batch fires every timer whose expiry ≤ the
    * final watermark (⌊max event us / 1000⌋ ms) — sessions still open
    * against that watermark stay in state, exactly like production. */
  def timerSessions(spark: SparkSession, dir: String,
      gapSeconds: Long): DataFrame = {
    import spark.implicits._
    val ev = Streams.eventsStream(spark, dir)
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type").as("typ"))
      .as[Ev]
    val out = ev.groupByKey(_.user_id)
      .transformWithState(new TimerSessionProcessor(gapSeconds),
        TimeMode.EventTime(), OutputMode.Append(),
        Encoders.product[SessOut])
    withRocksDb(spark) { Streams.runToFiles(spark, out.toDF()) }
  }

  /** Run the per-type sequence enrichment over ALL events with
    * AvailableNow and return the (batch) result. */
  def typeCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Streams.eventsStream(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type").as("typ"))
      .as[Ev]
    val out = ev.groupByKey(_.user_id)
      .transformWithState(new TypeCountProcessor, TimeMode.None(),
        OutputMode.Append(), Encoders.product[TypeSeq])
    withRocksDb(spark) { Streams.runToFiles(spark, out.toDF()) }
  }

  /** Run the last-k trail enrichment over the events table with
    * AvailableNow and return the (batch) result. */
  def lastKTrail(spark: SparkSession, dir: String, k: Int): DataFrame = {
    import spark.implicits._
    val ev = Streams.eventsStream(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        coalesce(round(col("value") * 100).cast("long"), lit(0L))
          .as("cents"))
      .as[Purchase]
    val out = ev.groupByKey(_.user_id)
      .transformWithState(new TrailProcessor(k), TimeMode.None(),
        OutputMode.Append(), Encoders.product[TrailRow])
    withRocksDb(spark) { Streams.runToFiles(spark, out.toDF()) }
  }

  /** transformWithState requires the RocksDB state store provider —
    * set it for THIS query's checkpoint lifetime, restore after (other
    * graft streams keep the default provider). */
  private[streaming] def withRocksDb[A](spark: SparkSession)(f: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try f
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  /** Run the running-spend enrichment over the events table with
    * AvailableNow and return the (batch) result. */
  def runningSpend(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Streams.eventsStream(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        coalesce(round(col("value") * 100).cast("long"), lit(0L))
          .as("cents"))
      .as[Purchase]
    val out = ev.groupByKey(_.user_id)
      .transformWithState(new SpendProcessor, TimeMode.None(),
        OutputMode.Append(), Encoders.product[Running])
    withRocksDb(spark) { Streams.runToFiles(spark, out.toDF()) }
  }
}
