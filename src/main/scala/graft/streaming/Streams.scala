package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming surface (SURVEY.md §2.10). The reference's whole
  * pipeline is a daily incremental micro-batch
  * (/root/reference/.github/workflows/daily_etl.yml:5-6 cron + sink-state
  * anti-join); `Trigger.AvailableNow` is the exact Spark analog: process
  * everything new, then stop — state lives in the checkpoint/sink.
  *
  * For the oracle-checkable queries we run the stream to a named memory
  * sink synchronously; in production the same plans write to a durable
  * sink with a checkpoint dir.
  */
object Streams {

  private val counter = new AtomicLong(0)

  /** Read the events table as a file stream (schema pinned from the batch
    * reader; ts normalization identical to Tables.events — ns-as-long →
    * µs, and naive timestamp[us] (TIMESTAMP_NTZ, which watermarks
    * reject) → session-tz TimestampType under the pinned-UTC session). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val batchSchema = spark.read.parquet(path).schema
    // file stream sources want a directory. The driver testdata ships
    // events.parquet as a single FILE (select it with a glob over the
    // sf dir); Spark-written tables (e.g. the ScaleProbe synth) are a
    // DIRECTORY of part files — stream that directory itself, or the
    // glob would match nothing and the stream would be silently empty.
    val raw =
      if (new java.io.File(path).isDirectory)
        spark.readStream.schema(batchSchema).parquet(path)
      else
        spark.readStream.schema(batchSchema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
    batchSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Tumbling event-time window aggregation, executed incrementally with
    * AvailableNow and returned as a batch DataFrame (memory sink,
    * complete mode). */
  def tumblingAgg(spark: SparkSession, dir: String, width: String): DataFrame = {
    val agg = eventsStream(spark, dir)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))
    runToMemory(spark, agg)
  }

  /** Watermarked tumbling aggregation in APPEND mode: only windows the
    * watermark has closed are emitted (late-data policy surface). With
    * AvailableNow the final no-data micro-batch advances the watermark to
    * max(ts) - delay, so the emitted set is exactly the windows with
    * end <= max(ts) - delay — batch-reproducible for the oracle.
    * Append mode → durable file sink (the scale-safe path). */
  def tumblingAggAppend(spark: SparkSession, dir: String, width: String,
      delay: String): DataFrame = {
    val agg = eventsStream(spark, dir)
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"))
    runToFiles(spark, agg)
  }

  /** Stream-stream inner join with event-time bounds: purchases matched
    * to same-user signups within `lookback` before the purchase.
    * Watermarks bound the join state (inner-join emission itself is
    * complete for AvailableNow over finite input, so the result equals
    * the batch conditional join — oracle-checkable).
    *
    * The joined append stream is UNBOUNDED in the input size, so it goes
    * to a durable parquet file sink (executors write their own partitions;
    * nothing is materialized on the driver) and is read back as a batch
    * relation. A memory sink here would collect every joined pair into
    * driver memory — a driver OOM at scale. */
  /** The shared purchases⋈signups event-time join shape behind all
    * three stream-stream join queries (inner / left_outer /
    * full_outer): 1-hour watermarks on both sides plus the
    * [p_ts − lookback, p_ts] range condition that lets Spark bound
    * BOTH state stores. Package-private so StreamsSpec can drive the
    * identical shape from a MemoryStream and MEASURE the eviction
    * (peak `stateOperators.numRowsTotal` across micro-batches) instead
    * of arguing it from watermark semantics. */
  private[streaming] def purchaseSignupJoin(ev: DataFrame,
      lookback: String, joinType: String): DataFrame = {
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
      .withWatermark("p_ts", "1 hour")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"),
        col("event_id").as("s_id"))
      .withWatermark("s_ts", "1 hour")
    val joined = purchases.join(signups,
      col("user_id") === col("s_user") &&
        col("s_ts") <= col("p_ts") &&
        col("s_ts") >= col("p_ts") - expr(s"INTERVAL $lookback"),
      joinType)
    // a semi join carries only the left side's columns
    if (joinType == "left_semi") joined.select(col("p_id"))
    else joined.select(col("p_id"), col("s_id"))
  }

  def streamStreamJoin(spark: SparkSession, dir: String,
      lookback: String): DataFrame =
    runToFiles(spark,
      purchaseSignupJoin(eventsStream(spark, dir), lookback, "inner"))

  /** LEFT OUTER stream-stream join: every purchase, matched signups
    * when they exist inside the event-time bound, NULL-padded
    * otherwise — the streaming capability [[streamStreamJoin]]'s inner
    * form can't give (an unmatched row can only be EMITTED once the
    * watermark proves no match can still arrive, so the null rows are
    * the watermark machinery made visible). State on both sides is
    * bounded by the same watermark + time-range condition as the inner
    * join. The result is NOT the plain batch left join: an unmatched
    * purchase emits its null row only once the FINAL watermark
    * (min(max p_ts, max s_ts) − delay) passes it, so purchases near
    * the end of input never get their no-match proof and stay absent.
    * The q272 oracle encodes exactly that watermark gate. */
  def streamStreamLeftJoin(spark: SparkSession, dir: String,
      lookback: String): DataFrame =
    runToFiles(spark,
      purchaseSignupJoin(eventsStream(spark, dir), lookback,
        "left_outer"))

  /** FULL OUTER stream-stream join — both no-match proofs at once:
    * unmatched purchases null-pad on the signup side exactly as in
    * [[streamStreamLeftJoin]] (emitted once the watermark passes p_ts,
    * since a matching signup must have s_ts ≤ p_ts), and unmatched
    * SIGNUPS null-pad on the purchase side with the LONGER wait their
    * condition implies: a matching purchase may arrive with
    * p_ts ≤ s_ts + lookback, so the signup's null row emits only once
    * the final watermark passes s_ts + lookback. The q319 oracle
    * encodes both gates; state on each side is bounded by the same
    * watermark + range condition as the inner join. */
  def streamStreamFullJoin(spark: SparkSession, dir: String,
      lookback: String): DataFrame =
    runToFiles(spark,
      purchaseSignupJoin(eventsStream(spark, dir), lookback,
        "full_outer"))

  /** LEFT SEMI stream-stream join — the last join type in the matrix
    * (inner q62 / left-outer q272 / full-outer q319): each purchase
    * that has AT LEAST ONE signup inside the event-time bound emits
    * exactly once, with no signup columns. Unlike the outer forms,
    * emission needs no no-match proof — a row emits the moment its
    * first match lands — so over finite AvailableNow input the result
    * equals the batch EXISTS predicate, while state on both sides
    * stays watermark-bounded exactly as in the inner join (a matched
    * left row is marked, not re-emitted, on later matches). */
  def streamStreamSemiJoin(spark: SparkSession, dir: String,
      lookback: String): DataFrame =
    runToFiles(spark,
      purchaseSignupJoin(eventsStream(spark, dir), lookback,
        "left_semi"))

  /** Stream-static join: the event stream enriched against a static
    * dimension (here customer segments), then windowed per segment. The
    * static side is a plain batch DataFrame — Spark re-plans it per
    * micro-batch and, broadcast, it never shuffles the stream; the
    * stream side keeps its event-time semantics (this is the standard
    * "enrich facts against a dimension" streaming topology, state-free
    * on the join itself). */
  def streamStaticAgg(spark: SparkSession, dir: String, dim: DataFrame,
      dimKey: String, streamKey: String, tagCol: String,
      width: String): DataFrame = {
    val enriched = eventsStream(spark, dir)
      .join(broadcast(dim.select(col(dimKey), col(tagCol))),
        col(streamKey) === col(dimKey))
    val agg = enriched
      .groupBy(window(col("ts"), width), col(tagCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col(tagCol), col("n"))
    runToMemory(spark, agg)
  }

  /** Sliding window variant (windows overlap; rows multiply by
    * width/slide). */
  def slidingAgg(spark: SparkSession, dir: String, width: String,
      slide: String): DataFrame = {
    val agg = eventsStream(spark, dir)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))
    runToMemory(spark, agg)
  }

  /** Windowed EXACT distinct counting in ONE stateful aggregation — the
    * streaming form of [[graft.ops.Bitmaps]]: per-(window, type) state is
    * a FIXED set of 64-bit words (`domainWords` = ⌈id domain / 64⌉) that
    * `bit_or` merges incrementally across micro-batches. The usual
    * streaming-exact-distinct alternative, dropDuplicates + count, keys
    * state by (window, type, id) — state grows with distinct IDS seen;
    * here state is CONSTANT per group (domainWords longs), the property
    * that keeps a 100 TB windowed-uniques job's state store flat. Exact,
    * unlike approx_count_distinct, and append-safe under retries because
    * bit_or is idempotent. Requires ids in [0, 64·domainWords) — and
    * ENFORCES it: an out-of-domain id matches no CASE arm, so without a
    * guard the "exact" count would silently undercount the moment the
    * id domain outgrows the configured words. An overflow counter rides
    * the same agg (one extra long of state per group) and the
    * projection raises if it is ever nonzero — fail fast, never a wrong
    * exact count.
    *
    * Runs in complete mode to the memory sink like the other bounded-
    * cardinality aggs; the popcount projection happens AFTER the
    * stateful agg (state holds words, the sink sees counts). */
  def streamingBitmapDistinct(spark: SparkSession, dir: String,
      width: String, idCol: String, domainWords: Int): DataFrame = {
    val wordAggs = (0 until domainWords).map { w =>
      expr(s"bit_or(CASE WHEN $idCol div 64 = $w THEN " +
        s"shiftleft(1L, CAST($idCol % 64 AS INT)) ELSE 0L END)").as(s"_w$w")
    }
    val overflow = expr(s"sum(CASE WHEN $idCol < 0 OR " +
      s"$idCol div 64 >= $domainWords THEN 1 ELSE 0 END)").as("_ovf")
    val n = (0 until domainWords)
      .map(w => bit_count(col(s"_w$w"))).reduce(_ + _)
    // the guard is folded INTO n_distinct (adds 0 when clean) so column
    // pruning can never drop it
    val guarded = n.cast("long") + when(col("_ovf") > 0,
      raise_error(concat(lit("streamingBitmapDistinct: "),
        col("_ovf").cast("string"),
        lit(s" ids outside [0, ${64L * domainWords}) — raise domainWords"))))
      .otherwise(lit(0L))
    val agg = eventsStream(spark, dir)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(wordAggs.head, (wordAggs.tail :+ overflow): _*)
      .select(col("window.start").as("window_start"), col("event_type"),
        guarded.as("n_distinct"))
    runToMemory(spark, agg)
  }

  /** Windowed APPROXIMATE distinct counting with FIXED state and no
    * domain bound — the HLL complement to [[streamingBitmapDistinct]]:
    * the bitmap is exact but requires ids in [0, 64·domainWords); the
    * md5-derived HLL registers ([[graft.ops.Sketches.hllAggState]])
    * hold 2^p ints per (window, type) group for ANY id domain, with
    * σ ≈ 1.04/√2^p error. `max` is idempotent → append-safe under
    * micro-batch retries, exactly like `bit_or`. The estimate
    * projection runs after the stateful agg; state never holds floats.
    * Unlike approx_count_distinct's opaque HLL++ buffer, the register
    * state is engine-portable — the DuckDB oracle recomputes it
    * cell-for-cell. */
  def streamingHllDistinct(spark: SparkSession, dir: String,
      width: String, idCol: String, p: Int): DataFrame = {
    val (aggs, est) = graft.ops.Sketches.hllAggState(idCol, p)
    val agg = eventsStream(spark, dir)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window.start").as("window_start"), col("event_type"),
        est.as("n_est"))
    runToMemory(spark, agg)
  }

  /** Streaming dedup mirror of O4/O8 (dropDuplicates on the id within the
    * stream), counted per type. */
  def streamingDedupCounts(spark: SparkSession, dir: String): DataFrame = {
    val dd = eventsStream(spark, dir)
      .dropDuplicates("event_id")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    runToMemory(spark, dd)
  }

  /** Watermark-BOUNDED streaming dedup: `dropDuplicatesWithinWatermark`
    * keys dedup state by id like [[streamingDedupCounts]], but the
    * watermark EVICTS entries once they age past `delay` — state is
    * proportional to the ids seen within the watermark horizon, not to
    * all ids ever seen. This is the only dedup shape that survives an
    * unbounded 100 TB stream (plain dropDuplicates state grows without
    * bound); the trade is the documented contract that duplicates
    * arriving more than `delay` apart are NOT collapsed. Counted per
    * type; over the finite fixture every duplicate falls inside the
    * horizon, so the result equals batch DISTINCT — the oracle. */
  def streamingDedupCountsWithinWatermark(spark: SparkSession,
      dir: String, delay: String): DataFrame = {
    val dd = eventsStream(spark, dir)
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    runToMemory(spark, dd)
  }

  /** State-store partition count for these local AvailableNow runs —
    * overridable via `spark.graft.stream.partitions` (a cluster job sizes
    * this to key cardinality / executor count instead). Local default 2:
    * state-store checkpoint I/O scales with partitions, not data — the
    * r6 sweep (8 → 4) cut every streaming query 30-40%, and the r14
    * sweep (4 → 2, nine streaming queries, fresh-JVM best-of-2 at
    * sf0.1) a further 12% (17.0 → 15.0 s; biggest movers
    * q408 2.0→1.5 s, q148 3.0→2.3 s), zero result change. */
  private def streamPartitions(spark: SparkSession): String =
    spark.conf.get("spark.graft.stream.partitions", "2")

  /** Streaming order-invariant ingest fingerprint: per key, the running
    * row count and Σ hash60(id) mod 2⁶⁰ — the streaming twin of
    * [[graft.ops.CorpusAudit.corpusFingerprint]]. Because the sum is
    * commutative and associative, the state is ONE decimal per key, any
    * micro-batch slicing/retry ordering yields the same value, and at
    * the end of an ingest the streamed fingerprint must equal the batch
    * fingerprint of the same data — the cheap stream/batch parity check
    * a pipeline runs instead of diffing terabytes. */
  def streamingFingerprint(spark: SparkSession, dir: String,
      keyCol: String, idCol: String): DataFrame = {
    val agg = eventsStream(spark, dir)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_rows"),
        (sum(graft.ops.TextOps.hash60(col(idCol).cast("string"))
          .cast("decimal(38,0)")) % lit(1152921504606846976L))
          .cast("long").as("fingerprint"))
    runToMemory(spark, agg)
  }

  private def runToMemory(spark: SparkSession, df: DataFrame,
      mode: org.apache.spark.sql.streaming.OutputMode =
        org.apache.spark.sql.streaming.OutputMode.Complete()): DataFrame = {
    val name = s"graft_stream_${counter.incrementAndGet()}"
    // state-store overhead (checkpoint file I/O per partition per batch)
    // scales with shuffle partitions, not data; bound it for these
    // bounded-cardinality aggregations. The partition count is baked into
    // each query's fresh checkpoint, so this is safe per-query.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", streamPartitions(spark))
    try {
      val q = df.writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      recordStateRows(spark, q)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name)
  }

  /** Exports the finished query's PEAK state-store row count
    * (max of `stateOperators.numRowsTotal` across its micro-batch
    * progress events) to `spark.graft.stream.lastMaxStateRows` — the
    * measured form of every watermark-eviction claim. StreamsSpec
    * asserts boundedness against the event-time horizon's row budget;
    * a deployment alerts on the same number instead of trusting the
    * semantics argument. 100 TB posture: pair this with the RocksDB
    * state store (`spark.sql.streaming.stateStore.providerClass` =
    * RocksDBStateStoreProvider) so per-executor state is disk-backed
    * and bounded-memory; the HDFS-backed default keeps state on-heap,
    * which is fine for watermark-bounded joins at these scales but not
    * for billion-key session state. */
  private[streaming] def recordStateRows(spark: SparkSession,
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val rows = q.recentProgress.flatMap(_.stateOperators)
      .map(_.numRowsTotal)
    spark.conf.set("spark.graft.stream.lastMaxStateRows",
      (if (rows.isEmpty) 0L else rows.max).toString)
  }

  /** Append-mode queries whose output is unbounded in the input size go
    * through a durable parquet FILE sink (+ checkpoint) and are read back
    * as a batch relation via the sink's `_spark_metadata` commit log —
    * executors write their own partitions, the driver never materializes
    * rows. This is the production path; the memory sink above is reserved
    * for complete-mode aggregations whose cardinality is bounded by the
    * group-by domain (file sinks cannot run complete mode). */
  private[streaming] def runToFiles(spark: SparkSession,
      df: DataFrame): DataFrame = {
    // Sink/checkpoint base: driver-local temp by default (right for
    // local[*]), overridable via `spark.graft.stream.sinkDir` with a
    // shared-filesystem path (HDFS/S3A/NFS) — on a real cluster every
    // executor writes its own partitions, so the base MUST be a path all
    // executors and the driver can reach; a driver-local temp dir is not.
    val base = spark.conf.getOption("spark.graft.stream.sinkDir") match {
      case Some(root) =>
        s"${root.stripSuffix("/")}/graft_stream_${counter.incrementAndGet()}"
      case None =>
        Files.createTempDirectory(
          s"graft_stream_${counter.incrementAndGet()}_").toString
    }
    // The default temp sink + checkpoint are per-invocation scratch: reap
    // them at JVM exit so repeated runs (best-of-2 bench, verify) don't
    // accumulate state-store files and parquet output in the temp dir. A
    // configured shared-FS sinkDir is operator-owned (and possibly a
    // non-local URI) — leave its lifecycle to the operator.
    if (spark.conf.getOption("spark.graft.stream.sinkDir").isEmpty)
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete()
        }
        rm(new java.io.File(base))
      }
    val out = s"$base/out"
    val ck = s"$base/checkpoint"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", streamPartitions(spark))
    try {
      val q = df.writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      recordStateRows(spark, q)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    // pin the schema so an empty result (zero emitted files) still reads
    spark.read.schema(df.schema).parquet(out)
  }
}
