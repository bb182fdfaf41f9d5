package graft.streaming

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
    * reader, ns→µs conversion identical to Tables.events). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val batchSchema = spark.read.parquet(path).schema
    // file stream sources want a directory; select the one table file via
    // a glob filter over the sf dir
    val raw = spark.readStream.schema(batchSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    if (batchSchema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
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
    * end <= max(ts) - delay — batch-reproducible for the oracle. */
  def tumblingAggAppend(spark: SparkSession, dir: String, width: String,
      delay: String): DataFrame = {
    val agg = eventsStream(spark, dir)
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"))
    runToMemory(spark, agg, org.apache.spark.sql.streaming.OutputMode.Append())
  }

  /** Stream-stream inner join with event-time bounds: purchases matched
    * to same-user signups within `lookback` before the purchase.
    * Watermarks bound the join state (inner-join emission itself is
    * complete for AvailableNow over finite input, so the result equals
    * the batch conditional join — oracle-checkable). */
  def streamStreamJoin(spark: SparkSession, dir: String,
      lookback: String): DataFrame = {
    val ev = eventsStream(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      .withWatermark("p_ts", "1 hour")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"),
        col("event_id").as("s_id"))
      .withWatermark("s_ts", "1 hour")
    val joined = purchases.join(signups,
      col("user_id") === col("s_user") &&
        col("s_ts") <= col("p_ts") &&
        col("s_ts") >= col("p_ts") - expr(s"INTERVAL $lookback"))
      .select(col("p_id"), col("s_id"))
    val name = s"graft_stream_${counter.incrementAndGet()}"
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
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

  /** Streaming dedup mirror of O4/O8 (dropDuplicates on the id within the
    * stream), counted per type. */
  def streamingDedupCounts(spark: SparkSession, dir: String): DataFrame = {
    val dd = eventsStream(spark, dir)
      .dropDuplicates("event_id")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    runToMemory(spark, dd)
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
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = df.writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name)
  }
}
