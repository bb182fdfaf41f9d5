package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkTestBase
import graft.util.Tables

/** Stream-static join (enriching a stream with a dimension — the shape a
  * live video-stats stream joining channel metadata would take) and
  * partitioned-layout pruning (SCALE.md scan layer).
  */
class StreamStaticSpec extends SparkTestBase {

  test("stream-static join enriches the stream; counts match batch join") {
    val staticDim = Tables.events(spark, sf())
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("user_total_events"))
    val joined = Streams.eventsStream(spark, sf())
      .join(staticDim, Seq("user_id"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("user_total_events")).as("w"))
    val name = "stream_static_out"
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val batch = Tables.events(spark, sf())
      .join(staticDim, Seq("user_id"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("user_total_events")).as("w"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val stream = spark.table(name)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stream == batch)
  }

  test("partitioned layout prunes: only the selected partition is scanned") {
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "part_").toString
    Tables.events(spark, sf())
      .write.partitionBy("event_type").parquet(s"$base/events_parted")
    val pruned = spark.read.parquet(s"$base/events_parted")
      .filter(col("event_type") === "purchase")
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") &&
      p.contains("event_type") && p.contains("purchase"),
      s"partition filter must prune the scan; plan:\n${p.take(800)}")
    val expected = Tables.events(spark, sf())
      .filter(col("event_type") === "purchase").count()
    assert(pruned.count() == expected)
  }
}
