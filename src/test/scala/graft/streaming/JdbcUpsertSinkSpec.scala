package graft.streaming

import java.nio.file.Files
import java.util.Properties

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sink.Jdbc

/** End-to-end streaming→JDBC upsert against embedded Derby: the stream
  * lands latest-per-key rows idempotently (replays and re-runs converge
  * instead of duplicating — the failure mode of the reference's blind
  * append, /root/reference/fetch_youtube_data.py:194). */
class JdbcUpsertSinkSpec extends SparkTestBase {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftupsert;create=true"
  private val props = new Properties()

  private def runStream(table: String): Unit = {
    val stream = Streams.eventsStream(spark, sf())
      .select(col("user_id"), col("event_id"), col("event_type"))
    val ck = Files.createTempDirectory("upsert_ck_").toString
    val q = JdbcUpsertSink.writeStream(stream, url, table, "event_id",
      props, ck).start()
    q.awaitTermination()
  }

  test("stream lands all rows keyed by event_id; re-run is idempotent") {
    val t = "ev_upsert"
    runStream(t)
    val n = Jdbc.read(spark, url, t, props).count()
    assert(n > 0)
    // distinct keys in the source == rows landed (upsert, not append)
    val srcKeys = spark.read.parquet(s"${sf()}/events.parquet")
      .select("event_id").distinct().count()
    assert(n == srcKeys)
    // fresh checkpoint → full replay of the same data → SAME table
    runStream(t)
    assert(Jdbc.read(spark, url, t, props).count() == n)
  }

  test("colliding keys are replaced, not duplicated (latest wins)") {
    val t = "ev_upsert2"
    // pre-seed the target with stale values for two keys that exist in
    // the stream, plus one key the stream never touches
    val stale = Seq((0L, -1L, "stale"), (1L, -1L, "stale"),
      (999999999L, -1L, "keep")).toDF("event_id", "user_id", "event_type")
    stale.write.mode("append").jdbc(url, t, props)
    runStream(t)
    // Derby maps StringType→CLOB, which rejects pushed-down string
    // equality — assert on collected values instead of remote filters
    val types = Jdbc.read(spark, url, t, props)
      .select("event_type").as[String].collect()
    // stream keys overwrote their stale rows; the untouched key survives
    assert(!types.contains("stale"))
    assert(types.count(_ == "keep") == 1)
    // and no key is duplicated
    val back = Jdbc.read(spark, url, t, props)
    assert(back.count() == back.select("event_id").distinct().count())
  }

  test("empty batch is a no-op (no stage table churn, no failure)") {
    val t = "ev_upsert3"
    JdbcUpsertSink.upsertBatch(
      Seq.empty[(Long, String)].toDF("event_id", "v"),
      url, t, "event_id", props, batchId = 0L)
    assert(!Jdbc.tableExists(spark, url, t, props))
  }
}
