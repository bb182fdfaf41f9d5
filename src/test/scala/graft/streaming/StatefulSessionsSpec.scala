package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.streaming.StatefulSessions.{Ev, Sess}

/** Semantics of the custom-state sessionizer: closed-only emission and
  * gap-boundary behavior (the oracle-checked q71 path), state carrying
  * across micro-batches, and the event-time-timeout flush variant the
  * oracle can't see. */
class StatefulSessionsSpec extends SparkTestBase {
  import spark.implicits._

  private val Hour = 3600L * 1000000L

  test("closedSessions: emits exactly the batch sessions minus each " +
      "user's open last session; boundary gap (== gap) stays in-session") {
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "sess_src_")
    // user 1: s1 = {0, +1h (boundary, stays)}, gap > 1h, s2 = {3h} (open,
    // not emitted); user 2: one session only (open, nothing emitted)
    val rows = Seq(
      (1L, 10L, 0L), (1L, 11L, Hour), (1L, 12L, 3 * Hour),
      (2L, 20L, 0L))
    // eventsStream expects the sf-dir layout: a single FILE named
    // events.parquet (pathGlobFilter matches leaf file names) — write to
    // a staging dir and move the one part file into place
    val staging = s"$base/_staging"
    rows.toDF("user_id", "event_id", "us")
      .selectExpr("event_id", "timestamp_micros(us) AS ts", "user_id",
        "'e' AS event_type", "1.0 AS value", "'{}' AS props")
      .coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$base/events.parquet"))
    val out = StatefulSessions.closedSessions(spark, base.toString, 3600L)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("user_id") == 1L &&
      r.getAs[Long]("session_idx") == 1L &&
      r.getAs[Long]("n_events") == 2L,
      s"expected user 1's closed 2-event first session, got ${r}")
  }

  test("closedSessions == batch Sessionize minus each user's last " +
      "session, on a random event stream (fixed seed)") {
    val rnd = new scala.util.Random(7L)
    val B = 1600000000L * 1000000L
    val rows = (0 until 400).map { i =>
      (rnd.nextInt(5).toLong + 1L, i.toLong,
        B + rnd.nextInt(200000) * 1000000L)
    }
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "sess_rand_")
    val staging = s"$base/_staging"
    rows.toDF("user_id", "event_id", "us")
      .selectExpr("event_id", "timestamp_micros(us) AS ts", "user_id",
        "'e' AS event_type", "1.0 AS value", "'{}' AS props")
      .coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$base/events.parquet"))

    val gap = 1800L
    val streamed = StatefulSessions
      .closedSessions(spark, base.toString, gap)
      .select("user_id", "session_idx", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    val batch = graft.ops.Sessionize
      .sessions(graft.util.Tables.events(spark, base.toString),
        "user_id", "ts", "event_id", gap)
      .select("user_id", "session_idx", "n_events")
      .as[(Long, Long, Long)].collect()
    val lastIdx = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val expected = batch.filter(s => s._2 < lastIdx(s._1)).toSet
    assert(streamed == expected,
      s"diff: ${(streamed diff expected) ++ (expected diff streamed)}")
  }

  test("sessionsWithTimeout: state carries across batches, and the " +
      "watermark flushes idle open sessions") {
    val input = MemoryStream[Ev](spark)
    val q = StatefulSessions.sessionsWithTimeout(input.toDS(), 3600L)
      .writeStream.format("memory").queryName("sess_timeout")
      .outputMode(OutputMode.Append).start()
    // events must sit ABOVE the initial (epoch-0) watermark or the
    // stateful operator drops them as late — use a 2020-ish base
    val B = 1600000000L * 1000000L
    try {
      // batch 1: two events within the gap → one open session, no output
      input.addData(Ev(1L, 1L, B), Ev(1L, 2L, B + Hour / 2))
      q.processAllAvailable()
      assert(spark.table("sess_timeout").isEmpty)
      // batch 2: an event far past the gap closes session 1 inline; the
      // new open session it starts is current state, so only s1 emits
      input.addData(Ev(1L, 3L, B + 10 * Hour))
      q.processAllAvailable()
      val afterClose = spark.table("sess_timeout").as[Sess].collect()
      assert(afterClose.map(s => (s.session_idx, s.n_events)).toSeq ==
        Seq((1L, 2L)), s"gap must close session 1: ${afterClose.toSeq}")
      // batch 3 raises the max event time to 20h; the watermark only
      // ADOPTS that after the batch completes, so a further batch 4 is
      // what evaluates timeouts against wm = 20h — flushing user 1's
      // open session (timeout ≈ 11h < 20h)
      input.addData(Ev(2L, 9L, B + 20 * Hour))
      q.processAllAvailable()
      input.addData(Ev(3L, 99L, B + 30 * Hour))
      q.processAllAvailable()
      val flushed = spark.table("sess_timeout").as[Sess].collect()
        .filter(_.user_id == 1L).map(s => (s.session_idx, s.n_events))
      assert(flushed.toSet == Set((1L, 2L), (2L, 1L)),
        s"open session must flush on event-time timeout: ${flushed.toSeq}")
    } finally q.stop()
  }
}
