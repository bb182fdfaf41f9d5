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

  test("closedSessionsOf: a cross-batch out-of-order event within the " +
      "gap merges (no spurious split, start/end/n reflect the merge)") {
    val input = MemoryStream[Ev](spark)
    val q = StatefulSessions.closedSessionsOf(input.toDS(), 3600L)
      .writeStream.format("memory").queryName("sess_disorder")
      .outputMode(OutputMode.Append).start()
    val B = 1600000000L * 1000000L
    try {
      // batch 1: open session [B, B+1h] (boundary gap stays in-session)
      input.addData(Ev(1L, 1L, B), Ev(1L, 4L, B + Hour))
      q.processAllAvailable()
      // batch 2: two DISORDERED events — one older than the open end but
      // inside it, one older than the start by half a gap. Both must
      // merge; the regression this guards: overwriting endUs back to
      // B+30min would make batch 3's event (70min later than the TRUE
      // end) fire the gap test and split one real session in two.
      input.addData(Ev(1L, 3L, B + Hour / 2), Ev(1L, 2L, B - Hour / 2))
      q.processAllAvailable()
      // batch 3: 1h after the true end (B+1h) — same session iff endUs
      // was not regressed by batch 2
      input.addData(Ev(1L, 5L, B + 2 * Hour))
      q.processAllAvailable()
      assert(spark.table("sess_disorder").isEmpty,
        "nothing may close while the session keeps extending")
      // a far-future event closes it
      input.addData(Ev(1L, 6L, B + 10 * Hour))
      q.processAllAvailable()
      val out = spark.table("sess_disorder").as[Sess].collect().toSeq
      assert(out == Seq(Sess(1L, 1L, 5L, B - Hour / 2, B + 2 * Hour)),
        s"one merged 5-event session expected, got $out")
    } finally q.stop()
  }

  test("closedSessionsOf: an event more than gap older than the open " +
      "session's start is dropped as late data (not merged backward)") {
    val input = MemoryStream[Ev](spark)
    val q = StatefulSessions.closedSessionsOf(input.toDS(), 3600L)
      .writeStream.format("memory").queryName("sess_late")
      .outputMode(OutputMode.Append).start()
    val B = 1600000000L * 1000000L
    try {
      input.addData(Ev(1L, 1L, B), Ev(1L, 2L, B + Hour / 2))
      q.processAllAvailable()
      // 2h older than the open session's start: beyond the gap — a batch
      // run would give it its own earlier session, which this stream
      // cannot emit retroactively; it must be dropped, not merged
      input.addData(Ev(1L, 9L, B - 2 * Hour))
      q.processAllAvailable()
      input.addData(Ev(1L, 3L, B + 10 * Hour))
      q.processAllAvailable()
      val out = spark.table("sess_late").as[Sess].collect().toSeq
      assert(out == Seq(Sess(1L, 1L, 2L, B, B + Hour / 2)),
        s"late event must not stretch the session backward: $out")
    } finally q.stop()
  }

  test("closedSessionsOf over a multi-file stream (maxFilesPerTrigger=1, " +
      "files out of time order within the gap) matches batch Sessionize") {
    import org.apache.spark.sql.functions._
    val gap = 1800L
    val gapUs = gap * 1000000L
    val B = 1600000000L * 1000000L
    // user 1: session A = {0, 10m, 20m} split across files so the middle
    // event arrives in a LATER micro-batch; session B = {3h, 3h10m};
    // session C = {9h} stays open (not emitted). user 2: one closed
    // session {5m, 25m} + open {8h}. Disorder is within-gap only — the
    // regime the state machine handles losslessly.
    val fileA = Seq((1L, 10L, B), (1L, 12L, B + 20 * 60000000L),
      (2L, 20L, B + 5 * 60000000L))
    val fileB = Seq((1L, 11L, B + 10 * 60000000L),
      (2L, 21L, B + 25 * 60000000L), (1L, 13L, B + 3 * Hour))
    val fileC = Seq((1L, 14L, B + 3 * Hour + 10 * 60000000L),
      (2L, 22L, B + 8 * Hour), (1L, 15L, B + 9 * Hour))
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "sess_multi_")
    def writeFile(rows: Seq[(Long, Long, Long)], name: String,
        mtime: Long): Unit = {
      val staging = s"$base/_staging_$name"
      rows.toDF("user_id", "event_id", "us")
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).get
      val dest = java.nio.file.Paths.get(s"$base/in/$name.parquet")
      java.nio.file.Files.createDirectories(dest.getParent)
      java.nio.file.Files.move(part.toPath, dest)
      // FileStreamSource orders new files by modification time — pin
      // strictly increasing mtimes so micro-batch order is deterministic
      dest.toFile.setLastModified(mtime)
    }
    val t0 = System.currentTimeMillis() - 600000L
    writeFile(fileA, "a", t0)
    writeFile(fileB, "b", t0 + 60000L)
    writeFile(fileC, "c", t0 + 120000L)
    val schema = spark.read.parquet(s"$base/in").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/in")
      .as[Ev]
    val q = StatefulSessions.closedSessionsOf(stream, gap)
      .writeStream.format("memory").queryName("sess_multi")
      .outputMode(OutputMode.Append).start()
    try q.processAllAvailable() finally q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) == 3,
      "each file must arrive in its own micro-batch")
    val streamed = spark.table("sess_multi").as[Sess].collect()
      .map(s => (s.user_id, s.session_idx, s.n_events, s.start_us, s.end_us))
      .toSet
    val batch = graft.ops.Sessionize
      .sessions((fileA ++ fileB ++ fileC).toDF("user_id", "event_id", "us")
          .select(col("user_id"), col("event_id"),
            timestamp_micros(col("us")).as("ts")),
        "user_id", "ts", "event_id", gap)
      .select(col("user_id"), col("session_idx"), col("n_events"),
        unix_micros(col("sess_start")).as("start_us"),
        unix_micros(col("sess_end")).as("end_us"))
      .as[(Long, Long, Long, Long, Long)].collect()
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
