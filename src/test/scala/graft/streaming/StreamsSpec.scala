package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.SparkTestBase

/** Streaming semantics beyond the oracle-checkable queries (SURVEY.md
  * §2.10): durable-checkpoint incremental processing (the reference's
  * daily-cron contract), custom state via flatMapGroupsWithState, and
  * watermarked dedup.
  */
class StreamsSpec extends SparkTestBase {
  import spark.implicits._

  test("AvailableNow + checkpoint: a second run processes ONLY new files") {
    val base = Files.createTempDirectory(
      Paths.get("/root/repo/target"), "stream_inc_").toString
    val srcDir = s"$base/src"; val sinkDir = s"$base/sink"
    val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(srcDir))

    val batch1 = graft.util.Tables.events(spark, sf())
      .filter(col("event_id") < 100)
    batch1.write.mode("append").parquet(srcDir)

    def runOnce(): Unit = {
      val q = spark.readStream.schema(batch1.schema).parquet(srcDir)
        .writeStream.format("parquet")
        .option("path", sinkDir).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    runOnce()
    assert(spark.read.parquet(sinkDir).count() == 100)

    // new data arrives between "daily" runs
    graft.util.Tables.events(spark, sf())
      .filter(col("event_id") >= 100 && col("event_id") < 150)
      .write.mode("append").parquet(srcDir)

    runOnce()
    val after = spark.read.parquet(sinkDir)
    assert(after.count() == 150, "second run must append only the new file")
    assert(after.select("event_id").distinct().count() == 150, "no dups")

    // third run with nothing new is a no-op — the :152-165 invariant,
    // state living in the checkpoint instead of an anti-join
    runOnce()
    assert(spark.read.parquet(sinkDir).count() == 150)
  }

  test("flatMapGroupsWithState: running per-key session counts") {
    val input = MemoryStream[(Long, Double)](spark)
    val counted = input.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)],
         state: GroupState[(Long, Double)]) =>
          val (n0, sum0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var sum = sum0
          rows.foreach { r => n += 1; sum += r._2 }
          state.update((n, sum))
          Iterator((user, n, sum))
      }
    val q = counted.toDF("user_id", "n", "total").writeStream
      .format("memory").queryName("fmgws_out")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData((1L, 10.0), (1L, 5.0), (2L, 1.0))
      q.processAllAvailable()
      val r1 = spark.table("fmgws_out").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(r1(1L) == ((2L, 15.0)) && r1(2L) == ((1L, 1.0)))

      input.addData((1L, 1.0))
      q.processAllAvailable()
      val r2 = spark.table("fmgws_out").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(r2(1L) == ((3L, 16.0)), "state must carry across batches")
    } finally q.stop()
  }

  test("spark.graft.stream.sinkDir: file-sink streams write under the " +
      "configured (cluster-shared) base dir instead of driver-local tmp") {
    val base = Files.createTempDirectory(
      Paths.get("/root/repo/target"), "stream_sinkdir_").toString
    spark.conf.set("spark.graft.stream.sinkDir", base)
    try {
      val out = Streams.tumblingAggAppend(spark, sf(), "1 hour", "1 hour")
      assert(out.count() > 0)
      val children = new java.io.File(base).listFiles()
      assert(children != null && children.exists(
        _.getName.startsWith("graft_stream_")),
        s"sink output must land under the configured base dir $base")
    } finally spark.conf.unset("spark.graft.stream.sinkDir")
  }

  test("streamingBitmapDistinct ≡ batch count(DISTINCT) per window/type " +
      "(exact uniques from constant-size word state)") {
    val got = Streams
      .streamingBitmapDistinct(spark, sf(), "1 hour", "user_id", 32)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = graft.util.Tables.events(spark, sf())
      .groupBy(org.apache.spark.sql.functions.window(
        org.apache.spark.sql.functions.col("ts"), "1 hour"),
        org.apache.spark.sql.functions.col("event_type"))
      .agg(org.apache.spark.sql.functions.countDistinct(
        org.apache.spark.sql.functions.col("user_id")).as("n"))
      .select(org.apache.spark.sql.functions.col("window.start"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("n"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want && got.nonEmpty)
  }

  test("streamingHllDistinct ≡ the same register aggregation run as a " +
      "batch query (shared hllAggState code path), and every window's " +
      "estimate lands within 4σ of the exact distinct") {
    import org.apache.spark.sql.functions.{col, window}
    val got = Streams
      .streamingHllDistinct(spark, sf(), "1 hour", "user_id", p = 6)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    val (aggs, est) = graft.ops.Sketches.hllAggState("user_id", 6)
    val want = graft.util.Tables.events(spark, sf())
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window.start"), col("event_type"), est.as("n_est"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(got == want && got.nonEmpty,
      "streaming registers must equal the batch computation exactly")
    val exact = graft.util.Tables.events(spark, sf())
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(org.apache.spark.sql.functions.countDistinct(col("user_id"))
        .as("n"))
      .select(col("window.start"), col("event_type"), col("n"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val sigma = 1.04 / math.sqrt(64)
    exact.foreach { case (k, n) =>
      assert(math.abs(got(k) - n) <= math.max(4 * sigma * n, 3.0),
        s"window $k: est ${got(k)} vs exact $n")
    }
  }

  test("streamingBitmapDistinct raises on an id outside the configured " +
      "domain instead of silently undercounting") {
    val base = Files.createTempDirectory(
      Paths.get("/root/repo/target"), "bm_ovf_")
    // eventsStream expects a single FILE named events.parquet — stage
    // and move, same as the sessionizer fixtures. domainWords = 1 →
    // domain [0, 64); user_id 64 is one past the end.
    val staging = s"$base/_staging"
    Seq((1L, 5L), (2L, 64L)).toDF("event_id", "user_id")
      .selectExpr("event_id",
        "timestamp_micros(event_id * 1000000) AS ts", "user_id",
        "'e' AS event_type", "1.0 AS value", "'{}' AS props")
      .coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).get
    Files.move(part.toPath, Paths.get(s"$base/events.parquet"))
    val e = intercept[Exception] {
      Streams.streamingBitmapDistinct(
        spark, base.toString, "1 hour", "user_id", 1).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ chain(x.getCause))
    assert(chain(e).exists(_.contains("ids outside [0, 64)")),
      s"expected the overflow guard to fire, got: ${chain(e).take(3)}")
  }

  test("dropDuplicatesWithinWatermark removes dups inside the watermark") {
    val input = MemoryStream[(String, Timestamp)](spark)
    val deduped = input.toDS().toDF("id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.format("memory").queryName("ddww_out")
      .outputMode(OutputMode.Append).start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
      val t1 = Timestamp.valueOf("2024-01-01 10:01:00")
      input.addData(("a", t0), ("a", t1), ("b", t0))
      q.processAllAvailable()
      assert(spark.table("ddww_out").select("id").as[String]
        .collect().sorted.toSeq == Seq("a", "b"))
    } finally q.stop()
  }

  test("streamingDedupCountsWithinWatermark == unbounded dedup counts " +
      "when every dup is inside the horizon") {
    val bounded = Streams.streamingDedupCountsWithinWatermark(
        spark, sf(), "2 hours")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val unbounded = Streams.streamingDedupCounts(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bounded == unbounded)
  }

  test("StreamQuota: the cap carries ACROSS micro-batches (no " +
      "re-admission from zero), admission follows (us, id) order " +
      "within a batch, other keys unaffected") {
    import graft.streaming.StreamQuota.{Adm, Ev => QEv}
    val input = MemoryStream[QEv](spark)
    val q = graft.streaming.StreamQuota.admittedOf(input.toDS(), 4L)
      .writeStream.format("memory").queryName("quota_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: three events arriving OUT of time order — admission
      // indices must follow (us, id), not arrival
      input.addData(QEv("k", 3L, 30L), QEv("k", 1L, 10L),
        QEv("k", 2L, 20L))
      q.processAllAvailable()
      // batch 2: three more, but only one slot remains — a batch job
      // re-run would admit all three (re-counts from zero); the stream
      // must not
      input.addData(QEv("k", 4L, 40L), QEv("k", 5L, 50L),
        QEv("k", 6L, 60L))
      q.processAllAvailable()
      // a different key has its own untouched quota
      input.addData(QEv("j", 9L, 5L))
      q.processAllAvailable()
      val out = spark.table("quota_out").as[Adm].collect().toSet
      assert(out == Set(Adm("k", 1L, 1L), Adm("k", 2L, 2L),
        Adm("k", 3L, 3L), Adm("k", 4L, 4L), Adm("j", 1L, 9L)),
        out.toString)
      // batch 3: key k stays saturated
      input.addData(QEv("k", 7L, 70L))
      q.processAllAvailable()
      assert(spark.table("quota_out").count() == 5L)
    } finally q.stop()
  }

  test("streamingFingerprint == the batch fingerprint of the same rows " +
      "(the stream/batch parity check it exists to provide)") {
    import org.apache.spark.sql.functions._
    val streamed = Streams.streamingFingerprint(spark, sf(),
        "event_type", "event_id")
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = graft.util.Tables.events(spark, sf())
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(graft.ops.TextOps.hash60(col("event_id").cast("string"))
          .cast("decimal(38,0)")) % lit(1152921504606846976L))
          .cast("long").as("fingerprint"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed == batch, s"$streamed vs $batch")
  }

  // rowsPerDay signup+purchase pairs per day for `days` days, fed ONE
  // DAY PER MICRO-BATCH so the watermark advances between batches and
  // eviction actually fires; lookback 1 DAY + 1h watermark means
  // steady-state retains ~2-3 days of rows per side — peak state must
  // track that horizon, NOT the full history. `tag` keeps the memory
  // sink name unique per calling test.
  private def peakState(days: Int, rowsPerDay: Int,
      tag: String = ""): (Long, Long) = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val Day = 24L * 3600L * 1000000L
    val B = 1600000000L * 1000000L
    val ms = MemoryStream[(Long, Long, String, Long)](spark)
    val ev = ms.toDF()
      .selectExpr("_1 AS event_id", "_2 AS user_id",
        "_3 AS event_type", "timestamp_micros(_4) AS ts")
    val joined = Streams.purchaseSignupJoin(ev, "1 DAY", "full_outer")
    val name = s"graft_stream_state_${tag}_${days}_$rowsPerDay"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = joined.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      for (d <- 0 until days) {
        val rows = (0 until rowsPerDay).flatMap { i =>
          val u = d.toLong * rowsPerDay + i
          val t0 = B + d * Day + i.toLong * 1000000L
          Seq((2 * u, u, "signup", t0),
            (2 * u + 1, u, "purchase", t0 + 3600L * 1000000L))
        }
        ms.addData(rows)
        q.processAllAvailable()
      }
      q.stop()
      Streams.recordStateRows(spark, q)
      val peak = spark.conf
        .get("spark.graft.stream.lastMaxStateRows").toLong
      (peak, 2L * days * rowsPerDay)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      spark.catalog.dropTempView(name)
    }
  }

  test("stream-stream join state is watermark-BOUNDED, measured: peak " +
      "numRowsTotal tracks the horizon's row rate, not total history") {
    val (peak1, total1) = peakState(12, 40)
    assert(peak1 > 0, "state measurement must be non-trivial")
    assert(peak1 <= total1 / 3,
      s"peak state $peak1 should be far below total history $total1")
    // 10× the row RATE at the same horizon: peak scales with the rate
    // (≤ ~10× + batch-boundary slack), i.e. with rows-in-horizon, and
    // stays equally far below its own total history
    val (peak10, total10) = peakState(12, 400)
    info(s"peak state rows: 1× = $peak1 of $total1 fed; " +
      s"10× = $peak10 of $total10 fed")
    assert(peak10 <= total10 / 3,
      s"peak state $peak10 should be far below total history $total10")
    assert(peak10 <= 12 * peak1,
      s"peak must scale with the horizon row rate (1×: $peak1, " +
        s"10×: $peak10)")
  }

  test("watermark eviction is provider-independent, measured: the " +
      "SAME peak state rows under RocksDB as under the default " +
      "HDFS-backed store (the documented 100 TB posture)") {
    val (peakDefault, total) = peakState(12, 40, tag = "hdfs")
    val (peakRocks, _) = StatefulTws.withRocksDb(spark) {
      peakState(12, 40, tag = "rocks")
    }
    info(s"peak state rows of $total fed: default = $peakDefault, " +
      s"rocksdb = $peakRocks")
    assert(peakRocks == peakDefault,
      "eviction semantics (and thus peak numRowsTotal) must not " +
        "depend on the state-store provider")
    assert(peakRocks <= total / 3)
  }

  test("streamStreamFullJoin ⊇ left join; extras are null-p_id rows") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val left = pairs(Streams.streamStreamLeftJoin(spark, sf(), "1 DAY"))
    val full = pairs(Streams.streamStreamFullJoin(spark, sf(), "1 DAY"))
    assert(left.subsetOf(full),
      s"left rows missing from full: ${left.diff(full).take(5)}")
    val extras = full.diff(left)
    assert(extras.forall(_._1 == -1L),
      s"non-null-p extras: ${extras.filter(_._1 != -1L).take(5)}")
    assert(extras.nonEmpty, "expected some watermark-proven signups")
  }

  test("left-semi stream-stream join: one row per matched purchase, " +
      "no duplicate on a second matching signup, unmatched absent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val B = 1600000000L * 1000000L
    val ms = MemoryStream[(Long, Long, String, Long)](spark)
    val ev = ms.toDF().selectExpr("_1 AS event_id", "_2 AS user_id",
      "_3 AS event_type", "timestamp_micros(_4) AS ts")
    val joined = Streams.purchaseSignupJoin(ev, "1 DAY", "left_semi")
    assert(joined.columns.toSeq == Seq("p_id"),
      "semi join must carry only the left side")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("graft_semi_probe").start()
    try {
      ms.addData(Seq(
        (1L, 1L, "signup", B),
        (2L, 1L, "signup", B + 600L * 1000000L), // second match: no dup
        (3L, 1L, "purchase", B + 3600L * 1000000L),
        (4L, 2L, "purchase", B + 3600L * 1000000L))) // no signup
      q.processAllAvailable()
      val got = spark.table("graft_semi_probe").collect()
        .map(_.getLong(0)).toSeq
      assert(got == Seq(3L), s"expected exactly one row for p_id 3: $got")
    } finally {
      q.stop()
      spark.catalog.dropTempView("graft_semi_probe")
    }
  }
}
