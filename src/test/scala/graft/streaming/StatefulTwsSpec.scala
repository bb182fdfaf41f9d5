package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

import graft.SparkTestBase
import graft.streaming.StatefulTws.{Purchase, Running, SpendProcessor}

/** transformWithState (Spark 4 typed-state API) against a controlled
  * MemoryStream: in-batch sorting, cross-batch state carry, and the
  * RocksDB provider actually engaged (TWS refuses the default
  * HDFS-backed provider, so a green run IS the provider check). */
class StatefulTwsSpec extends SparkTestBase {
  import spark.implicits._

  test("running spend: in-batch disorder sorted, state carries across " +
      "micro-batches, per-user isolation (RocksDB state store)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ms = MemoryStream[Purchase](spark)
    val rows = StatefulTws.withRocksDb(spark) {
      val q = ms.toDS().groupByKey(_.user_id)
        .transformWithState(new SpendProcessor, TimeMode.None(),
          OutputMode.Append(), Encoders.product[Running])
        .toDF()
        .writeStream.outputMode("append").format("memory")
        .queryName("graft_tws_probe").start()
      try {
        // batch 1, deliberately out of order within the batch
        ms.addData(Purchase(1L, 11L, 2000L, 300L),
          Purchase(1L, 10L, 1000L, 500L),
          Purchase(2L, 12L, 1000L, 100L))
        q.processAllAvailable()
        // batch 2: user 1's accumulator must resume at 800
        ms.addData(Purchase(1L, 13L, 3000L, 200L))
        q.processAllAvailable()
        spark.table("graft_tws_probe").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).toSet
      } finally {
        q.stop()
        spark.catalog.dropTempView("graft_tws_probe")
      }
    }
    assert(rows == Set(
      (1L, 1L, 10L, 500L), // event 10 first despite arrival order
      (1L, 2L, 11L, 800L),
      (1L, 3L, 13L, 1000L), // cross-batch carry
      (2L, 1L, 12L, 100L)))
    assert(spark.conf
      .getOption("spark.sql.streaming.stateStore.providerClass").isEmpty
      || !spark.conf
        .get("spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDB"),
      "withRocksDb must restore the session's provider")
  }

  test("last-k trail: ListState FIFO caps at k, in-batch disorder " +
      "sorted, trail carries across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StatefulTws.{TrailProcessor, TrailRow}
    val ms = MemoryStream[Purchase](spark)
    val rows = StatefulTws.withRocksDb(spark) {
      val q = ms.toDS().groupByKey(_.user_id)
        .transformWithState(new TrailProcessor(3), TimeMode.None(),
          OutputMode.Append(), Encoders.product[TrailRow])
        .toDF()
        .writeStream.outputMode("append").format("memory")
        .queryName("graft_tws_trail_probe").start()
      try {
        // batch 1: four purchases for user 1, out of order in arrival
        ms.addData(Purchase(1L, 12L, 2000L, 1L),
          Purchase(1L, 10L, 1000L, 1L),
          Purchase(1L, 13L, 3000L, 1L),
          Purchase(1L, 14L, 4000L, 1L))
        q.processAllAvailable()
        // batch 2: the 5th purchase sees only the LAST 3 priors
        ms.addData(Purchase(1L, 15L, 5000L, 1L))
        q.processAllAvailable()
        spark.table("graft_tws_trail_probe").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getString(3))).toSet
      } finally {
        q.stop()
        spark.catalog.dropTempView("graft_tws_trail_probe")
      }
    }
    assert(rows == Set(
      (1L, 10L, 0L, ""), // first purchase: empty trail
      (1L, 12L, 1L, "10"), // sorted despite arrival order
      (1L, 13L, 2L, "10,12"),
      (1L, 14L, 3L, "10,12,13"),
      (1L, 15L, 3L, "12,13,14"))) // capped at 3, cross-batch carry
  }

  test("type counts: MapState keyed per type, in-batch disorder " +
      "sorted, counts carry across micro-batches and types isolate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StatefulTws.{Ev, TypeCountProcessor, TypeSeq}
    val ms = MemoryStream[Ev](spark)
    val rows = StatefulTws.withRocksDb(spark) {
      val q = ms.toDS().groupByKey(_.user_id)
        .transformWithState(new TypeCountProcessor, TimeMode.None(),
          OutputMode.Append(), Encoders.product[TypeSeq])
        .toDF()
        .writeStream.outputMode("append").format("memory")
        .queryName("graft_tws_types_probe").start()
      try {
        ms.addData(Ev(1L, 11L, 2000L, "click"),
          Ev(1L, 10L, 1000L, "view"),
          Ev(1L, 12L, 3000L, "click"))
        q.processAllAvailable()
        ms.addData(Ev(1L, 13L, 4000L, "click"),
          Ev(1L, 14L, 5000L, "view"))
        q.processAllAvailable()
        spark.table("graft_tws_types_probe").collect()
          .map(r => (r.getLong(1), r.getString(2), r.getLong(3))).toSet
      } finally {
        q.stop()
        spark.catalog.dropTempView("graft_tws_types_probe")
      }
    }
    assert(rows == Set(
      (10L, "view", 1L), // sorted despite arrival order
      (11L, "click", 1L),
      (12L, "click", 2L),
      (13L, "click", 3L), // cross-batch carry per type
      (14L, "view", 2L)))
  }

  test("timer sessions: gap splits emit inline, the EVENT-TIME timer " +
      "flushes idle sessions across batches, and the session counter " +
      "survives a timer closure") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    import graft.streaming.StatefulTws.{Ev, SessOut, TimerSessionProcessor}
    val ms = MemoryStream[Ev](spark)
    def sec(s: Long): Long = s * 1000000L
    val rows = StatefulTws.withRocksDb(spark) {
      val q = ms.toDS()
        .withColumn("ts", timestamp_micros(col("us")))
        .withWatermark("ts", "0 seconds")
        .as[Ev]
        .groupByKey(_.user_id)
        .transformWithState(new TimerSessionProcessor(30L),
          TimeMode.EventTime(), OutputMode.Append(),
          Encoders.product[SessOut])
        .toDF()
        .writeStream.outputMode("append").format("memory")
        .queryName("graft_tws_timer_probe").start()
      try {
        // times start at 1000s: an event AT the initial 0 watermark is
        // dropped as late by transformWithState (verified empirically —
        // the 0s variant of this test lost the row)
        // batch 1: user 1 session of two events (1000s, 1010s); user 2
        // at 1005s
        ms.addData(Ev(1L, 10L, sec(1000), "a"),
          Ev(1L, 11L, sec(1010), "a"), Ev(2L, 20L, sec(1005), "a"))
        q.processAllAvailable()
        // batch 2: user 2 at 1100s — 95s > 30s gap, session 1 closes
        // INLINE ("gap"); the watermark reaching 1100s then fires user
        // 1's 1040.001s timer ("timer") in the trailing no-data batch
        ms.addData(Ev(2L, 21L, sec(1100), "a"))
        q.processAllAvailable()
        // batch 3: unrelated user pushes the watermark to 1200s →
        // user 2's 1130.001s timer fires
        ms.addData(Ev(3L, 30L, sec(1200), "a"))
        q.processAllAvailable()
        // batch 4: user 1 RETURNS after its timer closure — the new
        // session must carry index 2 (counter survives the flush).
        // The watermark also reaches 1300s, firing user 3's 1230.001s
        // timer (no-data batches fire timers PROMPTLY — user 3's first
        // session closes by timer before its 1400s event arrives)
        ms.addData(Ev(1L, 12L, sec(1300), "a"))
        q.processAllAvailable()
        // batches 5-6: user 3 returns at 1400s (index 2 — its counter
        // survived too), then its 1500s event splits that session by
        // GAP inline; the watermark passing 1330.001s fires user 1's
        // second timer
        ms.addData(Ev(3L, 31L, sec(1400), "a"))
        q.processAllAvailable()
        ms.addData(Ev(3L, 32L, sec(1500), "a"))
        q.processAllAvailable()
        spark.table("graft_tws_timer_probe").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4), r.getString(5))).toSet
      } finally {
        q.stop()
        spark.catalog.dropTempView("graft_tws_timer_probe")
      }
    }
    assert(rows == Set(
      (1L, 1L, 2L, sec(1000), sec(1010), "timer"), // idle flush, n=2
      (1L, 2L, 1L, sec(1300), sec(1300), "timer"), // index SURVIVED: 2
      (2L, 1L, 1L, sec(1005), sec(1005), "gap"), // inline gap split
      (2L, 2L, 1L, sec(1100), sec(1100), "timer"),
      (3L, 1L, 1L, sec(1200), sec(1200), "timer"), // prompt no-data fire
      (3L, 2L, 1L, sec(1400), sec(1400), "gap")),
      // user 3's last session (1500s) must STAY OPEN: its 1530.001s
      // timer never passes the final watermark
      s"got: $rows")
  }

  test("timer expiry BOUNDARY: a timer at exactly the watermark fires " +
      "(expiry <= watermark) — the inequality the q408 oracle encodes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    import graft.streaming.StatefulTws.{Ev, SessOut, TimerSessionProcessor}
    val ms = MemoryStream[Ev](spark)
    val rows = StatefulTws.withRocksDb(spark) {
      val q = ms.toDS()
        .withColumn("ts", timestamp_micros(col("us")))
        .withWatermark("ts", "0 seconds")
        .as[Ev]
        .groupByKey(_.user_id)
        .transformWithState(new TimerSessionProcessor(30L),
          TimeMode.EventTime(), OutputMode.Append(),
          Encoders.product[SessOut])
        .toDF()
        .writeStream.outputMode("append").format("memory")
        .queryName("graft_tws_timer_edge").start()
      try {
        // user 9's session ends at 1100s → timer at 1130.001s exactly
        ms.addData(Ev(9L, 90L, 1100000000L, "a"))
        q.processAllAvailable()
        // push the watermark to EXACTLY 1130.001s (1130001000 us)
        ms.addData(Ev(8L, 80L, 1130001000L, "a"))
        q.processAllAvailable()
        spark.table("graft_tws_timer_edge").collect()
          .map(r => (r.getLong(0), r.getString(5))).toSet
      } finally {
        q.stop()
        spark.catalog.dropTempView("graft_tws_timer_edge")
      }
    }
    assert(rows == Set((9L, "timer")),
      s"timer-at-watermark boundary drifted; got: $rows")
  }
}
