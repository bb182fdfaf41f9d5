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
}
