package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.streaming.StreamingHeavyHitters.{Ev, Hit, mgFold}

/** Misra–Gries semantics: exactness when capacity ≥ distinct keys, the
  * classic undercount/survival bounds when it isn't, cross-batch state
  * carry, and agreement between the streaming fold and the pure
  * reference. */
class StreamingHeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  private def refCounts(items: Seq[Long]): Map[Long, Long] =
    items.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("mgFold exact when capacity >= distinct keys") {
    val items = Seq(1L, 2L, 1L, 3L, 1L, 2L, 4L, 1L)
    assert(mgFold(10, Map.empty, items) == refCounts(items))
  }

  test("mgFold bounds: est <= true, true - est <= N/capacity, and every " +
      "key with freq > N/capacity survives (sweep capacities)") {
    // zipf-ish synthetic stream: key k appears ~ 600/k times
    val items = (1L to 30L).flatMap(k => Seq.fill((600 / k).toInt)(k))
    val truth = refCounts(items)
    val n = items.size
    for (cap <- Seq(4, 8, 16, 64)) {
      val mg = mgFold(cap, Map.empty, items)
      assert(mg.size <= cap, s"cap=$cap: size ${mg.size}")
      mg.foreach { case (k, est) =>
        assert(est <= truth(k), s"cap=$cap key=$k overcounts")
        assert(truth(k) - est <= n.toLong / cap,
          s"cap=$cap key=$k: err ${truth(k) - est} > ${n / cap}")
      }
      truth.filter(_._2 > n.toLong / cap).keys.foreach { k =>
        assert(mg.contains(k), s"cap=$cap: heavy key $k evicted")
      }
    }
  }

  test("state carries across micro-batches; final snapshot equals the " +
      "one-batch fold of the concatenated ordered input") {
    // geometric mix: key j on every 2^(j+1)-th item — key 0 dominates,
    // so MG (cap 4) always holds a nonempty summary at batch boundaries
    // (a skewless mix legitimately empties the counters — that regime is
    // covered by the bounds sweep above)
    val all = (1L to 200L).map(i =>
      Ev("t", java.lang.Long.numberOfTrailingZeros(i).toLong,
        i * 1000L, i))
    val Seq(b1, b2, b3) = Seq(all.take(50), all.slice(50, 130),
      all.drop(130))
    val input = MemoryStream[Ev](spark)
    val q = StreamingHeavyHitters.heavyHittersOf(input.toDS(), 4, 3)
      .writeStream.format("memory").queryName("mg_hits")
      .outputMode(OutputMode.Append).start()
    try {
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b: _*); q.processAllAvailable()
      }
      val rows = spark.table("mg_hits").as[Hit].collect()
      val finalSnap = rows.filter(_.version == 200L)
        .map(h => (h.r, h.user_id, h.est_n)).sortBy(_._1).toSeq
      val expected = mgFold(4, Map.empty, all.map(_.user_id)).toSeq
        .sortBy { case (k, c) => (-c, k) }.take(3).zipWithIndex
        .map { case ((k, c), i) => (i + 1, k, c) }
      assert(finalSnap == expected,
        s"stream $finalSnap vs reference $expected")
      // every batch emitted a snapshot: versions 50, 130, 200 all present
      assert(rows.map(_.version).distinct.sorted.toSeq ==
        Seq(50L, 130L, 200L))
    } finally q.stop()
  }

  test("heavyHitters over the sf0.001 events == exact batch top-k " +
      "(capacity above distinct users)") {
    val got = StreamingHeavyHitters.heavyHitters(spark, sf(), 4096, 10)
      .orderBy("event_type", "r")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSeq
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("event_type")
      .orderBy(col("est_n").desc, col("user_id"))
    val expect = graft.util.Tables.events(spark, sf())
      .groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("est_n"))
      .withColumn("r", row_number().over(w))
      .where(col("r") <= 10)
      .select(col("event_type"), col("r"), col("user_id"), col("est_n"))
      .orderBy("event_type", "r")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expect)
  }
}
