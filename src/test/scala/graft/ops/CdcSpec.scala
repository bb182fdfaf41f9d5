package graft.ops

import graft.SparkTestBase

class CdcSpec extends SparkTestBase {
  import spark.implicits._

  private val oldSnap = Seq(
    (1L, Some(10.0), "A"),      // unchanged
    (2L, Some(20.0), "A"),      // price changes
    (3L, Some(30.0), "A"),      // deleted in new
    (5L, Option.empty[Double], "A") // null → value (update)
  ).toDF("k", "price", "status")

  private val newSnap = Seq(
    (1L, Some(10.0), "A"),
    (2L, Some(25.0), "A"),
    (4L, Some(40.0), "B"), // inserted
    (5L, Some(50.0), "A")
  ).toDF("k", "price", "status")

  test("snapshotDiff classifies insert/update/delete; unchanged dropped") {
    val got = Cdc.snapshotDiff(oldSnap, newSnap, "k", Seq("price", "status"))
      .orderBy("k").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(got == Seq(2L -> "update", 3L -> "delete", 4L -> "insert",
      5L -> "update"))
  }

  test("snapshotDiff carries old and new values on updates") {
    val r = Cdc.snapshotDiff(oldSnap, newSnap, "k", Seq("price", "status"))
      .where($"k" === 2L).collect().head
    assert(r.getAs[Double]("old_price") == 20.0)
    assert(r.getAs[Double]("new_price") == 25.0)
  }

  test("null-safe comparison: null == null is unchanged") {
    val o = Seq((1L, Option.empty[Double])).toDF("k", "v")
    val n = Seq((1L, Option.empty[Double])).toDF("k", "v")
    assert(Cdc.snapshotDiff(o, n, "k", Seq("v")).isEmpty)
  }

  test("identical snapshots diff to empty") {
    assert(Cdc.snapshotDiff(newSnap, newSnap, "k", Seq("price", "status"))
      .isEmpty)
  }
}
