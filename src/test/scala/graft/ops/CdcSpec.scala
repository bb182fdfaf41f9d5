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

  private def aggOf(rows: Seq[(String, Double)]) = {
    import org.apache.spark.sql.functions._
    rows.toDF("k", "v").groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum"))
  }

  test("mergeAggState: merge(agg(A), agg(B)) == agg(A ++ B), including " +
      "keys present in only one side") {
    val a = Seq(("x", 1.5), ("x", 2.5), ("y", 4.0))
    val b = Seq(("x", 3.0), ("z", 7.5))
    val got = Cdc.mergeAggState(aggOf(a), aggOf(b), "k")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    val want = aggOf(a ++ b).collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2))).toMap
    assert(got == want) // halves are exact in binary: bit-equal sums
    assert(got("z") == ((1L, 7.5)) && got("y") == ((1L, 4.0)))
  }

  test("mergeAggState: a negated delta retracts (count/sum are " +
      "self-inverting)") {
    import org.apache.spark.sql.functions._
    val state = aggOf(Seq(("x", 1.5), ("x", 2.5)))
    val retract = state.select(col("k"), (-col("n")).as("n"),
      (-col("sum")).as("sum"))
    val got = Cdc.mergeAggState(state, retract, "k").collect()
    assert(got.length == 1 && got.head.getLong(1) == 0L &&
      got.head.getDouble(2) == 0.0)
  }
}
