package graft.ops

import graft.SparkTestBase

/** Skew.joinCardinalityAudit: the pre-flight size prediction must equal
  * the size of the join it predicts, and hot keys must surface first. */
class SkewAuditSpec extends SparkTestBase {
  import spark.implicits._

  test("joinCardinalityAudit: Σ contrib == actual join row count; the " +
      "hot key ranks first with the right share") {
    val a = (Seq.fill(10)("hot") ++ Seq("w", "w", "x", "z")).toDF("key")
    val b = (Seq.fill(5)("hot") ++ Seq("w", "y", "z")).toDF("key")
    val audit = Skew.joinCardinalityAudit(a, b, "key", topK = 100)
      .collect()
    val predicted = audit.map(_.getAs[Long]("contrib")).sum
    val actual = a.join(b, "key").count()
    assert(predicted == actual, s"predicted $predicted vs joined $actual")
    val top = audit.minBy(_.getAs[Int]("rank"))
    // hot: 10×5 = 50 of 50+2+1 = 53 total
    assert(top.getAs[String]("key") == "hot" &&
      top.getAs[Long]("contrib") == 50L)
    assert(top.getAs[Double]("share_r") == math.rint(50.0 / 53 * 1e6) / 1e6)
  }

  test("joinCardinalityAudit: keys on one side only contribute nothing " +
      "(inner-join semantics)") {
    val a = Seq("a", "a", "b").toDF("key")
    val b = Seq("b", "c").toDF("key")
    val keys = Skew.joinCardinalityAudit(a, b, "key", 10)
      .collect().map(_.getAs[String]("key")).toSeq
    assert(keys == Seq("b"), keys.toString)
  }

  test("lorenzDeciles: 10 equal keys per decile, shares sum to 1, " +
      "cumulative share is monotone and ends at 1") {
    import spark.implicits._
    val keys = (1L to 100L).map(k => (k, k * 100L)).toDF("k", "v")
    val got = graft.ops.Skew.lorenzDeciles(keys, "k", "v")
      .collect()
    assert(got.length == 10)
    assert(got.forall(_.getAs[Long]("n_keys") == 10))
    // decile 1 holds the SMALLEST values (Lorenz convention)
    assert(got.head.getAs[Long]("total") == (1L to 10L).map(_ * 100).sum)
    assert(got.last.getAs[Double]("cum_share_r") == 1.0)
    val cums = got.map(_.getAs[Double]("cum_share_r")).toSeq
    assert(cums == cums.sorted)
  }
}
