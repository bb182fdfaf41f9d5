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

  test("lorenzAsymmetry: one giant among equals pushes S above 1; " +
      "mean ties count as below neither share") {
    import spark.implicits._
    // {1,1,1,1,6}: mean 2 -> F = 0.8, L = 0.4, S = 1.2
    val giant = Seq(1.0, 1.0, 1.0, 1.0, 6.0).toDF("a")
    val rg = Skew.lorenzAsymmetry(giant, "a").collect()(0)
    assert(rg.getAs[Long]("n_below") == 4)
    assert(rg.getAs[Double]("f_mu_r") == 0.8)
    assert(rg.getAs[Double]("l_mu_r") == 0.4)
    assert(rg.getAs[Double]("s_r") == 1.2)
    // {1,2,3}: mean 2; the exact tie at 2 is NOT below the mean
    val tie = Seq(1.0, 2.0, 3.0).toDF("a")
    val rt = Skew.lorenzAsymmetry(tie, "a").collect()(0)
    assert(rt.getAs[Long]("n_below") == 1)
    assert(rt.getAs[Double]("s_r") == 0.5)
  }
}
