package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Hand cases for the clustering-tendency ops. */
class TendencySpec extends SparkTestBase {
  import spark.implicits._

  private def blobs = ((1 to 20).map(i =>
    (i.toLong, 0.0 + (i % 4) * 0.01, 0.0 + (i % 5) * 0.01)) ++
    (21 to 40).map(i =>
      (i.toLong, 5.0 + (i % 4) * 0.01, 5.0 + (i % 5) * 0.01)))
    .toDF("id", "x", "y")

  test("lloyd2d: inertia is non-increasing across iterations and the " +
      "cluster sizes account for every point") {
    val got = Cluster.lloyd2d(blobs, "id", "x", "y", k = 2, iters = 3)
      .orderBy("iter").collect()
    val in = got.map(_.getAs[Double]("inertia_r"))
    assert(in(0) >= in(1) && in(1) >= in(2), in.mkString(", "))
    got.foreach { r =>
      assert(r.getAs[Long]("n1") + r.getAs[Long]("n2") == 40L)
    }
    // two well-separated blobs: the final iteration splits 20/20
    assert(got.last.getAs[Long]("n1") == 20L, got.last.toString)
  }

  test("lloyd2d: an empty cluster keeps its previous centroid " +
      "(coalesce guard) instead of poisoning the next argmin") {
    // k=3 on 2 tight blobs: one seed will capture nothing eventually
    val got = Cluster.lloyd2d(blobs, "id", "x", "y", k = 3, iters = 3)
      .orderBy("iter").collect()
    // no NaN/null inertia and sizes always total 40
    got.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("inertia_r")))
      assert(r.getAs[Long]("n1") + r.getAs[Long]("n2")
        + r.getAs[Long]("n3") == 40L)
    }
  }

  test("elbowCurve: inertia is non-increasing in k and the k=2 value " +
      "matches a direct least() computation shape") {
    val got = Cluster.elbowCurve(blobs, "id", "x", "y", kMax = 5)
      .orderBy("k").collect()
    val in = got.map(_.getAs[Double]("inertia_r"))
    assert(in.length == 4)
    assert(in.sliding(2).forall(p => p(0) >= p(1)), in.mkString(", "))
  }

  test("adjustedRand: identical labelings give 1; a constant " +
      "labeling against a split gives 0") {
    val same = (1 to 30).map(i => (i % 3, i % 3)).toDF("a", "b")
    val r1 = Cluster.adjustedRand(same, "a", "b").collect()(0)
    assert(r1.getAs[Double]("ari_r") == 1.0)
    val const = (1 to 30).map(i => (0, i % 3)).toDF("a", "b")
    val r0 = Cluster.adjustedRand(const, "a", "b").collect()(0)
    assert(r0.getAs[Double]("ari_r") == 0.0, r0.toString)
  }

  test("hopkins: two tight blobs read as clustered (H well above " +
      "0.5); a regular grid reads near-uniform") {
    val h1 = Cluster.hopkins(blobs, "id", "x", "y", m = 10)
      .collect()(0).getAs[Double]("h_r")
    assert(h1 > 0.7, s"blobs should be clustered: $h1")
    val grid = (for (i <- 0 until 10; j <- 0 until 10)
      yield ((i * 10 + j).toLong, i.toDouble, j.toDouble))
      .toDF("id", "x", "y")
    val h0 = Cluster.hopkins(grid, "id", "x", "y", m = 10)
      .collect()(0).getAs[Double]("h_r")
    assert(h0 < h1, s"grid $h0 should read less clustered than blobs $h1")
  }

  test("olsPrefixCurve: a perfect line holds R2 = 1 at every prefix; " +
      "row counts grow with the fraction") {
    val g = (0 to 99).map(i => (i.toLong, 3L * i + 7)).toDF("t", "y")
    val got = Influence.olsPrefixCurve(g, "t", "y",
      Seq(0.5, 1.0)).orderBy("frac").collect()
    assert(got(0).getAs[Double]("r2_r") == 1.0)
    assert(got(1).getAs[Double]("r2_r") == 1.0)
    assert(got(0).getAs[Double]("slope_r") == 3.0)
    assert(got(0).getAs[Long]("n_rows") < got(1).getAs[Long]("n_rows"))
  }
}
