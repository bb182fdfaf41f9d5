package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Hand-computable cases for the round-12 robust estimators. */
class RobustSpec extends SparkTestBase {
  import spark.implicits._

  test("gesdPeel: peels the extreme first, recomputes stats, breaks " +
      "deviation ties by smallest key") {
    val g = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 100L))
      .toDF("k", "y")
    val got = Robust.gesdPeel(g, "k", "y", 2).orderBy("round")
      .collect()
    // round 1: mean 26.5, the 100 is the extreme
    assert(got(0).getAs[Long]("k") == 4L)
    assert(got(0).getAs[Long]("n_remaining") == 4L)
    assert(math.abs(got(0).getAs[Double]("mean_r") - 26.5) < 1e-9)
    // round 2 over {1,2,3}: mean 2, sd 1; |1-2| = |3-2| ties -> k=1
    assert(got(1).getAs[Long]("k") == 1L)
    assert(got(1).getAs[Double]("sd_r") == 1.0)
    assert(got(1).getAs[Double]("r_stat_r") == 1.0)
  }

  test("huberIrls: an outlier drags OLS but is downweighted by IRLS") {
    val pts = (0 to 9).map(i => (i.toDouble, i.toDouble)) :+ (10.0, 100.0)
    val g = pts.toDF("x", "y")
    val r = Robust.huberIrls(g, "x", "y", delta = 1.0, iters = 3)
      .collect()(0)
    val bOls = r.getAs[Double]("b_ols_r")
    val bHub = r.getAs[Double]("b_r")
    assert(bOls > 2.0, s"OLS slope should chase the outlier: $bOls")
    assert(bHub < bOls && bHub < 2.0,
      s"Huber slope must resist the outlier: $bHub vs OLS $bOls")
    assert(r.getAs[Long]("n_downweighted") >= 1L)
    assert(r.getAs[Double]("w_min_r") < 1.0)
  }

  test("gmm2Em: two separated clumps converge to their centers with " +
      "pi near 1/2") {
    val g = Seq(0.0, 0.1, -0.1, 10.0, 10.1, 9.9).toDF("y")
    val r = Robust.gmm2Em(g, "y", iters = 3).collect()(0)
    assert(math.abs(r.getAs[Double]("mu1_r") - 0.0) < 0.5,
      r.toString)
    assert(math.abs(r.getAs[Double]("mu2_r") - 10.0) < 0.5)
    assert(math.abs(r.getAs[Double]("pi1_r") - 0.5) < 0.1)
  }

  test("coxPhBinary: early-dying treated group gets beta > 0; " +
      "flipping the covariate flips beta exactly; censored rows enter " +
      "risk sets but not events") {
    // x=1 subjects die at t=1..3; x=0 at t=5..7; one censored each arm
    val subj = Seq(
      (1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 1L), (4L, 0L, 1L),
      (5L, 1L, 0L), (6L, 1L, 0L), (7L, 1L, 0L), (8L, 0L, 0L))
      .toDF("t", "e", "x")
    val r = Robust.coxPhBinary(subj, "t", "e", "x", newton = 2)
      .collect()(0)
    assert(r.getAs[Long]("n_subjects") == 8L)
    assert(r.getAs[Long]("n_events") == 6L)
    val beta = r.getAs[Double]("beta_r")
    assert(beta > 0.5, s"early-death arm must carry positive beta: $beta")
    assert(r.getAs[Double]("hr_r") > 1.0)
    assert(r.getAs[Double]("se_r") > 0.0)
    val flipped = Robust.coxPhBinary(
      subj.withColumn("x", lit(1L) - col("x")), "t", "e", "x",
      newton = 2).collect()(0)
    assert(math.abs(flipped.getAs[Double]("beta_r") + beta) < 1e-9,
      s"beta must be antisymmetric in the covariate: $flipped vs $beta")
  }

  test("neymanAlloc: allocation proportional to N_h * sd_h, exact " +
      "budget spend") {
    // equal counts, sd ratio 1:2 -> quotas 3 and 6 of budget 9, exact
    val docs = Seq(("a", 0L), ("a", 10L), ("b", 0L), ("b", 20L))
      .toDF("src", "y")
    val got = Curation.neymanAlloc(docs, "src", "y", 9L)
      .orderBy("src").collect()
    assert(got.map(_.getAs[Long]("alloc")).toSeq == Seq(3L, 6L),
      got.mkString(";"))
    assert(got.map(_.getAs[Long]("alloc")).sum == 9L)
  }
}
