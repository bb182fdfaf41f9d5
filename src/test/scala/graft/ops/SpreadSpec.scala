package graft.ops

import graft.SparkTestBase

/** Hand cases for the scale/location rank-test family. */
class SpreadSpec extends SparkTestBase {
  import spark.implicits._

  test("ansariBradley: central group scores high (AB statistic = sum " +
      "of both-end ranks), extreme group low; hand W on {4,5} vs {1,9}") {
    // pooled 1,4,5,9 → AB scores 1,2,2,1; A = {4,5} central → W = 4
    val df = Seq(("a", 4L), ("a", 5L), ("b", 1L), ("b", 9L))
      .toDF("g", "v")
    val r = Nonparam.ansariBradley(df, "v", "g", "a", "b").collect()(0)
    assert(r.getAs[Double]("ab_w_r") == 4.0, r.toString)
    assert(r.getAs[Double]("z_r") > 0, r.toString)
  }

  test("ansariBradley ties: tied middle pair averages its scores " +
      "(hand W on {2,2} vs {1,3} = 4)") {
    val df = Seq(("a", 2L), ("a", 2L), ("b", 1L), ("b", 3L))
      .toDF("g", "v")
    val r = Nonparam.ansariBradley(df, "v", "g", "a", "b").collect()(0)
    assert(r.getAs[Double]("ab_w_r") == 4.0, r.toString)
  }

  test("moodScale: the central group's quadratic score T is below its " +
      "null expectation (negative z); hand T on {4,5} vs {1,9}") {
    // scores (p−2.5)²: 2.25, .25, .25, 2.25 → T_a = 0.5, E = 2.5;
    // emitted in N²-normalized units: 0.5/16 = 0.03125
    val df = Seq(("a", 4L), ("a", 5L), ("b", 1L), ("b", 9L))
      .toDF("g", "v")
    val r = Nonparam.moodScale(df, "v", "g", "a", "b").collect()(0)
    assert(r.getAs[Double]("mood_t_r") == 0.03125, r.toString)
    assert(r.getAs[Double]("z_r") < 0, r.toString)
  }

  test("lepage: a pure location shift loads the Wilcoxon component " +
      "and L ≥ z_W²") {
    val df = ((1 to 20).map(i => ("a", 100L + i)) ++
      (1 to 20).map(i => ("b", 200L + i))).toDF("g", "v")
    val r = Nonparam.lepage(df, "v", "g", "a", "b").collect()(0)
    val zw = r.getAs[Double]("zw_r")
    assert(math.abs(zw) > 3, r.toString)
    // lepage_r is rounded at 6dp from the unrounded z's; allow the
    // rounding slack
    assert(r.getAs[Double]("lepage_r") >= zw * zw - 1e-4, r.toString)
  }

  test("moodMedian: groups split cleanly above/below the pooled " +
      "median give a large chi2; identical groups give 0") {
    val split = ((1 to 10).map(i => ("lo", i.toLong)) ++
      (1 to 10).map(i => ("hi", 100L + i))).toDF("g", "v")
    val r1 = Nonparam.moodMedian(split, "v", "g").collect()(0)
    assert(r1.getAs[Long]("df") == 1L)
    assert(r1.getAs[Double]("chi2_r") > 15, r1.toString)
    // pooled median = the ⌈(N+1)/2⌉-th order statistic (position 11
    // of 20): the first value whose inclusive prefix C has 2C ≥ 21 —
    // here 101
    assert(r1.getAs[Double]("median_r") == 101.0, r1.toString)
    val same = ((1 to 10) ++ (1 to 10)).zipWithIndex.map { case (v, i) =>
      (if (i < 10) "x" else "y", v.toLong) }.toDF("g", "v")
    val r2 = Nonparam.moodMedian(same, "v", "g").collect()(0)
    assert(r2.getAs[Double]("chi2_r") == 0.0, r2.toString)
  }

  test("jonckheere: perfectly increasing ordered groups hit the " +
      "maximum J (2J = 24 on the 2+2+2 hand case) with z > 0; " +
      "reversed groups flip the sign") {
    val inc = Seq(("g1", 1L), ("g1", 2L), ("g2", 3L), ("g2", 4L),
      ("g3", 5L), ("g3", 6L)).toDF("g", "v")
    val r1 = Nonparam.jonckheere(inc, "v", "g").collect()(0)
    assert(r1.getAs[Long]("j2") == 24L, r1.toString)
    assert(r1.getAs[Double]("z_r") > 0, r1.toString)
    val dec = Seq(("g1", 5L), ("g1", 6L), ("g2", 3L), ("g2", 4L),
      ("g3", 1L), ("g3", 2L)).toDF("g", "v")
    val r2 = Nonparam.jonckheere(dec, "v", "g").collect()(0)
    assert(r2.getAs[Long]("j2") == 0L, r2.toString)
    assert(r2.getAs[Double]("z_r") < 0, r2.toString)
  }
}
