package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Hand-computable cases for the regression-influence diagnostics. */
class InfluenceSpec extends SparkTestBase {
  import spark.implicits._

  // y = x on 0..9 plus one gross outlier at the right edge: the edge
  // point has both leverage and residual -> dominant Cook's D.
  private def outlierGrain = ((0 to 9).map(i => (i.toLong, i.toLong, i.toLong))
    :+ (10L, 10L, 100L)).toDF("k", "x", "y")

  test("cooksTopK: the high-leverage outlier dominates; clean points " +
      "have near-zero influence") {
    val got = Influence.cooksTopK(outlierGrain, "k", "x", "y", 3)
      .orderBy(desc("cooks_r"), col("k")).collect()
    assert(got(0).getAs[Long]("k") == 10L)
    assert(got(0).getAs[Double]("cooks_r") >
      10 * math.abs(got(1).getAs[Double]("cooks_r")),
      got.mkString(", "))
    // leverage of the edge x is the hat closed form: 1/11 + 25/110
    assert(math.abs(got(0).getAs[Double]("leverage_r")
      - (1.0 / 11 + 25.0 / 110)) < 1e-6)
  }

  test("pressLoocv: a perfect line has PRESS 0 and R2 1; the outlier " +
      "line has r2_pred well below r2") {
    val perfect = (0 to 9).map(i => (i.toLong, i.toLong, 2L * i))
      .toDF("k", "x", "y")
    val p = Influence.pressLoocv(perfect, "k", "x", "y", 1.0).collect()(0)
    assert(p.getAs[Double]("press_r") == 0.0)
    assert(p.getAs[Double]("r2_r") == 1.0)
    val o = Influence.pressLoocv(outlierGrain, "k", "x", "y", 1.0)
      .collect()(0)
    assert(o.getAs[Double]("r2_pred_r") < o.getAs[Double]("r2_r"),
      o.toString)
  }

  test("studentizedTopK: the outlier's external t exceeds its " +
      "internal z by construction and tops the list") {
    // noisy base line (so the deleted fit is never perfect) + outlier
    val g = ((0 to 9).map(i =>
      (i.toLong, i.toLong, (i + (i % 3)).toLong))
      :+ (10L, 10L, 100L)).toDF("k", "x", "y")
    val got = Influence.studentizedTopK(g, "k", "x", "y", 2).collect()
    assert(got(0).getAs[Long]("k") == 10L, got.mkString(", "))
    assert(math.abs(got(0).getAs[Double]("t_ext_r")) >
      math.abs(got(1).getAs[Double]("t_ext_r")))
  }

  test("studentizedTopK: a perfect deleted fit clamps to null t " +
      "instead of NaN (the -epsilon sqrt guard)") {
    val got = Influence.studentizedTopK(outlierGrain, "k", "x", "y", 11)
      .collect()
    assert(got.forall(r => !r.isNullAt(r.fieldIndex("t_ext_r"))
      || r.getAs[Long]("k") == 10L))
    assert(!got.exists(r => !r.isNullAt(r.fieldIndex("t_ext_r"))
      && r.getAs[Double]("t_ext_r").isNaN))
  }

  test("vif3: an exact duplicate regressor pair sends its VIFs to " +
      "null (r=1 singularity); an independent design stays near 1") {
    // x2 = x1 duplicates; x3 alternates independently
    val dup = (0 to 19).map(i =>
      (i.toLong, i.toLong, (i % 2).toLong)).toDF("x1", "x2", "x3")
    val v = Influence.vif3(dup, "x1", "x2", "x3").collect()(0)
    assert(v.getAs[Double]("r12_r") == 1.0)
    // exact algebra gives null (1-R2 = 0); FP may leave 1-R2 at +/-eps,
    // which must still read as an exploded VIF, never a tame one
    assert(v.isNullAt(v.fieldIndex("vif1_r"))
      || math.abs(v.getAs[Double]("vif1_r")) > 100.0,
      s"perfect collinearity must explode the VIF: $v")
    // independent-ish: x1 = i, x2 = hash-ish alternation, x3 = i%3
    val ind = (0 to 199).map(i => (i.toLong, ((i * 7) % 13).toLong,
      (i % 3).toLong)).toDF("x1", "x2", "x3")
    val vi = Influence.vif3(ind, "x1", "x2", "x3").collect()(0)
    assert(vi.getAs[Double]("vif1_r") < 1.2, vi.toString)
  }

  test("ridgePath2: lambda 0 reproduces the standardized OLS; " +
      "coefficients shrink monotonically in lambda") {
    val rows = (0 to 99).map { i =>
      val x1 = i.toLong
      val x2 = ((i * 3) % 17).toLong
      (x1, x2, 5 * x1 + 2 * x2)
    }.toDF("x1", "x2", "y")
    val path = Influence.ridgePath2(rows, "x1", "x2", "y",
      Seq(0.0, 1.0, 5.0)).orderBy("lambda").collect()
    val l2 = path.map(_.getAs[Double]("l2_r"))
    assert(l2(0) > l2(1) && l2(1) > l2(2), l2.mkString(", "))
    // at lambda 0 the standardized fit of an exact linear y recovers
    // norm near the correlation structure's exact solution: b1 ~ r1y
    // direction, positive
    assert(path(0).getAs[Double]("b1_r") > 0.5)
  }
}
