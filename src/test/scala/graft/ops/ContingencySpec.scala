package graft.ops

import graft.SparkTestBase

/** Hand cases for the contingency-grid batch: χ² effect sizes,
  * Pearson residuals, G², Goodman–Kruskal γ, IPF raking. */
class ContingencySpec extends SparkTestBase {
  import spark.implicits._

  private def rep(n: Int, x: Long, y: Long): Seq[(Long, Long)] =
    Seq.fill(n)((x, y))

  test("chiSquareGrid: an exactly independent 2×2 gives chi2 = V = 0; " +
      "a diagonal 2×2 gives V = 1") {
    val indep = (rep(10, 0, 0) ++ rep(10, 0, 1) ++ rep(10, 1, 0)
      ++ rep(10, 1, 1)).toDF("x", "y")
    val r1 = Contingency.chiSquareGrid(indep, "x", "y").collect()(0)
    assert(r1.getAs[Double]("chi2_r") == 0.0, r1.toString)
    assert(r1.getAs[Double]("v_r") == 0.0, r1.toString)
    assert(r1.getAs[Long]("dof") == 1L, r1.toString)
    // perfect association: χ² = n, V = T = 1, C = √(1/2)
    val diag = (rep(12, 0, 0) ++ rep(12, 1, 1)).toDF("x", "y")
    val r2 = Contingency.chiSquareGrid(diag, "x", "y").collect()(0)
    assert(r2.getAs[Double]("chi2_r") == 24.0, r2.toString)
    assert(r2.getAs[Double]("v_r") == 1.0, r2.toString)
    assert(math.abs(r2.getAs[Double]("c_r") - math.sqrt(0.5)) < 1e-6,
      r2.toString)
  }

  test("pearsonResiduals: diagonal cells positive, off-diagonal " +
      "negative, zero-filled cells present") {
    val diag = (rep(8, 0, 0) ++ rep(8, 1, 1) ++ rep(2, 0, 1))
      .toDF("x", "y")
    val rows = Contingency.pearsonResiduals(diag, "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(rows.size == 4) // the (1,0) cell is zero-filled in
    assert(rows((1L, 0L)).getAs[Long]("n_xy") == 0L)
    assert(rows((0L, 0L)).getAs[Double]("resid_r") > 0)
    assert(rows((1L, 1L)).getAs[Double]("resid_r") > 0)
    assert(rows((1L, 0L)).getAs[Double]("resid_r") < 0)
  }

  test("gSquare: independence gives G² = 0 and negative ΔAIC; " +
      "association gives G² > 0") {
    val indep = (rep(10, 0, 0) ++ rep(10, 0, 1) ++ rep(10, 1, 0)
      ++ rep(10, 1, 1)).toDF("x", "y")
    val r1 = Contingency.gSquare(indep, "x", "y").collect()(0)
    assert(r1.getAs[Double]("g2_r") == 0.0, r1.toString)
    assert(r1.getAs[Double]("aic_delta_r") == -2.0, r1.toString)
    val diag = (rep(12, 0, 0) ++ rep(12, 1, 1)).toDF("x", "y")
    val r2 = Contingency.gSquare(diag, "x", "y").collect()(0)
    // G² = 2·Σ o·ln(o/e) = 2·24·ln(2) for the pure diagonal
    assert(math.abs(r2.getAs[Double]("g2_r") - 48.0 * math.log(2.0))
      < 1e-5, r2.toString)
  }

  test("gkGamma: perfect ordinal agreement gives γ = 1, reversal −1, " +
      "and the hand pair counts match") {
    val pos = (rep(3, 0, 0) ++ rep(4, 1, 1) ++ rep(5, 2, 2))
      .toDF("x", "y")
    val r1 = Contingency.gkGamma(pos, "x", "y").collect()(0)
    // concordant = 3·4 + 3·5 + 4·5 = 47, discordant = 0
    assert(r1.getAs[java.math.BigDecimal]("concordant").longValue == 47L,
      r1.toString)
    assert(r1.getAs[Double]("gamma_r") == 1.0, r1.toString)
    val neg = (rep(3, 0, 2) ++ rep(4, 1, 1) ++ rep(5, 2, 0))
      .toDF("x", "y")
    val r2 = Contingency.gkGamma(neg, "x", "y").collect()(0)
    assert(r2.getAs[Double]("gamma_r") == -1.0, r2.toString)
  }

  test("ipfRaking: fitted margins hit the uniform targets, zero " +
      "cells stay zero, and the fitted total is preserved") {
    // skewed 2×2 with one structural zero
    val df = (rep(30, 0, 0) ++ rep(10, 0, 1) ++ rep(20, 1, 1))
      .toDF("x", "y")
    val out = Contingency.ipfRaking(df, "x", "y", iters = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("fitted_r"))
      .toMap
    assert(out((1L, 0L)) == 0.0, out.toString) // IPF zero invariant
    val n = 60.0
    // row sums → n/2 each after convergence (col margin last, so col
    // sums are exact; row sums approach the target)
    val col0 = out((0L, 0L)) + out((1L, 0L))
    val col1 = out((0L, 1L)) + out((1L, 1L))
    assert(math.abs(col0 - n / 2) < 1e-6, s"col0=$col0")
    assert(math.abs(col1 - n / 2) < 1e-6, s"col1=$col1")
    // the structural zero makes row convergence linear (the 2×2 with
    // a zero has no exact-margin table reachable in finite sweeps);
    // after 8 sweeps the stray mass is ~1.6 and shrinking
    val row0 = out((0L, 0L)) + out((0L, 1L))
    assert(math.abs(row0 - n / 2) < 2.0, s"row0=$row0")
  }

  test("ipfRaking: empty input returns an empty frame with the " +
      "contract schema instead of throwing") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    val out = Contingency.ipfRaking(empty, "x", "y")
    assert(out.columns.toSeq == Seq("x", "y", "n_xy", "fitted_r"))
    assert(out.count() == 0)
  }

  test("ipfRaking: the conf-gated grid cap fails loudly on an " +
      "over-cap key space (driver-OOM guard)") {
    import spark.implicits._
    val df = (rep(3, 0, 0) ++ rep(3, 0, 1) ++ rep(3, 1, 0)
      ++ rep(3, 1, 1)).toDF("x", "y")
    spark.conf.set("spark.graft.driverLocal.gridCap", "2")
    try {
      val e = intercept[IllegalArgumentException] {
        Contingency.ipfRaking(df, "x", "y")
      }
      assert(e.getMessage.contains("driver-local"), e.getMessage)
    } finally spark.conf.unset("spark.graft.driverLocal.gridCap")
  }
}
