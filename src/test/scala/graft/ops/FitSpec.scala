package graft.ops

import graft.SparkTestBase

/** Fit's closed forms must recover hand-computable models exactly: the
  * stump picks the textbook perfect split (and honors the
  * smallest-threshold tiebreak), OLS recovers exact planar
  * coefficients with R² = 1, and singular designs degrade to null. */
class FitSpec extends SparkTestBase {

  test("giniStump: perfectly separating threshold wins with gain = root") {
    import spark.implicits._
    // y = 1 iff v >= 3: split at v=2 is perfect. p = 1/2 → g0 = 0.5.
    val obs = Seq((1, 0), (2, 0), (3, 1), (4, 1))
      .map { case (v, y) => ("f", v.toLong, y) }
      .toDF("feature", "v", "y")
    val r = Fit.giniStump(obs, "feature", "v", "y").collect().head
    assert(r.getAs[Long]("split_value") == 2L)
    assert(r.getAs[Long]("n_left") == 2 && r.getAs[Long]("n_right") == 2)
    assert(r.getAs[Double]("gini_root_r") == 0.5)
    assert(r.getAs[Double]("gini_split_r") == 0.0)
    assert(r.getAs[Double]("gain_r") == 0.5)
  }

  test("giniStump: uninformative feature → zero gain, smallest v tiebreak") {
    import spark.implicits._
    // label independent of v: every split has gain 0 → tiebreak picks
    // the smallest candidate threshold
    val obs = Seq((1, 0), (1, 1), (2, 0), (2, 1), (3, 0), (3, 1))
      .map { case (v, y) => ("f", v.toLong, y) }
      .toDF("feature", "v", "y")
    val r = Fit.giniStump(obs, "feature", "v", "y").collect().head
    assert(r.getAs[Double]("gain_r") == 0.0)
    assert(r.getAs[Long]("split_value") == 1L)
  }

  test("giniStump: two features ranked independently in one pass") {
    import spark.implicits._
    val good = Seq((1, 0), (2, 0), (3, 1), (4, 1))
      .map { case (v, y) => ("good", v.toLong, y) }
    val bad = Seq((1, 0), (1, 1), (2, 0), (2, 1))
      .map { case (v, y) => ("bad", v.toLong, y) }
    val got = Fit.giniStump((good ++ bad).toDF("feature", "v", "y"),
        "feature", "v", "y")
      .collect().map(r => r.getAs[String]("feature") ->
        r.getAs[Double]("gain_r")).toMap
    assert(got("good") == 0.5 && got("bad") == 0.0)
  }

  test("featureHash: stable bucket/sign per token, counts scale, " +
      "dims bounded") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq((1L, Seq("a")), (2L, Seq("a", "a")), (3L, Seq("b")))
      .toDF("id", "toks")
    val got = Fit.featureHash(rows, "id", col("toks"), 8).collect()
    val byId = got.groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(r =>
        r.getInt(1) -> r.getLong(2)).toMap }
    // one token → one row; same token twice → same dim, doubled count
    assert(byId(1L).size == 1 && byId(2L).size == 1)
    val (dA, sA) = byId(1L).head
    assert(math.abs(sA) == 1)
    assert(byId(2L) == Map(dA -> 2 * sA))
    assert(got.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 8))
    // determinism: a second run is identical
    val again = Fit.featureHash(rows, "id", col("toks"), 8).collect()
    assert(got.map(_.toString).sorted.toSeq ==
      again.map(_.toString).sorted.toSeq)
  }

  test("ols2 recovers an exact plane: y = 7 + 3·x1 − 2·x2, R² = 1") {
    import spark.implicits._
    val pts = for (x1 <- 0L to 3L; x2 <- 0L to 3L)
      yield ("g", 7 + 3 * x1 - 2 * x2, x1, x2)
    val r = Fit.ols2(pts.toDF("grp", "y", "x1", "x2"),
      "grp", "y", "x1", "x2").collect().head
    assert(r.getAs[Double]("b0_r") == 7.0)
    assert(r.getAs[Double]("b1_r") == 3.0)
    assert(r.getAs[Double]("b2_r") == -2.0)
    assert(r.getAs[Double]("r2_r") == 1.0)
  }

  test("ols2: collinear design (x2 = 2·x1) → null coefficients") {
    import spark.implicits._
    val pts = (0L to 5L).map(x => ("g", x * 3 + 1, x, x * 2))
    val r = Fit.ols2(pts.toDF("grp", "y", "x1", "x2"),
      "grp", "y", "x1", "x2").collect().head
    assert(r.isNullAt(r.fieldIndex("b1_r")))
    assert(r.isNullAt(r.fieldIndex("r2_r")))
  }

  test("weibullMedianRank: two-point slope by hand; censored and " +
      "t<1 excluded; tie runs rank correctly") {
    import spark.implicits._
    def z(f: Double) = math.log(-math.log(1 - f))
    // n=2 at t = 1 and 3: F₁ = 0.7/2.4, F₂ = 1.7/2.4
    val k = (z(1.7 / 2.4) - z(0.7 / 2.4)) / math.log(3.0)
    val a = (z(0.7 / 2.4) + z(1.7 / 2.4) - k * math.log(3.0)) / 2
    val subj = Seq((1L, true), (3L, true), (5L, false), (0L, true))
      .toDF("t", "observed")
    val r = Fit.weibullMedianRank(subj, "t", "observed").collect().head
    assert(r.getAs[Long]("n") == 2)
    assert(math.abs(r.getAs[Double]("shape_r") - k) < 1e-5, r.toString)
    assert(math.abs(r.getAs[Double]("scale_days_r")
      - math.exp(-a / k)) < 1e-4, r.toString)
    assert(r.getAs[Double]("r2_r") == 1.0) // 2 points fit exactly
    // a tie run must consume consecutive ranks: 4 subjects at t=2,4
    // with duplicates — n=4, ranks 1..4 regardless of intra-tie order
    val ties = Seq((2L, true), (2L, true), (4L, true), (4L, true))
      .toDF("t", "observed")
    val tr = Fit.weibullMedianRank(ties, "t", "observed").collect().head
    assert(tr.getAs[Long]("n") == 4)
    assert(tr.getAs[Double]("shape_r") > 0)
  }

  test("powerlawAlpha: CSN closed form by hand; sub-xmin excluded") {
    import spark.implicits._
    val xs = Seq(5L, 10L, 20L, 3L, 1L) // 3 and 1 below xmin=5
    val sl = Seq(5L, 10L, 20L)
      .map(x => math.rint(math.log(x / 4.5) * 1e12) / 1e12).sum
    val want = 1.0 + 3.0 / sl
    val r = Fit.powerlawAlpha(xs.toDF("x"), "x", 5L).collect().head
    assert(r.getAs[Long]("n_tail") == 3)
    assert(math.abs(r.getAs[Double]("alpha_r") - want) < 1e-6)
    assert(math.abs(r.getAs[Double]("se_r")
      - (want - 1) / math.sqrt(3.0)) < 1e-6)
  }

  test("gpdExceedances: exact hand moments (z = 1,2,3)") {
    import spark.implicits._
    // m = 2, s² = 1 → m²/s² = 4 → ξ = −1.5, β = 5
    val r = Fit.gpdExceedances(
        Seq(11L, 12L, 13L, 9L, 10L).toDF("y"), "y", 10L)
      .collect().head
    assert(r.getAs[Long]("n_exceed") == 3)
    assert(r.getAs[Double]("mean_r") == 2.0)
    assert(r.getAs[Double]("xi_r") == -1.5)
    assert(r.getAs[Double]("beta_r") == 5.0)
  }

  test("psisKhat: uniform weights 1..100, top-20% tail — threshold is " +
      "the k-th largest, fit on strict exceedances, closed form") {
    import spark.implicits._
    val w = (1L to 100L).map(i => (i, i)).toDF("id", "w")
    val r = Fit.psisKhat(w, "w", "id", tailDenom = 5, bandWidth = 10.0)
      .collect()(0)
    assert(r.getAs[Long]("n_weights") == 100L)
    assert(r.getAs[Long]("u") == 81L) // k = 20 -> 20th largest
    assert(r.getAs[Long]("n_exceed") == 19L) // strict > 81
    // z = 1..19: mean 10, sample var 570/18
    assert(r.getAs[Double]("mean_r") == 10.0)
    val s2 = 570.0 / 18
    assert(math.abs(r.getAs[Double]("khat_r")
      - (1.0 - 100.0 / s2) / 2) < 1e-6)
    assert(math.abs(r.getAs[Double]("beta_r")
      - 10.0 * (1.0 + 100.0 / s2) / 2) < 1e-6)
  }
}
