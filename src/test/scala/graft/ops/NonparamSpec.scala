package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Nonparam's statistics against hand-computed classical values:
  * Kendall τ-b on perfect/tied orderings, Mann–Whitney U on the
  * rank-sum worked example, Jarque–Bera symmetric-case moments,
  * Durbin–Watson on residuals computed by hand, the textbook Friedman
  * two-block example (with an incomplete block excluded), λ/U at
  * perfect association and independence, and the Hodges–Lehmann Walsh
  * median. */
class NonparamSpec extends SparkTestBase {

  test("kendallTau: perfect concordance gives tau=1, somers=1") {
    import spark.implicits._
    val g = Seq((1L, 1L, 10L), (2L, 2L, 20L), (3L, 3L, 30L))
      .toDF("id", "x", "y")
    val r = Nonparam.kendallTau(g, "id", "x", "y").collect().head
    assert(r.getAs[Long]("n") == 3)
    assert(r.getAs[Long]("concordant") == 3)
    assert(r.getAs[Long]("discordant") == 0)
    assert(r.getAs[Double]("tau_b_r") == 1.0)
    assert(r.getAs[Double]("somers_d_r") == 1.0)
  }

  test("kendallTau: x-ties use tau-b denominators") {
    import spark.implicits._
    // pairs: (1,2) x-tie s=0; (1,3) concordant; (2,3) discordant
    val g = Seq((1L, 1L, 5L), (2L, 1L, 7L), (3L, 2L, 6L))
      .toDF("id", "x", "y")
    val r = Nonparam.kendallTau(g, "id", "x", "y").collect().head
    assert(r.getAs[Long]("concordant") == 1)
    assert(r.getAs[Long]("discordant") == 1)
    assert(r.getAs[Double]("tau_b_r") == 0.0)
    assert(r.getAs[Double]("somers_d_r") == 0.0)
  }

  test("mannWhitney: worked midrank example A=[1,2] B=[2,3]") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L))
      .toDF("g", "v")
    val r = Nonparam.mannWhitney(df, "v", "g", "a", "b")
      .collect().head
    // ranks of [1,2,2,3] are [1,2.5,2.5,4]; R_A=3.5, U_A=0.5 → u2=1
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Long]("u2") == 1)
    // sigma = sqrt(4/12·(5 − 6/12)) = sqrt(1.5); z = (−3+1)/(2σ)
    val z = -2.0 / (2 * math.sqrt(1.5))
    assert(math.abs(r.getAs[Double]("z_r") - z) < 1e-6)
    assert(r.getAs[Double]("cliffs_r") == -0.75)
  }

  test("jarqueBera: symmetric three-point case") {
    import spark.implicits._
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L)).toDF("grp", "c")
    val r = Nonparam.jarqueBera(df, "grp", "c").collect().head
    // m2=2/3, m3=0, m4=2/3 → skew 0, exkurt 1.5−3, JB = .5·(2.25/4)
    assert(r.getAs[Long]("n") == 3)
    assert(r.getAs[Double]("skew_r") == 0.0)
    assert(r.getAs[Double]("exkurt_r") == -1.5)
    assert(r.getAs[Double]("jb_r") == 0.28125)
  }

  test("durbinWatson: hand-computed residual chain; null on exact fit") {
    import spark.implicits._
    // y=[1,0,1,0] on t=0..3: b=−0.2, a=0.8, e=[.2,−.6,.6,−.2]
    // den=0.8, num=2.72 → DW=3.4
    val df = Seq((0L, 1L), (1L, 0L), (2L, 1L), (3L, 0L)).toDF("t", "y")
    val r = Nonparam.durbinWatson(df, "t", "y").collect().head
    assert(r.getAs[Long]("n_days") == 4)
    assert(r.getAs[Double]("slope_r") == -0.2)
    assert(r.getAs[Double]("dw_r") == 3.4)
    // perfect line → zero residuals → DW undefined (null)
    val lin = Seq((0L, 10L), (1L, 20L), (2L, 30L)).toDF("t", "y")
    val r2 = Nonparam.durbinWatson(lin, "t", "y").collect().head
    assert(r2.isNullAt(r2.fieldIndex("dw_r")))
  }

  test("friedman: textbook two-block example, incomplete block dropped") {
    import spark.implicits._
    val cells = Seq(
      (1L, "t1", 1L), (1L, "t2", 2L), (1L, "t3", 3L),
      (2L, "t1", 2L), (2L, "t2", 4L), (2L, "t3", 6L),
      (3L, "t1", 9L)) // incomplete block: must be excluded
      .toDF("blk", "treat", "y")
    val rows = Nonparam.friedman(cells, "blk", "treat", "y")
      .orderBy("treat").collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[Long]("n_blocks") == 2))
    assert(rows.map(_.getAs[Double]("mean_rank_r")).toSeq ==
      Seq(1.0, 2.0, 3.0))
    // R=[2,4,6], A=28, Cf=24, ss=8 → chi2 = 2·8/4 = 4
    assert(rows.forall(_.getAs[Double]("chi2_r") == 4.0))
  }

  test("assocMeasures: perfect association and independence") {
    import spark.implicits._
    val perfect = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"))
      .toDF("x", "y")
    val p = Nonparam.assocMeasures(perfect, "x", "y").collect().head
    assert(p.getAs[Double]("lambda_yx_r") == 1.0)
    assert(p.getAs[Double]("lambda_xy_r") == 1.0)
    assert(p.getAs[Double]("u_yx_r") == 1.0)
    assert(p.getAs[Double]("u_xy_r") == 1.0)
    val indep = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"))
      .toDF("x", "y")
    val i = Nonparam.assocMeasures(indep, "x", "y").collect().head
    assert(i.getAs[Double]("lambda_yx_r") == 0.0)
    assert(i.getAs[Double]("u_yx_r") == 0.0)
    assert(i.getAs[Double]("u_xy_r") == 0.0)
  }

  test("hodgesLehmann: Walsh-average median of [1,2,4]") {
    import spark.implicits._
    val g = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 4L))
      .toDF("grp", "id", "x")
    val r = Nonparam.hodgesLehmann(g, "grp", "id", "x").collect().head
    // walsh = [1, 1.5, 2, 2.5, 3, 4] → median (2+2.5)/2 = 2.25
    assert(r.getAs[Long]("n_pairs") == 6)
    assert(r.getAs[Double]("hl_r") == 2.25)
  }

  test("exponentialityKs: constant gaps give the hand D at the step") {
    import spark.implicits._
    // one user, events every second: gaps (1, 1, 1) s → λ̂ = 1;
    // at x=1 the ECDF jumps 0→1, CDF(1)=1−e⁻¹: D = max(1−e⁻¹ − 0,
    // 1 − (1−e⁻¹)) = 0.632121
    val ev = Seq((1L, 10L, 0L), (1L, 11L, 1000000L),
      (1L, 12L, 2000000L), (1L, 13L, 3000000L))
      .toDF("user_id", "event_id", "us")
      .select(col("user_id"), col("event_id"),
        org.apache.spark.sql.functions.expr("timestamp_micros(us)")
          .as("ts"))
    val r = Nonparam.exponentialityKs(ev, "user_id", "ts", "event_id")
      .collect().head
    assert(r.getAs[Long]("n_gaps") == 3)
    assert(r.getAs[Double]("mean_gap_s_r") == 1.0)
    assert(r.getAs[Double]("d_ks_r") == 0.632121)
  }

  test("wilcoxonSignedRank: untied hand case (zero diff excluded), " +
      "tied midranks, all-zero null") {
    import spark.implicits._
    // diffs 1, 2, 3, -4, 0 -> ranks of |d| are 1..4, W+ = 6, E = 5,
    // Var = 7.5; doubled num = 2, cc -> z = 1/(2 sqrt 7.5)
    val d1 = Seq(1L, 2L, 3L, -4L, 0L).toDF("d")
    val r1 = Nonparam.wilcoxonSignedRank(d1, "d").collect()(0)
    assert(r1.getAs[Long]("n") == 4L)
    assert(r1.getAs[Long]("w2_plus") == 12L)
    assert(math.abs(r1.getAs[Double]("z_r")
      - 1.0 / (2 * math.sqrt(7.5))) < 1e-6)
    assert(r1.getAs[Double]("rank_biserial_r") == 0.2)
    // ties: 1, -1, 2 -> |1| block midrank 1.5 (doubled 3), |2| rank 3
    // (doubled 6): W2+ = 9, E2 = 6, T = 6 -> Var(W+) = 81/24
    val d2 = Seq(1L, -1L, 2L).toDF("d")
    val r2 = Nonparam.wilcoxonSignedRank(d2, "d").collect()(0)
    assert(r2.getAs[Long]("w2_plus") == 9L)
    assert(math.abs(r2.getAs[Double]("z_r")
      - 2.0 / (2 * math.sqrt(81.0 / 24))) < 1e-6)
    // all-zero diffs: no test possible -> null z
    val d3 = Seq(0L, 0L).toDF("d")
    val r3 = Nonparam.wilcoxonSignedRank(d3, "d").collect()(0)
    assert(r3.isNullAt(r3.fieldIndex("z_r")))
  }

  test("turningPoints: strict extrema counted, ties are not turns, " +
      "hand z") {
    import spark.implicits._
    // 1 3 2 4 4 5: turns at t=1 (peak) and t=2 (trough); the 4,4
    // plateau produces none
    val df = Seq((0L, 1L), (1L, 3L), (2L, 2L), (3L, 4L), (4L, 4L),
      (5L, 5L)).toDF("t", "y")
    val r = Nonparam.turningPoints(df, "t", "y").collect()(0)
    assert(r.getAs[Long]("n_days") == 6L)
    assert(r.getAs[Long]("n_turns") == 2L)
    val e = 2.0 * 4 / 3
    assert(math.abs(r.getAs[Double]("z_r")
      - (2 - e) / math.sqrt((16.0 * 6 - 29) / 90)) < 1e-6)
  }

  test("hellingerPairs: identical -> H = 0, disjoint -> H = 1 (the " +
      "pair row must exist), half-overlap hand case") {
    import spark.implicits._
    val df = Seq(
      ("a", 10L), ("a", 110L), ("b", 15L), ("b", 115L), // identical bins
      ("c", 210L), ("c", 310L), // disjoint from a and b
      ("d", 10L), ("d", 210L)) // half-overlaps a and c
      .toDF("g", "v")
    val got = Nonparam.hellingerPairs(df, "g", "v", bandCents = 100L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got.size == 6, "all C(4,2) pairs must surface")
    assert(got(("a", "b")).getAs[Double]("bc_r") == 1.0)
    assert(got(("a", "b")).getAs[Double]("hellinger_r") == 0.0)
    assert(got(("a", "c")).getAs[Double]("bc_r") == 0.0)
    assert(got(("a", "c")).getAs[Double]("hellinger_r") == 1.0)
    // a = {0: .5, 1: .5}, d = {0: .5, 2: .5}: BC = sqrt(.25) = .5
    assert(got(("a", "d")).getAs[Double]("bc_r") == 0.5)
    assert(math.abs(got(("a", "d")).getAs[Double]("hellinger_r")
      - math.sqrt(0.5)) < 1e-6)
  }

  test("wasserstein1d: pure shift moves exactly the shift distance; " +
      "identical samples give zero") {
    import spark.implicits._
    // B is A shifted by +100: W1 = 100 exactly
    val df = Seq(("a", 0L), ("a", 100L), ("b", 100L), ("b", 200L))
      .toDF("g", "v")
    val r = Nonparam.wasserstein1d(df, "v", "g", "a", "b", 16.0)
      .collect().head
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Double]("w1_r") == 100.0, r.toString)
    val same = Seq(("a", 5L), ("a", 9L), ("b", 5L), ("b", 9L))
      .toDF("g", "v")
    val s = Nonparam.wasserstein1d(same, "v", "g", "a", "b", 16.0)
      .collect().head
    assert(s.getAs[Double]("w1_r") == 0.0)
  }

  test("cramerVonMises: identical samples give 0; hand disjoint " +
      "singletons give 1/4") {
    import spark.implicits._
    val same = Seq(("a", 5L), ("a", 9L), ("b", 5L), ("b", 9L))
      .toDF("g", "v")
    val s = Nonparam.cramerVonMises(same, "v", "g", "a", "b", 16.0)
      .collect().head
    assert(s.getAs[Double]("t_r") == 0.0)
    // A = {0}, B = {100}: at v=0 F_A−F_B = 1 (pooled count 1), at
    // v=100 the gap closes → Σ = 1, T = (1·1/2²)·1 = 0.25
    val dis = Seq(("a", 0L), ("b", 100L)).toDF("g", "v")
    val d = Nonparam.cramerVonMises(dis, "v", "g", "a", "b", 16.0)
      .collect().head
    assert(d.getAs[Double]("t_r") == 0.25, d.toString)
  }

  test("mmdRbf: identical point sets give mmd2 ~ 0; well-separated " +
      "clusters give mmd2 > 0") {
    import spark.implicits._
    // same 3 points under both labels -> distributions identical
    val pts = Seq(Array(0.0f, 0.0f), Array(1.0f, 0.0f),
      Array(0.0f, 1.0f))
    val same = (pts.zipWithIndex.map { case (e, i) => (i.toLong, e, 0) }
      ++ pts.zipWithIndex.map { case (e, i) => (i + 10L, e, 1) })
      .toDF("vec_id", "embedding", "label")
    val r = Nonparam.mmdRbf(same, "label", 0, 1, 0.5).collect().head
    assert(r.getAs[Long]("m") == 3 && r.getAs[Long]("n") == 3)
    // unbiased estimator on identical sets: within-sums exclude the
    // diagonal but cross-sums include the k=1 self-matches, so the
    // statistic is slightly NEGATIVE (the known signature of
    // identical samples under MMD2_u) - near zero from above is a bug
    assert(r.getAs[Double]("mmd2_r") <= 0.0, r.toString)
    assert(math.abs(r.getAs[Double]("mmd2_r")) < 0.35)
    // two far clusters: kab ~ 0, mmd2 strongly positive
    val far = (pts.zipWithIndex.map { case (e, i) => (i.toLong, e, 0) }
      ++ pts.zipWithIndex.map { case (e, i) =>
        (i + 10L, e.map(_ + 100.0f), 1) })
      .toDF("vec_id", "embedding", "label")
    val r2 = Nonparam.mmdRbf(far, "label", 0, 1, 0.5).collect().head
    assert(r2.getAs[Double]("kab_r") == 0.0)
    assert(r2.getAs[Double]("mmd2_r") > 0.5, r2.toString)
  }

  test("adExponentiality: closed-form rank weights on a hand gap set " +
      "match the direct order-statistic formula; zero gaps excluded") {
    import spark.implicits._
    import java.sql.Timestamp
    // one user, events at 0s, 1s, 3s, 7s, 7s -> gaps 1s, 2s, 4s, 0s
    // (the zero gap must be excluded; n = 3)
    val ev = Seq(0L, 1000000L, 3000000L, 7000000L, 7000000L)
      .zipWithIndex.map { case (us, i) =>
        (1L, i.toLong, new Timestamp(us / 1000)) }
      .toDF("user_id", "event_id", "ts")
    val r = Nonparam.adExponentiality(ev, "user_id", "ts", "event_id")
      .collect().head
    assert(r.getAs[Long]("n_gaps") == 3)
    // lambda = 3 / 7s
    assert(r.getAs[Double]("lambda_per_s_r") == 0.428571)
    // direct computation: x = (1,2,4), F = 1 - exp(-lam x)
    val lam = 3.0 / 7.0
    val xs = Seq(1.0, 2.0, 4.0)
    def rnd12(v: Double) = BigDecimal(v)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val t1 = xs.zipWithIndex.map { case (x, i) =>
      rnd12((2 * (i + 1) - 1) * math.log(1 - math.exp(-rnd12(lam * x)))) }
    val t2 = xs.zipWithIndex.map { case (x, i) =>
      rnd12((2 * (3 - (i + 1)) + 1) * (-lam * x)) }
    val a2 = -3.0 - (t1.sum + t2.sum) / 3.0
    assert(math.abs(r.getAs[Double]("a2_r") - a2) < 5e-6, r.toString)
  }
}
