package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Infer's statistics must match hand-computed classical values: the
  * A&S normal CDF against known Φ points, Welch's t against a worked
  * two-sample example, and BH step-up against the textbook
  * reject-all-below-k* behavior (including the case where a later p
  * passes while an earlier one fails). */
class InferSpec extends SparkTestBase {

  test("normalCdf matches known Φ values to 1e-6") {
    import spark.implicits._
    val pts = Seq(
      0.0 -> 0.5,
      1.0 -> 0.8413447,
      -1.0 -> 0.1586553,
      1.959964 -> 0.975,
      -2.575829 -> 0.005,
      3.0 -> 0.9986501)
    val got = pts.map(_._1).toDF("z")
      .select(col("z"), Infer.normalCdf(col("z")).as("phi"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    for ((z, want) <- pts)
      assert(math.abs(got(z) - want) < 1e-6, s"Phi($z)")
  }

  test("welchTTest: hand-computed two-sample case") {
    import spark.implicits._
    // arm A: 1,2,3,4,5 (mean 3, var 2.5); arm B: 6,7,8,9 (mean 7.5,
    // var 5/3). se2 = 2.5/5 + (5/3)/4 = 0.9166667, t = 4.5/sqrt(se2)
    val df = (Seq(1, 2, 3, 4, 5).map(v => ("g", false, v.toLong)) ++
      Seq(6, 7, 8, 9).map(v => ("g", true, v.toLong)))
      .toDF("grp", "armb", "v")
    val r = Infer.welchTTest(df, "grp", col("armb"), col("v"))
      .collect().head
    assert(r.getAs[Long]("n_a") == 5 && r.getAs[Long]("n_b") == 4)
    assert(r.getAs[Double]("mean_a_r") == 3.0)
    assert(r.getAs[Double]("mean_b_r") == 7.5)
    val se2 = 2.5 / 5 + (5.0 / 3) / 4
    assert(math.abs(r.getAs[Double]("t_r") - 4.5 / math.sqrt(se2)) < 1e-6)
    // Welch–Satterthwaite: se2² / ((.5)²/4 + (.4166667)²/3)
    val dfw = se2 * se2 /
      (0.25 / 4 + (5.0 / 3 / 4) * (5.0 / 3 / 4) / 3)
    assert(math.abs(r.getAs[Double]("df_r") - dfw) < 1e-5)
    // two-sided normal p for t≈4.7: tiny but positive
    val p = r.getAs[Double]("p_r")
    assert(p > 0 && p < 1e-4)
  }

  test("welchTTest: degenerate arms yield null t/p, not NaN") {
    import spark.implicits._
    val df = Seq(("g", false, 1L), ("g", false, 2L), ("g", true, 5L))
      .toDF("grp", "armb", "v")
    val r = Infer.welchTTest(df, "grp", col("armb"), col("v"))
      .collect().head
    assert(r.isNullAt(r.fieldIndex("t_r")))
    assert(r.isNullAt(r.fieldIndex("p_r")))
    assert(r.getAs[Double]("mean_b_r") == 5.0)
  }

  test("bhFdr: step-up rejects everything at/below the LAST passing rank") {
    import spark.implicits._
    // m=5, α=0.25: thresholds .05 .10 .15 .20 .25.
    // p = .01, .12(>.10 fails), .13(≤.15 passes!), .22, .9
    // k* = 4? p_(4)=.22 > .20 fails → k* = 3; discoveries = ranks 1..3
    // — including the rank-2 p that itself failed its threshold.
    val hyp = Seq(("a", 0.01), ("b", 0.12), ("c", 0.13), ("d", 0.22),
      ("e", 0.9)).toDF("id", "p")
    val got = Infer.bhFdr(hyp, "p", "id", 0.25)
      .collect().map(r => r.getAs[String]("id") ->
        (r.getAs[Int]("bh_rank"), r.getAs[Boolean]("discovery"))).toMap
    assert(got("a") == (1, true))
    assert(got("b") == (2, true))
    assert(got("c") == (3, true))
    assert(got("d") == (4, false))
    assert(got("e") == (5, false))
  }

  test("brierDecomposition: perfect forecasts → BS=REL=0, RES=UNC; " +
      "constant 0.5 on balanced labels → BS=UNC=0.25, REL=RES=0") {
    import spark.implicits._
    // perfect: p = y exactly (0.95 binned high, 0.05 low would leave
    // REL>0 — use 1.0/0.0 for the clean identity)
    val perfect = (Seq.fill(10)((1.0, true)) ++
      Seq.fill(10)((0.0, false))).toDF("p", "y")
    val g1 = Infer.brierDecomposition(perfect, "p", col("y"), 10)
      .collect().head
    assert(g1.getAs[Double]("brier_r") == 0.0)
    assert(g1.getAs[Double]("rel_r") == 0.0)
    assert(g1.getAs[Double]("res_r") == 0.25) // ō_b ∈ {0,1}, ō = .5
    assert(g1.getAs[Double]("unc_r") == 0.25)
    val constant = (Seq.fill(10)((0.5, true)) ++
      Seq.fill(10)((0.5, false))).toDF("p", "y")
    val g2 = Infer.brierDecomposition(constant, "p", col("y"), 10)
      .collect().head
    assert(g2.getAs[Double]("brier_r") == 0.25)
    assert(g2.getAs[Double]("rel_r") == 0.0)
    assert(g2.getAs[Double]("res_r") == 0.0)
    assert(g2.getAs[Double]("unc_r") == 0.25)
    assert(g2.getAs[Long]("n_bins") == 1)
  }

  test("sprtDaily: evidence accumulates in day order and crosses the " +
      "Wald boundary exactly when the hand-computed LLR does") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // p0=0.2, p1=0.8 → llr/day = (2k−n)·ln4; upper = ln 19 ≈ 2.944
    // d1: 2/2 → cum 2.773 (continue); d2: 2/2 → 5.545 (accept_h1);
    // d3: 0/2 → back to 2.773 (continue — state AT each day)
    val ev = Seq(
      ("2024-01-01", true), ("2024-01-01", true),
      ("2024-01-02", true), ("2024-01-02", true),
      ("2024-01-03", false), ("2024-01-03", false))
      .map { case (d, ok) => (t(d + " 10:00:00"), ok) }
      .toDF("ts", "ok")
    val got = Infer.sprtDaily(ev, "ts", col("ok"), 0.2, 0.8, 0.05, 0.05)
      .orderBy("day").collect()
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val step = 2 * math.log(0.8 / 0.2)
    assert(got.map(_.getAs[String]("decision")).toSeq ==
      Seq("continue", "accept_h1", "continue"))
    assert(got(0).getAs[Double]("cum_llr_r") == r6(step))
    assert(got(1).getAs[Double]("cum_llr_r") == r6(step + step))
    assert(got(2).getAs[Double]("cum_llr_r") == r6(step))
  }

  test("ebShrinkage: hand MoM fit — small segments pull to the mean; " +
      "identical rates give null shrinkage (v = 0)") {
    import spark.implicits._
    // A: 5/10, B: 1/10 → m=.3, v=.04, prec=4.25, α=1.275, β=2.975
    val units = ((1 to 10).map(i => ("A", i <= 5)) ++
      (1 to 10).map(i => ("B", i <= 1))).toDF("seg", "ok")
    val got = Infer.ebShrinkage(units, "seg", col("ok"))
      .collect().map(r => r.getString(0) -> r).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got("A").getAs[Double]("alpha_r") == r6(1.275))
    assert(got("A").getAs[Double]("beta_r") == r6(2.975))
    assert(got("A").getAs[Double]("shrunk_r") == r6(6.275 / 14.25))
    assert(got("B").getAs[Double]("shrunk_r") == r6(2.275 / 14.25))
    // shrunken rates sit strictly between the raw rate and m = .3
    assert(got("A").getAs[Double]("shrunk_r") < 0.5 &&
      got("A").getAs[Double]("shrunk_r") > 0.3)
    val same = ((1 to 4).map(i => ("A", i <= 2)) ++
      (1 to 4).map(i => ("B", i <= 2))).toDF("seg", "ok")
    val g2 = Infer.ebShrinkage(same, "seg", col("ok")).collect().head
    assert(g2.isNullAt(g2.fieldIndex("shrunk_r")))
    assert(g2.getAs[Double]("rate_r") == 0.5)
  }

  test("wilsonInterval: 5/10 at 95% — symmetric around 0.5, textbook " +
      "bounds") {
    import spark.implicits._
    val units = (1 to 10).map(i => ("g", i <= 5)).toDF("grp", "ok")
    val r = Infer.wilsonInterval(units, "grp", col("ok"))
      .collect().head
    assert(r.getAs[Long]("n") == 10 && r.getAs[Long]("k") == 5)
    assert(r.getAs[Double]("rate_r") == 0.5)
    // p̂ = .5 makes the center exactly .5; half-width by hand
    val z = 1.959964; val z2 = z * z
    val half = z * math.sqrt(0.5 * 0.5 / 10 + z2 / 400) / (1 + z2 / 10)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(r.getAs[Double]("lo_r") == r6(0.5 - half))
    assert(r.getAs[Double]("hi_r") == r6(0.5 + half))
    assert(r.getAs[Double]("lo_r") == 0.236593, "textbook 5/10 bound")
  }

  test("wilsonInterval: extreme rates stay inside [0, 1]") {
    import spark.implicits._
    val units = (1 to 20).map(i => ("g", true)).toDF("grp", "ok")
    val r = Infer.wilsonInterval(units, "grp", col("ok"))
      .collect().head
    assert(r.getAs[Double]("rate_r") == 1.0)
    assert(r.getAs[Double]("hi_r") == 1.0)
    assert(r.getAs[Double]("lo_r") > 0.8 && r.getAs[Double]("lo_r") < 1.0)
  }

  test("bhFdr: no p passes → zero discoveries (null k* coalesced)") {
    import spark.implicits._
    val hyp = Seq(("a", 0.5), ("b", 0.9)).toDF("id", "p")
    val got = Infer.bhFdr(hyp, "p", "id", 0.05).collect()
    assert(got.forall(!_.getAs[Boolean]("discovery")))
  }

  test("pavIsotonic: adjacent violation pools to the weighted mean; " +
      "monotone input unchanged; total violation pools everything") {
    import spark.implicits._
    def iso(rows: Seq[(Long, Long, Long)]): Seq[(Long, Double)] =
      Infer.pavIsotonic(rows.toDF("bin", "n", "k"), "bin", "n", "k")
        .orderBy("bin").collect()
        .map(r => r.getAs[Long]("bin") -> r.getAs[Double]("iso_rate_r"))
        .toSeq
    // rates (.2, .6, .4): bins 2-3 pool to (6+4)/(10+10) = .5
    assert(iso(Seq((1L, 10L, 2L), (2L, 10L, 6L), (3L, 10L, 4L)))
      == Seq(1L -> 0.2, 2L -> 0.5, 3L -> 0.5))
    // already monotone → PAV is the identity on the rates
    assert(iso(Seq((1L, 10L, 1L), (2L, 10L, 5L), (3L, 10L, 9L)))
      == Seq(1L -> 0.1, 2L -> 0.5, 3L -> 0.9))
    // strictly decreasing → one pool at the global rate, weights honored
    assert(iso(Seq((1L, 10L, 9L), (2L, 30L, 15L), (3L, 10L, 1L)))
      == Seq(1L -> 0.5, 2L -> 0.5, 3L -> 0.5))
    // single bin → the fit IS the rate
    assert(iso(Seq((7L, 4L, 3L))) == Seq(7L -> 0.75))
  }

  test("oneWayAnova: perfect separation → eta2 1 / F null (SSW 0); " +
      "identical cells → eta2 0, F 0") {
    import spark.implicits._
    def anova(rows: Seq[(String, Int, Long)]) =
      Infer.oneWayAnova(rows.toDF("g", "c", "x"), "g", "c", "x")
        .collect().map(r => r.getString(0) -> r).toMap
    // cells (1,1) vs (3,3): all variance is between → eta2 = 1, SSW = 0
    val sep = anova(Seq(("g", 1, 1L), ("g", 1, 1L), ("g", 2, 3L),
      ("g", 2, 3L)))("g")
    assert(sep.getAs[Long]("n") == 4 && sep.getAs[Long]("k") == 2)
    assert(sep.getAs[Double]("eta2_r") == 1.0)
    assert(sep.isNullAt(sep.fieldIndex("f_r")), "SSW=0 -> F undefined")
    // cells (1,3) vs (1,3): no between-variance → eta2 = 0, F = 0
    val same = anova(Seq(("g", 1, 1L), ("g", 1, 3L), ("g", 2, 1L),
      ("g", 2, 3L)))("g")
    assert(same.getAs[Double]("eta2_r") == 0.0)
    assert(same.getAs[Double]("f_r") == 0.0)
  }

  test("kruskalWallis: hand H on untied cells; all-tied group → null " +
      "(divisor 0)") {
    import spark.implicits._
    def kw(rows: Seq[(String, Int, Long)]) =
      Infer.kruskalWallis(rows.toDF("g", "c", "x"), "g", "c", "x")
        .collect().map(r => r.getString(0) -> r).toMap
    // cells {1,2} vs {3,4}: ranks 1..4, R_A=3, R_B=7 →
    // H = 12/20·(9/2 + 49/2) − 15 = 2.4; no ties → divisor 1
    val sep = kw(Seq(("g", 1, 1L), ("g", 1, 2L), ("g", 2, 3L),
      ("g", 2, 4L)))("g")
    assert(sep.getAs[Long]("n") == 4 && sep.getAs[Long]("k") == 2)
    assert(sep.getAs[Double]("h_r") == 2.4)
    // every value identical → tie sum = n³−n → divisor 0 → null H
    val tied = kw(Seq(("g", 1, 5L), ("g", 1, 5L), ("g", 2, 5L),
      ("g", 2, 5L)))("g")
    assert(tied.isNullAt(tied.fieldIndex("h_r")))
    // midranks: {1,1} vs {2,2} — ranks (1.5,1.5,3.5,3.5), R_A=3, R_B=7
    // → same raw H; ties: 2·(2³−2)=12, divisor 1−12/60=0.8 → H=3.0
    val mid = kw(Seq(("g", 1, 1L), ("g", 1, 1L), ("g", 2, 2L),
      ("g", 2, 2L)))("g")
    assert(mid.getAs[Double]("h_r") == 3.0, mid.toString)
  }

  test("cochranQ: k=2 reduces to McNemar's uncorrected chi2; hand Q for " +
      "k=3; all-agree group → null (denominator 0)") {
    import spark.implicits._
    // same fixture as the mcnemar test: b=3, c=1 → Q = (3−1)²/4 = 1.0
    val two = Seq.fill(3)(("g", true, false)) ++ Seq(("g", false, true)) ++
      Seq.fill(4)(("g", true, true)) ++ Seq.fill(2)(("g", false, false))
    val q2 = Infer.cochranQ(two.toDF("grp", "a", "b"), "grp",
        Seq(col("a"), col("b"))).collect().head
    assert(q2.getAs[Double]("q_r") == 1.0)
    // k=3 hand case: G=(3,3,1), T=7, ΣG²=19, ΣL²=15 →
    // Q = 2·(3·19−49)/(21−15) = 16/6 = 2.666667
    val three = Seq(("g", true, true, false), ("g", true, false, false),
      ("g", true, true, true), ("g", false, true, false))
    val q3 = Infer.cochranQ(three.toDF("grp", "a", "b", "c"), "grp",
        Seq(col("a"), col("b"), col("c"))).collect().head
    assert(q3.getAs[Long]("g1") == 3 && q3.getAs[Long]("g3") == 1)
    assert(q3.getAs[Double]("q_r") == 2.666667)
    // every unit all-right or all-wrong → k·T = ΣL² → null
    val flat = Seq(("g", true, true, true), ("g", false, false, false))
    val qf = Infer.cochranQ(flat.toDF("grp", "a", "b", "c"), "grp",
        Seq(col("a"), col("b"), col("c"))).collect().head
    assert(qf.isNullAt(qf.fieldIndex("q_r")))
  }

  test("mcnemar: discordant-pair counts, chi2 and continuity-corrected " +
      "form from hand counts; never-disagree group yields null chi2") {
    import spark.implicits._
    // group g: b=3 (A right/B wrong), c=1, 4 both-right, 2 both-wrong
    val g = Seq.fill(3)(("g", true, false)) ++ Seq(("g", false, true)) ++
      Seq.fill(4)(("g", true, true)) ++ Seq.fill(2)(("g", false, false))
    // group h: models always agree -> b = c = 0
    val h = Seq(("h", true, true), ("h", false, false))
    val got = Infer.mcnemar((g ++ h).toDF("grp", "ac", "bc"),
        "grp", col("ac"), col("bc"))
      .collect().map(r => r.getString(0) -> r).toMap
    val rg = got("g")
    assert(rg.getAs[Long]("n") == 10 && rg.getAs[Long]("b_disc") == 3
      && rg.getAs[Long]("c_disc") == 1)
    assert(rg.getAs[Double]("chi2_r") == 1.0) // (3-1)^2 / 4
    assert(rg.getAs[Double]("chi2_cc_r") == 0.25) // (|2|-1)^2 / 4
    val rh = got("h")
    assert(rh.isNullAt(rh.fieldIndex("chi2_r"))
      && rh.isNullAt(rh.fieldIndex("chi2_cc_r")))
  }

  test("bartlett: equal variances give 0, hand unequal case") {
    import spark.implicits._
    val eq = Seq(1L, 2L, 3L).flatMap(v =>
      Seq(("g", "a", v), ("g", "b", v)))
      .toDF("grp", "cell", "v")
    val r0 = Infer.bartlett(eq, "grp", "cell", "v").collect().head
    assert(r0.getAs[Double]("chi2_r") == 0.0)
    // cell a: [0,4] s²=8; cell b: [1,3] s²=2 → N=4, k=2, Sp²=5,
    // χ² = (2·ln5 − (ln8+ln2)) / (1 + (2 − 1/2)/3) = 0.446287/1.5
    val un = Seq(("g", "a", 0L), ("g", "a", 4L),
      ("g", "b", 1L), ("g", "b", 3L)).toDF("grp", "cell", "v")
    val r1 = Infer.bartlett(un, "grp", "cell", "v").collect().head
    val want = (2 * math.log(5) - (math.log(8) + math.log(2))) / 1.5
    assert(math.abs(r1.getAs[Double]("chi2_r") - want) < 1e-6)
  }

  test("icc1: zero within-variance gives ICC=1") {
    import spark.implicits._
    val df = Seq(("g", "a", 2L), ("g", "a", 2L),
      ("g", "b", 4L), ("g", "b", 4L)).toDF("grp", "cell", "v")
    val r = Infer.icc1(df, "grp", "cell", "v").collect().head
    assert(r.getAs[Double]("n0_r") == 2.0)
    assert(r.getAs[Double]("icc_r") == 1.0)
  }

  test("cronbachAlpha: perfectly correlated items → 1; constant total → null") {
    import spark.implicits._
    val corr = Seq((1L, "i1", 1L), (1L, "i2", 1L),
      (2L, "i1", 3L), (2L, "i2", 3L)).toDF("s", "i", "x")
    val r = Infer.cronbachAlpha(corr, "s", "i", "x").collect().head
    assert(r.getAs[Long]("n_subjects") == 2 &&
      r.getAs[Long]("k_items") == 2)
    assert(r.getAs[Double]("sum_item_var_r") == 2.0)
    assert(r.getAs[Double]("total_var_r") == 4.0)
    assert(r.getAs[Double]("alpha_r") == 1.0)
    val anti = Seq((1L, "i1", 1L), (1L, "i2", 3L),
      (2L, "i1", 3L), (2L, "i2", 1L)).toDF("s", "i", "x")
    val r2 = Infer.cronbachAlpha(anti, "s", "i", "x").collect().head
    assert(r2.isNullAt(r2.fieldIndex("alpha_r"))) // total constant
  }

  test("mantelHaenszel: hand two-stratum pooled OR and CMH chi2") {
    import spark.implicits._
    // stratum 1: 10/10/10/10 (OR 1); stratum 2: 20/10/10/20 (OR 4)
    def rows(s: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((s, true, true)) ++ Seq.fill(b)((s, true, false)) ++
        Seq.fill(c)((s, false, true)) ++ Seq.fill(d)((s, false, false))
    val df = (rows("s1", 10, 10, 10, 10) ++ rows("s2", 20, 10, 10, 20))
      .toDF("st", "ex", "out")
    val r = Infer.mantelHaenszel(df, "st", col("ex"), col("out"))
      .collect().head
    assert(r.getAs[Long]("n_strata") == 2)
    assert(r.getAs[Long]("o_sum") == 30)
    assert(r.getAs[Double]("e_sum_r") == 25.0)
    // ORmh = (2.5 + 400/60)/(2.5 + 100/60) = 2.2
    assert(r.getAs[Double]("or_mh_r") == 2.2)
    val v = 160000.0 / 62400 + 810000.0 / 212400
    assert(math.abs(r.getAs[Double]("chi2_r") - 25.0 / v) < 1e-5)
  }

  test("cochranArmitage: perfect linear trend gives z = 2") {
    import spark.implicits._
    // scores 1,2,3 with n=2 each and 0,1,2 positives: T=8, E=6, Var=1
    val df = Seq((1L, false), (1L, false), (2L, true), (2L, false),
      (3L, true), (3L, true)).toDF("w", "pos")
    val r = Infer.cochranArmitage(df, "w", col("pos")).collect().head
    assert(r.getAs[Long]("n") == 6 && r.getAs[Long]("n_pos") == 3)
    assert(r.getAs[Long]("t_stat") == 8)
    assert(r.getAs[Double]("z_r") == 2.0)
  }

  test("cohensD: hand pooled-sd case with Hedges correction") {
    import spark.implicits._
    val df = Seq((true, 2L), (true, 4L), (false, 0L), (false, 2L))
      .toDF("armb", "x")
    val r = Infer.cohensD(df, col("armb"), "x").collect().head
    assert(r.getAs[Double]("mean_t_r") == 3.0)
    assert(r.getAs[Double]("mean_c_r") == 1.0)
    val d = 2.0 / math.sqrt(2.0)
    assert(math.abs(r.getAs[Double]("d_r") - d) < 1e-6)
    assert(math.abs(r.getAs[Double]("g_r") - d * (1 - 3.0 / 7)) < 1e-6)
  }

  test("jackknifeRatio: hand two-block case; linear stat ⇒ no bias " +
      "correction") {
    import spark.implicits._
    // blocks (Σy, Σn): (10,2), (20,2) → θ = 7.5, replicates 10 and 5,
    // θ̄ = 7.5 → SE = √((1/2)·12.5) = 2.5, bias-corrected = θ
    val df = Seq(("a", 4L, 1L), ("a", 6L, 1L), ("b", 20L, 2L))
      .toDF("blk", "y", "n")
    val r = Infer.jackknifeRatio(df, "blk", "y", "n").collect().head
    assert(r.getAs[Long]("n_blocks") == 2)
    assert(r.getAs[Double]("theta_r") == 7.5)
    assert(r.getAs[Double]("theta_jack_r") == 7.5)
    assert(r.getAs[Double]("se_jack_r") == 2.5)
  }

  test("jackknifeRatio: single block degrades to NULL jackknife fields, " +
      "not a ÷0 error") {
    import spark.implicits._
    // B = 1: Sn − n_1 = 0 — the replicate term must NULL out via the
    // nullif guard (r10 ADVICE), leaving θ intact and the B≥2-gated
    // outputs NULL
    val df = Seq(("a", 4L, 1L), ("a", 6L, 1L)).toDF("blk", "y", "n")
    val r = Infer.jackknifeRatio(df, "blk", "y", "n").collect().head
    assert(r.getAs[Long]("n_blocks") == 1)
    assert(r.getAs[Double]("theta_r") == 5.0)
    assert(r.isNullAt(r.fieldIndex("theta_jack_r")))
    assert(r.isNullAt(r.fieldIndex("se_jack_r")))
  }

  test("plattScaling: symmetric separable case fits a positive slope " +
      "and zero intercept; a single-bin input leaves the fit at zero " +
      "(singular Hessian degrades, not diverges)") {
    import spark.implicits._
    // +-0.475 sit exactly on bin midpoints of the 40-bin [-1,1] grid,
    // so the fitted curve is symmetric: B = 0 by construction
    val sym = (Seq.fill(50)((-0.475, false)) ++
      Seq.fill(50)((0.475, true)) ++
      Seq.fill(10)((-0.475, true)) ++ Seq.fill(10)((0.475, false)))
      .toDF("x", "y")
    val r = Infer.plattScaling(sym, "x", "y", -1.0, 1.0, 40, 6)
      .collect().head
    assert(r.getAs[Long]("n") == 120)
    assert(r.getAs[Long]("n_pos") == 60)
    assert(r.getAs[Double]("a_r") > 0.0, r.toString)
    assert(math.abs(r.getAs[Double]("b_r")) < 1e-6, r.toString)
    assert(r.getAs[Double]("nll_r") > 0.0)
    // one distinct x -> h11*h22 = h12^2 exactly -> det 0 -> no step
    val one = Seq.fill(20)((0.475, true)).toDF("x", "y")
    val r1 = Infer.plattScaling(one, "x", "y", -1.0, 1.0, 40, 6)
      .collect().head
    assert(r1.getAs[Double]("a_r") == 0.0)
    assert(r1.getAs[Double]("b_r") == 0.0)
  }

  test("conformalLag1: exact integer q-hat rank, gap days excluded, " +
      "coverage counts <= q-hat on the test half") {
    import spark.implicits._
    import java.sql.Date
    // 30 consecutive January days + one gap day (2024-02-20: its
    // pair with 01-30 is non-consecutive and must be EXCLUDED)
    val days = (1 to 30).map(i => (Date.valueOf(f"2024-01-$i%02d"),
      100L * i * i)) :+ (Date.valueOf("2024-02-20"), 0L)
    val r = Infer.conformalLag1(days.toDF("t", "y"), "t", "y", 1, 10)
      .collect().head
    // 29 consecutive pairs split by md5 parity; check the invariants
    // rather than the split (the hash is the contract)
    assert(r.getAs[Long]("n_cal") + r.getAs[Long]("n_test") == 29)
    assert(r.getAs[Double]("target_r") == 0.9)
    val cov = r.getAs[Double]("coverage_r")
    assert(cov >= 0.0 && cov <= 1.0)
    // q-hat must be one of the actual |second difference| scores
    val scores = (2 to 30).map(i => 100L * (2 * i - 1)).toSet
    assert(scores.contains(r.getAs[Long]("qhat")), r.toString)
    // degenerate: too few calibration days (k > n_cal) -> EMPTY
    // output, exactly like the oracle's GROUP BY over an empty q
    val tiny = (1 to 4).map(i => (Date.valueOf(f"2024-03-$i%02d"),
      100L * i)).toDF("t", "y")
    assert(Infer.conformalLag1(tiny, "t", "y", 1, 10)
      .collect().isEmpty)
  }

  test("pocockMonitor: cumulative looks count conversions at the " +
      "cutoff; a strong late effect crosses only at the later look") {
    import spark.implicits._
    // arm B converts at t=10 (after look 1's cutoff 6, before look
    // 2's 13); arm A never converts
    val units = ((1L to 40L).map(i => (i, if (i % 2 == 0) 10L else -1L)))
      .toDF("id", "cv")
      .select(col("id"), when(col("cv") >= 0, col("cv")).as("cv"))
    val got = Infer.pocockMonitor(units, col("id") % 2 === 0, "cv",
      Seq(1 -> lit(6L), 2 -> lit(13L)), 2.413)
      .collect()
    assert(got.length == 2)
    val l1 = got(0); val l2 = got(1)
    assert(l1.getAs[Long]("c1") == 0 && l1.getAs[Long]("c0") == 0)
    assert(l1.isNullAt(l1.fieldIndex("z_r"))) // se 0 -> NULL, no cross
    assert(l2.getAs[Long]("c1") == 20)
    // all of B converted, none of A: z = sqrt(n) * ... far over 2.413
    assert(l2.getAs[Boolean]("crossed"), l2.toString)
  }

  test("holmStepDown: step-down semantics - one failure shields all " +
      "later ranks even if they would pass their own threshold") {
    import spark.implicits._
    // m=4, alpha=.05: thresholds .0125, .0167, .025, .05
    // p = .001 (pass), .02 (FAIL at .0167), .021 (would pass .025
    // but is shielded), .9
    val hyp = Seq(("a", 0.001), ("b", 0.02), ("c", 0.021), ("d", 0.9))
      .toDF("id", "p")
    val got = Infer.holmStepDown(hyp, "p", "id", 0.05)
      .collect().map(r => r.getAs[String]("id") ->
        r.getAs[Boolean]("discovery")).toMap
    assert(got("a") && !got("b") && !got("c") && !got("d"), got.toString)
    // all tiny: everything discovered (kfail NULL -> coalesce true)
    val all = Seq(("a", 0.0001), ("b", 0.0002)).toDF("id", "p")
    val got2 = Infer.holmStepDown(all, "p", "id", 0.05).collect()
    assert(got2.forall(_.getAs[Boolean]("discovery")))
  }

  test("storeyPi0: closed form and the min(1, .) clip") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val p = Seq(0.01, 0.2, 0.6, 0.9).toDF("p")
    val r = Infer.storeyPi0(p, "p", 0.5).collect()(0)
    assert(r.getAs[Long]("m") == 4L)
    assert(r.getAs[Long]("n_above_lambda") == 2L)
    assert(r.getAs[Double]("pi0_r") == 1.0) // 2/(0.5*4) = 1 exactly
    val r2 = Infer.storeyPi0(Seq(0.01, 0.02, 0.6, 0.9).toDF("p")
      .select(col("p")), "p", 0.75).collect()(0)
    assert(math.abs(r2.getAs[Double]("pi0_r") - 1.0) < 1e-9) // clip
  }
}
