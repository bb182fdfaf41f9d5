package graft.ops

import graft.SparkTestBase

class ProfileSpec extends SparkTestBase {

  test("chi2Residuals: independent table → zero residuals; zero cells " +
      "included; hand 2×2 residual values") {
    import spark.implicits._
    // perfectly independent 2×2: margins (2,2)×(2,2), all e = 1 = o
    val ind = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("r", "c")
    val gotInd = Profile.chi2Residuals(ind, "r", "c").collect()
    assert(gotInd.length == 4)
    assert(gotInd.forall(_.getAs[Double]("resid_r") == 0.0))
    assert(gotInd.forall(_.getAs[Double]("chi2_r") == 0.0))
    // diagonal-only 2×2: o=(2,0,0,2), e=1 everywhere → resid ±1,
    // χ² = 4; the TWO ZERO CELLS must appear as rows
    val diag = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("r", "c")
    val gotDiag = Profile.chi2Residuals(diag, "r", "c")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(gotDiag.size == 4)
    assert(gotDiag(("a", "y")).getAs[Long]("o") == 0)
    assert(gotDiag(("a", "x")).getAs[Double]("resid_r") == 1.0)
    assert(gotDiag(("a", "y")).getAs[Double]("resid_r") == -1.0)
    assert(gotDiag(("b", "y")).getAs[Double]("chi2_r") == 4.0)
  }

  test("anonymityLadder: coarsening turns k-anonymity from violated " +
      "to satisfied, with exact class profiles") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, substring}
    // ids AA1 AA2 AB1: fine level (full id) → classes of 1 (k=2
    // violated); coarse level (first letter) → one class of 3
    val df = Seq("AA1", "AA2", "AB1").toDF("id")
    val got = Profile.anonymityLadder(df, Seq(
        "fine" -> Seq(col("id")),
        "coarse" -> Seq(substring(col("id"), 1, 1))), k = 2L)
      .collect().map(r => r.getString(0) -> r).toMap
    val f = got("fine")
    assert(f.getAs[Long]("n_classes") == 3 && f.getAs[Long]("min_k") == 1)
    assert(f.getAs[Long]("n_below_k") == 3 &&
      !f.getAs[Boolean]("k_anonymous"))
    val c = got("coarse")
    assert(c.getAs[Long]("n_classes") == 1 && c.getAs[Long]("min_k") == 3)
    assert(c.getAs[Boolean]("k_anonymous"))
    assert(c.getAs[Double]("median_k_r") == 3.0)
  }

  test("trimmedMean: outliers dropped, not clamped") {
    import spark.implicits._
    // 1,2,...,10 + outlier 1000: winsorized mean would clamp 1000 to
    // q3; trimmed drops it entirely. q1/q3 of {1..10,1000} (h-index
    // interpolation) = (3.5, 8.5) → kept {4..8}, mean 6.0
    val df = ((1 to 10) :+ 1000).map(v => ("g", v.toDouble))
      .toDF("grp", "v")
    val r = Profile.trimmedMean(df, "grp", "v", 0.25, 0.75)
      .collect().head
    assert(r.getAs[Long]("n_total") == 11)
    assert(r.getAs[Long]("n_kept") == 5)
    assert(r.getAs[Long]("n_dropped") == 6)
    assert(r.getAs[Double]("trimmed_mean_r") == 6.0)
  }
  import spark.implicits._

  private val df = Seq(
    (1L, Some(10.125), "a"),
    (2L, Some(20.5), "b"),
    (3L, None, "a"),
    (4L, Some(20.5), "c")
  ).toDF("id", "v", "tag")

  test("profile: one row per column with rows/nulls/distinct/min/max") {
    val p = Profile.profile(df, Seq(Profile.ProfCol.raw("id"),
        Profile.ProfCol.dec2("v"), Profile.ProfCol.raw("tag")))
      .orderBy("col_name").collect()
    val byName = p.map(r => r.getString(0) -> r).toMap
    assert(p.forall(_.getLong(1) == 4L))
    val id = byName("id")
    assert((id.getLong(2), id.getLong(3), id.getString(4), id.getString(5))
      == (0L, 4L, "1", "4"))
    val v = byName("v")
    // dec2 canonicalizes float rendering; nulls excluded from distinct
    assert((v.getLong(2), v.getLong(3), v.getString(4), v.getString(5))
      == (1L, 2L, "10.13", "20.50"))
  }

  test("histogram: constant-step floor bins with per-bin extrema") {
    val d = Seq(0.5, 9.99, 10.0, 25.0).toDF("x")
    val h = Profile.histogram(d, "x", 10.0).orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(h.toSeq == Seq((0L, 2L, 0.5, 9.99), (1L, 1L, 10.0, 10.0),
      (2L, 1L, 25.0, 25.0)))
  }

  test("histogram: nulls are excluded, not a bin") {
    val d = Seq(Some(1.0), None).toDF("x")
    assert(Profile.histogram(d, "x", 10.0).count() == 1L)
  }

  test("zscoreOutliers flags only far tails, keeps input columns + z") {
    // group a: nine 10s and one 1000 → the 1000 is ~3σ out at threshold 2.8
    val vals = Seq.fill(9)(10.0) :+ 1000.0
    val d = vals.zipWithIndex.map { case (v, i) => (i.toLong, "a", v) }
      .toDF("id", "grp", "v")
    val out = Profile.zscoreOutliers(d, "grp", "v", 2.8).collect()
    assert(out.length == 1 && out.head.getAs[Long]("id") == 9L)
    assert(out.head.getAs[Double]("z") > 2.8)
  }

  test("winsorize clamps to interpolated quartiles per group") {
    val d = (1L to 8L).map(v => ("a", v.toDouble)).toDF("grp", "v")
    // quantile_cont over 1..8: p25 = 2.75, p75 = 6.25
    val w = Profile.winsorize(d, "grp", "v", 0.25, 0.75)
      .orderBy("v").collect()
    assert(w.head.getAs[Double]("lo") == 2.75)
    assert(w.head.getAs[Double]("hi") == 6.25)
    val clamped = w.map(_.getAs[Double]("v_w")).toSeq
    assert(clamped == Seq(2.75, 2.75, 3.0, 4.0, 5.0, 6.0, 6.25, 6.25))
  }

  test("winsorize with p=[0,1] is the identity") {
    val d = Seq(("a", 1.0), ("a", 9.0)).toDF("grp", "v")
    val w = Profile.winsorize(d, "grp", "v", 0.0, 1.0).collect()
    assert(w.map(r => r.getAs[Double]("v") == r.getAs[Double]("v_w"))
      .forall(identity))
  }

  test("zscoreOutliers: a zero-variance group emits nothing (NaN z)") {
    val d = Seq((1L, "a", 5.0), (2L, "a", 5.0)).toDF("id", "grp", "v")
    assert(Profile.zscoreOutliers(d, "grp", "v", 1.0).isEmpty)
  }

  test("psiDrift: identical distributions score exactly 0; a shifted " +
      "distribution crosses the 0.25 drift threshold") {
    val ref = (1 to 100).map(i => ("t", (i % 10) * 10.0 + 5.0))
    val same = Profile.psiDrift(ref.toDF("g", "v"), ref.toDF("g", "v"),
      "g", "v", 0.0, 100.0, 10).collect()
    assert(same.head.getDouble(1) == 0.0)
    // current slice concentrated in the top bin
    val cur = (1 to 100).map(_ => ("t", 95.0))
    val drift = Profile.psiDrift(ref.toDF("g", "v"), cur.toDF("g", "v"),
      "g", "v", 0.0, 100.0, 10).collect()
    assert(drift.head.getDouble(1) > 0.25, s"psi=${drift.head.getDouble(1)}")
  }

  test("psiDrift: out-of-range values clamp into the edge bins (no " +
      "dropped rows, no extra bins)") {
    val ref = Seq(("t", -50.0), ("t", 500.0), ("t", 55.0))
    val cur = Seq(("t", 5.0), ("t", 95.0), ("t", 55.0))
    val got = Profile.psiDrift(ref.toDF("g", "v"), cur.toDF("g", "v"),
      "g", "v", 0.0, 100.0, 10).collect()
    // all 6 rows participate: psi is finite and defined
    assert(got.length == 1 && !got.head.getDouble(1).isNaN)
  }

  test("psiDrift: a bin empty in BOTH slices still contributes its " +
      "smoothing term when the totals differ (fixed-grid semantics)") {
    // ref has 2 rows, cur has 4, all in bin 0 of a 2-bin grid — bin 1
    // is empty on both sides. Fixed-grid PSI with add-half smoothing:
    //   bin 0: p_ref = 2.5/3, p_cur = 4.5/5
    //   bin 1: p_ref = 0.5/3, p_cur = 0.5/5  (nonzero term!)
    val ref = Seq(("t", 1.0), ("t", 2.0))
    val cur = Seq(("t", 1.0), ("t", 2.0), ("t", 3.0), ("t", 4.0))
    val got = Profile.psiDrift(ref.toDF("g", "v"), cur.toDF("g", "v"),
      "g", "v", 0.0, 10.0, 2).collect()
    def term(pc: Double, pr: Double) = (pc - pr) * math.log(pc / pr)
    val want = BigDecimal(
      term(4.5 / 5, 2.5 / 3) + term(0.5 / 5, 0.5 / 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.length == 1 && got.head.getDouble(1) == want,
      s"got=${got.head.getDouble(1)} want=$want (the bin-1 term must " +
        "be included)")
  }

  test("arrayDimStats: per-dimension mean/std/min/max (hand case)") {
    val d = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 4.0f)))
      .toDF("id", "emb")
    val got = Profile.arrayDimStats(d, "emb").orderBy("dim").collect()
    assert(got.length == 2)
    val d0 = got(0)
    assert(d0.getAs[Long]("n") == 2L)
    assert(d0.getAs[Double]("mean_r") == 2.0)
    assert(d0.getAs[Double]("std_r") == 1.0) // pop std of {1,3}
    assert(d0.getAs[Double]("x_min") == 1.0 && d0.getAs[Double]("x_max") == 3.0)
    val d1 = got(1)
    assert(d1.getAs[Double]("mean_r") == 3.0 && d1.getAs[Double]("std_r") == 1.0)
  }

  test("arrayDimStats: ragged arrays produce per-dim counts; a " +
      "single-value dim has std 0") {
    val d = Seq((1L, Seq(5.0f)), (2L, Seq(7.0f, 9.0f))).toDF("id", "emb")
    val got = Profile.arrayDimStats(d, "emb").orderBy("dim").collect()
    assert(got.map(_.getAs[Long]("n")).toSeq == Seq(2L, 1L))
    assert(got(1).getAs[Double]("std_r") == 0.0)
    assert(got(1).getAs[Double]("mean_r") == 9.0)
  }

  test("keySkew: hand-computed ranks, shares, cumulative shares, Gini; " +
      "uniform keys give Gini 0") {
    // counts: a=6, b=3, c=1 → total 10; ascending [1, 3, 6]:
    // G = ((2·1−4)·1 + (2·2−4)·3 + (2·3−4)·6) / (3·10) = 10/30
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .toDF("k")
    val got = Profile.keySkew(df, "k", 2).orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == Seq(
      (1, "a", 6L, 0.6, 0.6, 0.333333),
      (2, "b", 3L, 0.3, 0.9, 0.333333)), got.toString)
    // uniform distribution → Gini exactly 0
    val uni = Profile.keySkew(
      Seq("x", "x", "y", "y").toDF("k"), "k", 10)
      .collect().map(_.getAs[Double]("gini_r"))
    assert(uni.forall(_ == 0.0), uni.toSeq.toString)
  }

  test("fdViolations: a held FD is empty; a violated FD reports " +
      "distinct-value and row counts per violating key") {
    val d = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "z"),
      ("c", "y"), ("c", "y"), ("c", "w")).toDF("lhs", "rhs")
    // lhs → lhs trivially holds
    assert(Profile.fdViolations(d, "lhs", "lhs").count() == 0L)
    val got = Profile.fdViolations(d, "lhs", "rhs").orderBy("lhs")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("b", 2L, 2L), ("c", 2L, 3L)), got.toSeq)
  }

  test("fdViolations: null rhs counts as one distinct value") {
    val d = Seq(("a", Some("x")), ("a", None), ("b", None), ("b", None))
      .toDF("lhs", "rhs")
    val got = Profile.fdViolations(d, "lhs", "rhs").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 2L)), got)
  }

  test("fdDiscovery: a unique key holds for every rhs; a constructed " +
      "violation is counted on the right pair") {
    val d = Seq((1L, "a", "x"), (2L, "a", "y"), (3L, "b", "x"))
      .toDF("id", "g", "v")
    val got = Profile.fdDiscovery(d, Seq("id", "g", "v")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getBoolean(4))).toMap
    assert(got.size == 6)
    assert(got(("id", "g")) == ((0L, true)) &&
      got(("id", "v")) == ((0L, true)), "unique key holds")
    // g=a maps to {x, y} → one violating key; v=x maps to {a, b}
    assert(got(("g", "v")) == ((1L, false)), got.toString)
    assert(got(("v", "g")) == ((1L, false)), got.toString)
  }

  test("mutualInfo: independence → 0; X determined by Y → MI == H(X), " +
      "NMI == 1 when X == Y") {
    // independent uniform 2x2
    val ind = (for (x <- Seq("a", "b"); y <- Seq("u", "v"); _ <- 1 to 5)
      yield (x, y)).toDF("x", "y")
    val i = Profile.mutualInfo(ind, "x", "y").head
    assert(i.getDouble(1) == 0.0, i.toString)
    // X == Y: MI = H(X) = H(Y), NMI = 1
    val eq = Seq("a", "a", "b", "c").map(s => (s, s)).toDF("x", "y")
    val e = Profile.mutualInfo(eq, "x", "y").head
    assert(e.getDouble(1) == e.getDouble(2) &&
      e.getDouble(2) == e.getDouble(3), e.toString)
    assert(e.getDouble(4) == 1.0, "NMI")
  }

  test("poissonBootstrap: constant values → zero SE; on a real sample " +
      "the SE sits near σ/√n and the boot mean near the plain mean") {
    import org.apache.spark.sql.functions._
    val const = spark.range(200)
      .select(lit("g").as("grp"), lit(7L).as("v"), col("id"))
    val c = Profile.poissonBootstrap(const, "grp", "v", "id", 20).head
    assert(c.getLong(1) == 200L, "n_rows")
    assert(c.getDouble(3) == 7.0 && c.getDouble(4) == 0.0, c.toString)
    // values 1..400: mean 200.5, sd ≈ 115.6 → SE ≈ 5.8; the bootstrap
    // estimate should land within a loose 3x band, mean within ~4 SE
    val seq = spark.range(1, 401)
      .select(lit("g").as("grp"), col("id").as("v"), col("id"))
    val r = Profile.poissonBootstrap(seq, "grp", "v", "id", 20).head
    assert(r.getLong(2) == 20L, "all reps kept")
    assert(math.abs(r.getDouble(3) - 200.5) < 25.0, r.toString)
    assert(r.getDouble(4) > 1.9 && r.getDouble(4) < 17.4, r.toString)
  }

  test("ksDrift: disjoint slices → 1, identical slices → 0, hand case " +
      "→ 0.5, one-class group → null") {
    import org.apache.spark.sql.functions.col
    def ks(rows: Seq[(String, Double, Boolean)]): Option[Double] = {
      val d = rows.toDF("grp", "v", "a")
      val r = Profile.ksDrift(d, "grp", "v", col("a")).head
      if (r.isNullAt(3)) None else Some(r.getDouble(3))
    }
    assert(ks(Seq(("g", 1.0, true), ("g", 2.0, true), ("g", 10.0, false),
      ("g", 11.0, false))).contains(1.0))
    assert(ks(Seq(("g", 1.0, true), ("g", 1.0, false), ("g", 2.0, true),
      ("g", 2.0, false))).contains(0.0))
    // A = {1, 3}, B = {2, 4}: CDF gaps .5, 0(?), .5, 0 → D = 0.5
    assert(ks(Seq(("g", 1.0, true), ("g", 3.0, true), ("g", 2.0, false),
      ("g", 4.0, false))).contains(0.5))
    assert(ks(Seq(("g", 1.0, true), ("g", 2.0, true))).isEmpty)
  }

  test("benfordProfile: string-extracted digits (incl. the 1000.0 " +
      "power-of-ten boundary), shares sum to 1, values < 1 excluded") {
    val d = Seq(("g", 1000.0), ("g", 999.99), ("g", 12.3), ("g", 0.5),
      ("g", 150.0)).toDF("grp", "v")
    val rows = Profile.benfordProfile(d, "grp", "v").orderBy("digit")
      .collect()
    val byDigit = rows.map(r => r.getInt(1) ->
      (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // 1000.0 and 150.0 and 12.3 lead with 1; 999.99 with 9; 0.5 dropped
    assert(byDigit.keySet == Set(1, 9), byDigit.toString)
    assert(byDigit(1)._1 == 3L && byDigit(9)._1 == 1L)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    assert(byDigit(1)._3 == 0.30103) // log10(2) rounded to 6
  }

  test("madOutliers: hand case — one gross outlier flagged, median/MAD " +
      "untouched by it; zero-MAD group flags every off-median row") {
    import spark.implicits._
    // g: values 10,12,14,16,1000 → med 14, devs 4,2,0,2,986 → MAD 2;
    // threshold 3·1.4826·2 = 8.8956 → only 1000 flagged (dev 986)
    val g = Seq(10L, 12L, 14L, 16L, 1000L).zipWithIndex
      .map { case (v, i) => ("g", v, i.toLong) }
    // h: constant 5 except one 7 → med 5, MAD 0 → any deviation flags
    val h = Seq(5L, 5L, 5L, 7L).zipWithIndex
      .map { case (v, i) => ("h", v, 100L + i) }
    val df = (g ++ h).toDF("grp", "v", "id")
    val got = Profile.madOutliers(df, "grp", "v", "id", bandWidth = 10.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .toMap
    assert(got("g") == ((5L, 14.0, 2.0, 1L)), got.toString)
    assert(got("h") == ((4L, 5.0, 0.0, 1L)), got.toString)
  }

  test("cohenKappa: perfect agreement = 1; independent raters with " +
      "balanced margins ≈ 0; constant rater → null (pe = 1)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val perfect = Seq(("g", true, true), ("g", false, false),
      ("g", true, true)).toDF("grp", "a", "b")
    val p = Profile.cohenKappa(perfect, "grp", col("a"), col("b"))
      .collect().head
    assert(p.getDouble(6) == 1.0 && p.getDouble(7) == 1.0)
    // 2×2 balanced independence: n11=n10=n01=n00=1 → po=0.5, pe=0.5, κ=0
    val indep = Seq(("g", true, true), ("g", true, false),
      ("g", false, true), ("g", false, false)).toDF("grp", "a", "b")
    val i = Profile.cohenKappa(indep, "grp", col("a"), col("b"))
      .collect().head
    assert(i.getDouble(6) == 0.5 && i.getDouble(7) == 0.0)
    // ONE constant rater only shifts pe (A const-true, B 50/50 → κ=0);
    // pe = 1 — the null case — needs BOTH raters constant and equal
    val oneConst = Seq(("g", true, true), ("g", true, false))
      .toDF("grp", "a", "b")
    assert(Profile.cohenKappa(oneConst, "grp", col("a"), col("b"))
      .collect().head.getDouble(7) == 0.0)
    val bothConst = Seq(("g", true, true), ("g", true, true))
      .toDF("grp", "a", "b")
    val c = Profile.cohenKappa(bothConst, "grp", col("a"), col("b"))
      .collect().head
    assert(c.isNullAt(7), "degenerate margins: κ undefined → null")
  }

  test("cohenKappa: worked asymmetric example matches the textbook " +
      "formula") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // n=10: n11=4, n10=1, n01=2, n00=3 → po=0.7,
    // pe = (5*6 + 5*4)/100 = 0.5 → κ = 0.2/0.5 = 0.4
    val rows = Seq.fill(4)((true, true)) ++ Seq.fill(1)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(3)((false, false))
    val df = rows.map { case (a, b) => ("g", a, b) }.toDF("grp", "a", "b")
    val r = Profile.cohenKappa(df, "grp", col("a"), col("b"))
      .collect().head
    assert(r.getDouble(6) == 0.7 && r.getDouble(7) == 0.4, r.toString)
  }

  test("concentrationProfile: equal values → Gini 0 / HHI 1/n; one " +
      "unit holds everything → Gini (n-1)/n, top share 1; tie-order " +
      "invariance") {
    import spark.implicits._
    val df = (
      (1L to 4L).map(k => ("eq", k, 10L)) ++       // perfectly equal
      Seq(("uneq", 1L, 0L), ("uneq", 2L, 0L),
        ("uneq", 3L, 0L), ("uneq", 4L, 40L))       // one holds all
    ).toDF("grp", "k", "x")
    val got = Profile.concentrationProfile(df, "grp", "x", "k",
        bandWidth = 8.0)
      .collect().map(r => r.getString(0) -> r).toMap
    val eq = got("eq")
    assert(eq.getAs[Long]("n") == 4 && eq.getAs[Long]("total") == 40)
    assert(eq.getAs[Double]("gini_r") == 0.0)
    assert(eq.getAs[Double]("hhi_r") == 0.25) // 1/n
    // top ⌈4/100⌉ = 1 unit of 4 equal → share 1/4
    assert(eq.getAs[Long]("top_n") == 1
      && eq.getAs[Double]("top_share_r") == 0.25)
    val un = got("uneq")
    assert(un.getAs[Double]("gini_r") == 0.75) // (n−1)/n
    assert(un.getAs[Double]("hhi_r") == 1.0)
    assert(un.getAs[Double]("top_share_r") == 1.0)
    // tie-order invariance: permuting ids of the equal group's rows
    // changes which id gets which rank but not Σr·x → same Gini
    val perm = (1L to 4L).map(k => ("eq", 5L - k, 10L))
      .toDF("grp", "k", "x")
    val g2 = Profile.concentrationProfile(perm, "grp", "x", "k", 8.0)
      .collect().head.getAs[Double]("gini_r")
    assert(g2 == 0.0)
  }

  test("inclusion: partial and full containment, nulls excluded") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(2L), Some(3L), Some(2L), None)
      .toDF("c")
    val parent = Seq(1L, 2L, 4L).toDF("p")
    val r = Profile.inclusion(child, "c", parent, "p", "t1.c", "t2.p")
      .collect().head
    assert(r.getAs[String]("child_col") == "t1.c")
    assert(r.getAs[Long]("n_child_distinct") == 3) // null dropped
    assert(r.getAs[Long]("n_matched") == 2)
    assert(r.getAs[Double]("containment_r") == 0.666667)
    assert(!r.getAs[Boolean]("is_candidate"))
    val full = Profile.inclusion(parent, "p", parent, "p", "a", "b")
      .collect().head
    assert(full.getAs[Boolean]("is_candidate"))
    assert(full.getAs[Double]("containment_r") == 1.0)
  }

  test("inclusion is type-agnostic: non-numeric values still counted") {
    import spark.implicits._
    // a long cast would null these out and containment would be
    // measured on the empty numeric-castable subset (vacuously 0/0);
    // the string cast keeps equality containment honest
    val child = Seq("a", "b", "b").toDF("c")
    val parent = Seq("a", "c").toDF("p")
    val r = Profile.inclusion(child, "c", parent, "p", "t1.c", "t2.p")
      .collect().head
    assert(r.getAs[Long]("n_child_distinct") == 2)
    assert(r.getAs[Long]("n_matched") == 1)
    assert(r.getAs[Double]("containment_r") == 0.5)
    // mixed-type probe: long child against string parent matches on
    // the string form of the value
    val lc = Seq(1L, 2L).toDF("c")
    val sp = Seq("1", "9").toDF("p")
    val m = Profile.inclusion(lc, "c", sp, "p", "x", "y").collect().head
    assert(m.getAs[Long]("n_matched") == 1)
  }

  test("keyProfile: candidate key vs dup/null column") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, Some("a")), (3L, None))
      .toDF("id", "v")
    val got = Profile.keyProfile(df, Seq("id", "v"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    val id = got("id")
    assert(id.getAs[Long]("n_rows") == 3 &&
      id.getAs[Long]("n_distinct") == 3 && id.getAs[Long]("n_null") == 0)
    assert(id.getAs[Boolean]("candidate_key"))
    assert(id.getAs[Double]("uniq_r") == 1.0)
    val v = got("v")
    assert(v.getAs[Long]("n_distinct") == 1 &&
      v.getAs[Long]("n_null") == 1)
    assert(!v.getAs[Boolean]("candidate_key"))
    assert(v.getAs[Double]("uniq_r") == 0.333333)
  }

  test("theilInequality: equal values give T = L = 0; hand two-value " +
      "case; non-positive rows excluded") {
    import spark.implicits._
    val df = Seq(("eq", 5L), ("eq", 5L), ("eq", 5L),
      ("mix", 1L), ("mix", 3L), ("mix", 0L), ("mix", -7L))
      .toDF("seg", "x")
    val got = Profile.theilInequality(df, "seg", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("eq").getAs[Long]("n") == 3L)
    assert(got("eq").getAs[Double]("theil_t_r") == 0.0)
    assert(got("eq").getAs[Double]("theil_l_r") == 0.0)
    // mix keeps only {1, 3}: mu = 2, T = (0.5 ln 0.5 + 1.5 ln 1.5)/2,
    // L = -(ln 0.5 + ln 1.5)/2
    assert(got("mix").getAs[Long]("n") == 2L)
    val t = (0.5 * math.log(0.5) + 1.5 * math.log(1.5)) / 2
    val l = -(math.log(0.5) + math.log(1.5)) / 2
    assert(math.abs(got("mix").getAs[Double]("theil_t_r") - t) < 1e-6)
    assert(math.abs(got("mix").getAs[Double]("theil_l_r") - l) < 1e-6)
  }

  test("hbos: rare-bin rows score log10(max/count); common bins score " +
      "zero; ties broken by id") {
    import spark.implicits._
    // feature f1: ids 1-9 share bin 0 (count 9), id 10 alone in bin 1
    val df = (1L to 10L).map(i => (i, if (i == 10) 1L else 0L, 0L))
      .toDF("id", "f1", "f2")
    val got = Profile.hbos(df, "id", Seq("f1", "f2"), 3).collect()
      .sortBy(_.getAs[Int]("rn"))
    assert(got.length == 3)
    assert(got.head.getAs[Long]("id") == 10L)
    // log10(9/1) + log10(10/10) = 0.954243
    assert(got.head.getAs[Double]("score_r") == 0.954243, got.head.toString)
    assert(got(1).getAs[Long]("id") == 1L)
    assert(got(1).getAs[Double]("score_r") == 0.0)
    assert(got(2).getAs[Long]("id") == 2L)
  }

  test("snScale: hand high-median/low-median chain on exact integers; " +
      "single observation yields no row") {
    import spark.implicits._
    // x = 1,2,4,8: himeds per i are 3,2,3,6 -> low median (k=2) = 3
    val v = Seq((1L, 1L), (2L, 2L), (3L, 4L), (4L, 8L)).toDF("id", "x")
    val r = Profile.snScale(v, "id", "x").collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n") == 4)
    assert(r.head.getAs[Long]("sn_raw") == 3)
    assert(r.head.getAs[Double]("sn_r") == 3.5778)
    val single = Seq((1L, 5L)).toDF("id", "x")
    assert(Profile.snScale(single, "id", "x").collect().isEmpty)
  }

  test("negbinFit: hand moments; under-dispersed input degrades r/p " +
      "to NULL") {
    import spark.implicits._
    // key counts 1,1,1,5 -> mean 2, var (1+1+1+9)/4 = 3 > mean
    val over = (Seq.fill(1)(("a", 1)) ++ Seq.fill(1)(("b", 1)) ++
      Seq.fill(1)(("c", 1)) ++ Seq.fill(5)(("d", 1)))
      .zipWithIndex.map { case ((k, _), i) => (k, i) }.toDF("k", "i")
    val r = Profile.negbinFit(over, "k").collect().head
    assert(r.getAs[Long]("n_keys") == 4)
    assert(r.getAs[Double]("mean_r") == 2.0)
    assert(r.getAs[Double]("var_r") == 3.0)
    assert(r.getAs[Double]("dispersion_r") == 1.5)
    // r = 4/(3-2) = 4; p = 4/6
    assert(r.getAs[Double]("nb_r_r") == 4.0)
    assert(r.getAs[Double]("nb_p_r") == 0.666667)
    // constant counts: var 0 < mean -> NULL fit
    val under = Seq(("a", 1), ("a", 2), ("b", 1), ("b", 2))
      .toDF("k", "i")
    val r2 = Profile.negbinFit(under, "k").collect().head
    assert(r2.isNullAt(r2.fieldIndex("nb_r_r")))
    assert(r2.isNullAt(r2.fieldIndex("nb_p_r")))
  }

  test("abcXyz: hand 3-part frame lands exactly in (A,X), (B,Z), " +
      "(C,Y) with the 70/90 cumulative cuts inclusive") {
    import spark.implicits._
    val mondays = Seq("2026-01-05", "2026-01-12", "2026-01-19",
      "2026-01-26").map(d => java.sql.Timestamp.valueOf(s"$d 00:00:00"))
    // part 1: $17.50 x 4 weeks, qty 5 each -> rev 7000c (70%), var 0
    // part 2: $20 once, qty 10 week 1 only -> rev 2000c (cum 90%), Z
    // part 3: $2.50 x 4, qty 2/8/2/8 -> rev 1000c (cum 100%), Y
    val rows = mondays.map(w => (1L, 17.50, 5L, w)) ++
      Seq((2L, 20.0, 10L, mondays.head)) ++
      mondays.zip(Seq(2L, 8L, 2L, 8L)).map { case (w, q) =>
        (3L, 2.50, q, w) }
    val li = rows.toDF("l_partkey", "l_extendedprice", "l_quantity",
      "l_shipdate")
    val got = Profile.abcXyz(li, "l_partkey", "l_extendedprice",
        "l_quantity", "l_shipdate").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_parts"), r.getAs[Long]("revenue_cents")))
      .toMap
    assert(got.size == 9)
    assert(got(("A", "X")) == (1L, 7000L), got.toString)
    assert(got(("B", "Z")) == (1L, 2000L), got.toString)
    assert(got(("C", "Y")) == (1L, 1000L), got.toString)
    assert(got.values.map(_._1).sum == 3)
  }
}
