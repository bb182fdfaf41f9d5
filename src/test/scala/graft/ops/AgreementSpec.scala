package graft.ops

import graft.SparkTestBase

/** Hand-computable cases for the agreement/association ops. */
class AgreementSpec extends SparkTestBase {
  import spark.implicits._

  // 3 raters, binary: u1 (3,0), u2 (0,3), u3 (2,1) — Fleiss 0.55,
  // Krippendorff 0.6 by hand (worked in the scaladoc discipline):
  // P_i = {1, 1, 1/3}, p = (5/9, 4/9), P_e = 41/81 -> kappa = 22/40.
  // D_o_num = 2, n = 9, sum n_c^2 = 41 -> alpha = 1 - 2*8/40.
  private def handRatings = Seq(
    ("u1", 1, 0), ("u1", 2, 0), ("u1", 3, 0),
    ("u2", 1, 1), ("u2", 2, 1), ("u2", 3, 1),
    ("u3", 1, 0), ("u3", 2, 0), ("u3", 3, 1))
    .toDF("item", "rater", "cat")

  test("fleissKappa: the hand 3-item case gives kappa 0.55 exactly") {
    val r = Agreement.fleissKappa(handRatings, "item", "cat", 3)
      .collect()(0)
    assert(r.getAs[Long]("n_items") == 3L)
    assert(math.abs(r.getAs[Double]("kappa_r") - 0.55) < 1e-9, r.toString)
    assert(math.abs(r.getAs[Double]("p_bar_r") - 7.0 / 9) < 1e-6)
  }

  test("krippendorffAlphaNominal: hand case 0.6; perfect agreement 1; " +
      "single-rating items are excluded") {
    val r = Agreement.krippendorffAlphaNominal(handRatings, "item",
      "cat").collect()(0)
    assert(r.getAs[Long]("n_vals") == 9L)
    assert(math.abs(r.getAs[Double]("alpha_r") - 0.6) < 1e-9, r.toString)
    val perfect = Seq(("a", 1, 1), ("a", 2, 1), ("b", 1, 0), ("b", 2, 0),
      ("lonely", 1, 1)).toDF("item", "rater", "cat")
    val p = Agreement.krippendorffAlphaNominal(perfect, "item", "cat")
      .collect()(0)
    assert(p.getAs[Long]("n_vals") == 4L, "the 1-rating item must drop")
    assert(p.getAs[Double]("alpha_r") == 1.0)
  }

  test("kendallW: identical rankings give W = 1; reversed pair of " +
      "judges gives W near 0") {
    val same = (for (j <- 1 to 3; i <- 1 to 4)
      yield (j, s"i$i", i.toLong)).toDF("judge", "item", "rnk")
    val w1 = Agreement.kendallW(same, "judge", "item", "rnk")
      .collect()(0)
    assert(w1.getAs[Long]("k_items") == 4L)
    assert(w1.getAs[Long]("m_judges") == 3L)
    assert(w1.getAs[Double]("w_r") == 1.0)
    val opposed = ((1 to 4).map(i => (1, s"i$i", i.toLong)) ++
      (1 to 4).map(i => (2, s"i$i", (5 - i).toLong)))
      .toDF("judge", "item", "rnk")
    val w0 = Agreement.kendallW(opposed, "judge", "item", "rnk")
      .collect()(0)
    assert(w0.getAs[Double]("w_r") == 0.0, w0.toString)
  }

  test("cramersVCorrected: a perfectly associated 2x2 gives V = 1 " +
      "with the correction strictly below the raw V") {
    val rows = (Seq.fill(50)(("a", "x")) ++ Seq.fill(50)(("b", "y")))
      .toDF("x", "y")
    val r = Agreement.cramersVCorrected(rows, "x", "y").collect()(0)
    assert(r.getAs[Double]("v_r") == 1.0, r.toString)
    assert(r.getAs[Double]("v_corrected_r") <= 1.0)
    assert(r.getAs[Double]("v_corrected_r") > 0.9)
    // independence: uniform 2x2 -> phi2 0, corrected V 0
    val ind = (Seq.fill(25)(("a", "x")) ++ Seq.fill(25)(("a", "y")) ++
      Seq.fill(25)(("b", "x")) ++ Seq.fill(25)(("b", "y"))).toDF("x", "y")
    val ri = Agreement.cramersVCorrected(ind, "x", "y").collect()(0)
    assert(ri.getAs[Double]("phi2_r") == 0.0)
    assert(ri.getAs[Double]("v_corrected_r") == 0.0)
  }

  test("weightedKappaQuadratic: identity agreement gives 1; constant " +
      "offset-by-one on a 3-level scale is penalized but stays above " +
      "a 2-level full flip") {
    val id = Seq((0, 0), (1, 1), (2, 2), (0, 0), (1, 1), (2, 2))
      .toDF("a", "b")
    val r1 = Agreement.weightedKappaQuadratic(id, "a", "b").collect()(0)
    assert(r1.getAs[Double]("po_r") == 1.0)
    assert(r1.getAs[Double]("kappa_w_r") == 1.0)
    // hand 2x2: perfect disagreement of a balanced binary -> kappa -1
    val flip = Seq((0, 1), (1, 0), (0, 1), (1, 0)).toDF("a", "b")
    val r2 = Agreement.weightedKappaQuadratic(flip, "a", "b")
      .collect()(0)
    assert(r2.getAs[Double]("kappa_w_r") == -1.0, r2.toString)
  }

  test("gwetAc1: the kappa paradox — skewed prevalence with " +
      "near-perfect agreement gives Fleiss kappa < 0 but AC1 near 1") {
    import spark.implicits._
    // 10 items, 3 raters: 9 unanimous '1', one item split 2-1
    val ratings = ((1 to 9).flatMap(i => Seq((i, 1, 1), (i, 2, 1),
      (i, 3, 1))) ++ Seq((10, 1, 1), (10, 2, 1), (10, 3, 0)))
      .toDF("doc_id", "rater", "cat")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("cat"))
    val ac1 = Agreement.gwetAc1(ratings, "doc_id", "cat", m = 3,
      k = 2).collect()(0)
    // A=56 B=60 C=58 D=900: po=0.9333, pe=0.0644, AC1=46920/50520
    assert(ac1.getAs[Long]("n_items") == 10)
    assert(math.abs(ac1.getAs[Double]("po_r") - 56.0 / 60) < 1e-6)
    assert(math.abs(ac1.getAs[Double]("ac1_r") - 46920.0 / 50520)
      < 1e-6)
    val fleiss = Agreement.fleissKappa(ratings, "doc_id", "cat", 3)
      .collect()(0)
    assert(fleiss.getAs[Double]("kappa_r") < 0.0,
      "Fleiss must go negative here (the paradox)")
    assert(ac1.getAs[Double]("ac1_r") > 0.9)
  }

  test("linCcc: identical pairs give CCC = r = Cb = 1; a pure level " +
      "shift keeps r = 1 but collapses CCC") {
    import spark.implicits._
    val same = (1L to 10L).map(x => (x, x)).toDF("x", "y")
    val rs = Agreement.linCcc(same, "x", "y").collect()(0)
    assert(rs.getAs[Double]("ccc_r") == 1.0)
    assert(rs.getAs[Double]("pearson_r") == 1.0)
    assert(rs.getAs[Double]("cb_r") == 1.0)
    val shift = (1L to 10L).map(x => (x, x + 10L)).toDF("x", "y")
    val rh = Agreement.linCcc(shift, "x", "y").collect()(0)
    assert(rh.getAs[Double]("pearson_r") == 1.0)
    // vx = vy = 825, shift = 100^2 -> CCC = 1650/11650
    assert(math.abs(rh.getAs[Double]("ccc_r") - 1650.0 / 11650) < 1e-6)
  }
}
