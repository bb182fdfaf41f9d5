package graft.ops

import graft.SparkTestBase

/** Hand cases for the clustering-structure ops + the new TextOps and
  * Profile additions of the density batch. */
class ClusterSpec extends SparkTestBase {
  import spark.implicits._

  test("gridDensityClusters: two separated blobs give two clusters " +
      "with the right point totals; sparse cells are dropped") {
    // blob A: 6 pts in cell (0,0); blob B: 7 pts split across the
    // adjacent cells (10,10) and (10,11); 1 lone point far away
    val pts = (Seq.fill(6)((0.01, 0.01)) ++
      Seq.fill(5)((1.01, 1.01)) ++ Seq.fill(2)((1.01, 1.11)) ++
      Seq((5.0, 5.0))).toDF("x", "y")
    val got = Cluster.gridDensityClusters(pts, "x", "y", h = 0.1,
      minPts = 2).collect()
    assert(got.length == 2, got.mkString(", "))
    val sizes = got.map(_.getAs[Long]("n_points")).sorted
    assert(sizes.toSeq == Seq(6L, 7L))
    // the two-cell blob is one component (8-adjacency)
    assert(got.map(_.getAs[Long]("n_cells")).sorted.toSeq ==
      Seq(1L, 2L))
  }

  test("calinskiHarabasz: tight separated clusters score far higher " +
      "than a relabeled-random split of the same points") {
    val tight = (Seq.fill(20)((0, 0.0, 0.0)) ++
      Seq.fill(20)((1, 5.0, 5.0))).zipWithIndex
      .map { case ((l, x, y), i) =>
        (l, x + (i % 5) * 0.01, y + (i % 7) * 0.01) }
      .toDF("label", "x", "y")
    val ch1 = Cluster.calinskiHarabasz(tight, "label", "x", "y")
      .collect()(0)
    assert(ch1.getAs[Long]("k_clusters") == 2L)
    assert(ch1.getAs[Double]("ch_r") > 1000.0, ch1.toString)
    val mixed = tight.selectExpr("CAST(pmod(x * 100, 2) AS INT) AS label",
      "x", "y")
    val ch2 = Cluster.calinskiHarabasz(mixed, "label", "x", "y")
      .collect()(0)
    assert(ch2.getAs[Double]("ch_r") < ch1.getAs[Double]("ch_r"))
  }

  test("sppmiTopPairs: a planted always-adjacent pair beats an " +
      "incidental one and the shift clips weak pairs to zero") {
    val docs = (1 to 30).map(i =>
      (i.toLong, "alpha beta filler" + (i % 7) + " gamma delta"))
      .toDF("doc_id", "text")
    // shift 1 (= raw positive PMI): the deterministic pairs win
    val got = TextOps.sppmiTopPairs(docs, "doc_id", "text", window = 1,
      shiftK = 1.0, minCount = 2L, topK = 5).collect()
    val top = got(0)
    assert(Set(top.getAs[String]("w"), top.getAs[String]("c")) ==
      Set("gamma", "delta") ||
      Set(top.getAs[String]("w"), top.getAs[String]("c")) ==
      Set("alpha", "beta"), got.mkString(", "))
    assert(top.getAs[Double]("sppmi_r") > 0.0)
    // a shift larger than any PMI in this corpus clips everything to 0
    val clipped = TextOps.sppmiTopPairs(docs, "doc_id", "text",
      window = 1, shiftK = 1000.0, minCount = 2L, topK = 5).collect()
    assert(clipped.forall(_.getAs[Double]("sppmi_r") == 0.0))
  }

  test("rarefactionCurve: e_distinct is monotone in the fraction and " +
      "bounded by the true vocabulary size") {
    val docs = (1 to 50).map(i =>
      (i.toLong, s"tok${i % 17} tok${i % 5} common"))
      .toDF("doc_id", "text")
    val got = TextOps.rarefactionCurve(docs, "text",
      Seq(0.05, 0.25, 1.0)).collect()
    val e = got.map(_.getAs[Double]("e_distinct_r"))
    assert(e(0) < e(1) && e(1) < e(2), e.mkString(", "))
    assert(e(2) <= got(2).getAs[Long]("v_total").toDouble)
  }

  test("atkinsonGe: a perfectly equal group scores 0 on every index; " +
      "an unequal one is positive and ordered A(0.5) < A(1) < A(2)") {
    val eq = Seq.fill(10)(("a", 500L)).toDF("g", "y")
    val r = Profile.atkinsonGe(eq, "g", "y").collect()(0)
    assert(r.getAs[Double]("atkinson05_r") == 0.0)
    assert(r.getAs[Double]("atkinson1_r") == 0.0)
    assert(r.getAs[Double]("atkinson2_r") == 0.0)
    assert(r.getAs[Double]("ge2_r") == 0.0)
    val uneq = (Seq.fill(9)(("b", 100L)) :+ ("b", 10000L)).toDF("g", "y")
    val u = Profile.atkinsonGe(uneq, "g", "y").collect()(0)
    val (a05, a1, a2) = (u.getAs[Double]("atkinson05_r"),
      u.getAs[Double]("atkinson1_r"), u.getAs[Double]("atkinson2_r"))
    assert(a05 > 0 && a05 < a1 && a1 < a2, u.toString)
  }
}
