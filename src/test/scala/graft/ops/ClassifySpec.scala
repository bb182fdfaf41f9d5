package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Hand cases for the round-12 classify/select ops. */
class ClassifySpec extends SparkTestBase {
  import spark.implicits._

  test("naiveBayesLangConfusion: disjoint char vocabularies classify " +
      "perfectly (diagonal confusion)") {
    val docs = Seq(
      (1L, "aaaa aaaa aaaa", "a"), (2L, "aaaa aaaa", "a"),
      (3L, "zzzz zzzz zzzz", "z"), (4L, "zzzz zzzz", "z"))
      .toDF("doc_id", "text", "lang")
    val got = TextOps.naiveBayesLangConfusion(docs, "doc_id", "text",
        "lang", 64).orderBy("true_lang", "pred_lang")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2))).toSeq
    assert(got == Seq(("a", "a", 2L), ("z", "z", 2L)), got.toString)
  }

  test("mccF1Sweep: hand confusion at one threshold; perfect " +
      "separation reads MCC = 1") {
    val df = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
      .toDF("s", "y")
    val got = Fit.mccF1Sweep(df, col("s"), col("y"), Seq(0.5))
      .collect()(0)
    assert(got.getAs[Long]("tp") == 2 && got.getAs[Long]("tn") == 2)
    assert(got.getAs[Double]("f1_r") == 1.0)
    assert(got.getAs[Double]("mcc_r") == 1.0)
    val mixed = Fit.mccF1Sweep(df, col("s"), col("y"), Seq(0.85))
      .collect()(0)
    // tp=1 fn=1 fp=0 tn=2: prec 1, rec 0.5, f1 2/3
    assert(mixed.getAs[Double]("precision_r") == 1.0)
    assert(mixed.getAs[Double]("recall_r") == 0.5)
    assert(math.abs(mixed.getAs[Double]("f1_r") - 2.0 / 3) < 1e-6)
  }

  test("kCenterCoreset: starts at the min id, picks the farthest " +
      "point next, radius non-increasing") {
    val e = Seq((5L, Seq(1.0f, 0.0f)), (7L, Seq(1.0f, 0.05f)),
      (9L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val got = Similarity.kCenterCoreset(e, 2).orderBy("step")
      .collect()
    assert(got(0).getAs[Long]("center_id") == 5L)
    assert(got(1).getAs[Long]("center_id") == 9L) // orthogonal = far
    assert(got(1).getAs[Double]("radius_r")
      <= got(0).getAs[Double]("radius_r"))
  }

  test("lmDirichletTopK: higher tf of a query term ranks first; " +
      "hit docs only") {
    val docs = Seq((1L, "spark spark spark alpha"),
      (2L, "spark beta gamma delta"),
      (3L, "omega kappa sigma tau")).toDF("doc_id", "text")
    val got = Retrieval.lmDirichletTopK(docs, "doc_id", "text",
      Seq("spark"), 10, mu = 100.0).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    assert(got(0).getAs[Double]("ql_r") > got(1).getAs[Double]("ql_r"))
  }

  test("fellegiSunterEm: a duplicate-heavy block drives m above u on " +
      "every feature; params stay probabilities; deterministic") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over it", "s1", "en", 30L),
      (2L, "the quick brown fox jumps over it", "s1", "en", 30L),
      (3L, "the quick brown fox jumps over at", "s1", "en", 30L),
      (4L, "completely different text body one", "s2", "de", 99L),
      (5L, "another unrelated document body xx", "s3", "fr", 60L),
      (6L, "yet more unrelated content here yy", "s4", "zh", 12L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val got = Dedup.fellegiSunterEm(docs, "doc_id", "text", w = 6,
      iters = 3).collect()
    assert(got.length == 3)
    got.foreach { r =>
      val (m, u, p) = (r.getAs[Double]("m_r"), r.getAs[Double]("u_r"),
        r.getAs[Double]("p_match_r"))
      assert(p > 0 && p < 1, r.toString)
      assert(m >= 0 && m <= 1 && u >= 0 && u <= 1)
      assert(m > u, s"match class must agree more: $r")
    }
    val again = Dedup.fellegiSunterEm(docs, "doc_id", "text", w = 6,
      iters = 3).collect()
    assert(got.toSeq == again.toSeq)
  }
}
