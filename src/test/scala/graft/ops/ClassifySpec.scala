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

/** Parity pin for the driver-local FS-EM port: the former RELATIONAL
  * recursion (per-iteration crossJoin + decimal aggregate + checkpoint,
  * reproduced here verbatim) and the bounded-contingency driver-local
  * recursion must emit identical rows — same 12-dp trajectory, same
  * 6-dp outputs. */
class FsEmParitySpec extends graft.SparkTestBase {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.{Column, DataFrame}
  import spark.implicits._

  private def relationalFsEm(docs: DataFrame, idCol: String,
      w: Int, iters: Int, p0: Double, m0: Double, u0: Double): DataFrame = {
    val cand = graft.ops.Dedup.snmCandidates(docs, idCol, "text", w, 24)
    val meta = docs.select(col(idCol), col("source"), col("lang"),
      col("n_chars"))
    val pairs = cand
      .join(meta.select(col(idCol).as("doc_a"), col("source").as("_sa"),
        col("lang").as("_la"), col("n_chars").as("_ca")), Seq("doc_a"))
      .join(meta.select(col(idCol).as("doc_b"), col("source").as("_sb"),
        col("lang").as("_lb"), col("n_chars").as("_cb")), Seq("doc_b"))
      .select((col("_sa") === col("_sb")).as("f1"),
        (col("_la") === col("_lb")).as("f2"),
        (abs(col("_ca") - col("_cb")) <= 2).as("f3"))
      .localCheckpoint()
    def t12(c: Column) = round(c, 12).cast("decimal(28,12)")
    var par = spark.range(1).select(
      lit(p0).as("_p"), lit(m0).as("_m1"), lit(m0).as("_m2"),
      lit(m0).as("_m3"), lit(u0).as("_u1"), lit(u0).as("_u2"),
      lit(u0).as("_u3")).localCheckpoint()
    for (_ <- 1 to iters) {
      def lik(pcol: String, j: Int): Column =
        when(col(s"f$j"), col(s"_$pcol$j"))
          .otherwise(lit(1.0) - col(s"_$pcol$j"))
      val pm = lik("m", 1) * lik("m", 2) * lik("m", 3)
      val pu = lik("u", 1) * lik("u", 2) * lik("u", 3)
      val e = pairs.crossJoin(broadcast(par))
        .withColumn("_g", round(col("_p") * pm
          / (col("_p") * pm + (lit(1.0) - col("_p")) * pu), 12))
      val m = e.agg(count(lit(1)).cast("double").as("_n"),
        sum(t12(col("_g"))).cast("double").as("_sg"),
        sum(t12(col("_g") * when(col("f1"), 1.0).otherwise(0.0))).cast("double").as("_g1"),
        sum(t12(col("_g") * when(col("f2"), 1.0).otherwise(0.0))).cast("double").as("_g2"),
        sum(t12(col("_g") * when(col("f3"), 1.0).otherwise(0.0))).cast("double").as("_g3"),
        sum(t12((lit(1.0) - col("_g")) * when(col("f1"), 1.0).otherwise(0.0))).cast("double").as("_h1"),
        sum(t12((lit(1.0) - col("_g")) * when(col("f2"), 1.0).otherwise(0.0))).cast("double").as("_h2"),
        sum(t12((lit(1.0) - col("_g")) * when(col("f3"), 1.0).otherwise(0.0))).cast("double").as("_h3"))
      par = m.select(round(col("_sg") / col("_n"), 12).as("_p"),
        round(col("_g1") / col("_sg"), 12).as("_m1"),
        round(col("_g2") / col("_sg"), 12).as("_m2"),
        round(col("_g3") / col("_sg"), 12).as("_m3"),
        round(col("_h1") / (col("_n") - col("_sg")), 12).as("_u1"),
        round(col("_h2") / (col("_n") - col("_sg")), 12).as("_u2"),
        round(col("_h3") / (col("_n") - col("_sg")), 12).as("_u3"))
        .localCheckpoint()
    }
    val n = pairs.agg(count(lit(1)).as("n_pairs"))
    val feats = Seq(("f_source", "_m1", "_u1"), ("f_lang", "_m2", "_u2"),
      ("f_len", "_m3", "_u3")).map { case (f, mc, uc) =>
      n.crossJoin(broadcast(par))
        .select(lit(f).as("feature"), col("n_pairs"),
          round(col("_p"), 6).as("p_match_r"),
          round(col(mc), 6).as("m_r"), round(col(uc), 6).as("u_r"),
          round(when(col(mc) > 0 && col(uc) > 0,
            log(col(mc) / col(uc))), 6).as("w_agree_r"),
          round(when(col(mc) < 1 && col(uc) < 1,
            log((lit(1.0) - col(mc)) / (lit(1.0) - col(uc)))), 6)
            .as("w_disagree_r"))
    }
    feats.reduce(_ unionByName _).orderBy("feature")
  }

  test("driver-local FS-EM equals the former relational recursion") {
    val docs = (1L to 60L).map { i =>
      val src = if (i % 3 == 0) "a" else "b"
      val lang = if (i % 4 == 0) "en" else "de"
      val text = s"доку ment number ${i / 2} content block"
      (i, text, src, lang, 100L + (i % 7))
    }.toDF("doc_id", "text", "source", "lang", "n_chars")
    val want = relationalFsEm(docs, "doc_id", w = 6, iters = 3,
      p0 = 0.05, m0 = 0.9, u0 = 0.3).collect().map(_.toSeq)
    val got = graft.ops.Dedup.fellegiSunterEm(docs, "doc_id", "text",
      w = 6, iters = 3, p0 = 0.05, m0 = 0.9, u0 = 0.3)
      .collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }
}
