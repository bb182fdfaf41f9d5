package graft.ops

import graft.SparkTestBase

class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  // 3 docs, query = {apple}: doc 1 has tf=2/dl=4, doc 2 tf=1/dl=2,
  // doc 3 no hit. N=3, avgdl=(4+2+3)/3=3, df(apple)=2.
  private val docs = Seq(
    (1L, "apple pie apple tart"),
    (2L, "apple cake"),
    (3L, "banana bread loaf")
  ).toDF("doc_id", "text")

  private def bm25(tf: Double, dl: Double, df: Double, n: Double,
      avgdl: Double, k1: Double = 1.2, b: Double = 0.75): Double = {
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
  }

  test("scores match the hand-computed Okapi formula") {
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("apple"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val expected1 = BigDecimal(bm25(2, 4, 2, 3, 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected2 = BigDecimal(bm25(1, 2, 2, 3, 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet == Set(1L, 2L))
    assert(math.abs(got(1L) - expected1) < 1e-9)
    assert(math.abs(got(2L) - expected2) < 1e-9)
  }

  test("documents without any query term never appear") {
    val ids = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("banana"), 10).collect().map(_.getLong(0)).toSet
    assert(ids == Set(3L))
  }

  test("higher tf wins over longer length at equal df (ranking order)") {
    val rows = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("apple"), 10).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("n_terms_hit counts distinct matched query terms") {
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("apple", "pie"), 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 2L && got(2L) == 1L)
  }

  test("k caps the result deterministically") {
    val one = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("apple"), 1).collect()
    assert(one.length == 1 && one.head.getLong(0) == 1L)
  }

  test("empty corpus and empty-match query are empty, not errors") {
    assert(Retrieval.bm25TopK(docs.limit(0), "doc_id", "text",
      Seq("apple"), 5).count() == 0L)
    assert(Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("zzz"), 5).count() == 0L)
  }

  test("rrfFuse: hand-computed scores; multi-list items outrank " +
      "single-list heads; rank-only (scores never enter)") {
    import spark.implicits._
    // doc 10 is mid-ranked on BOTH lists; docs 1 and 2 head one list each
    val lex = Seq((1L, 1), (10L, 2), (3L, 3)).toDF("doc_id", "rank")
    val vec = Seq((2L, 1), (10L, 3), (4L, 2)).toDF("doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(lex, vec), "doc_id", 60, 10)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lists"), r.getAs[Double]("rrf"))).toMap
    def s(ranks: Int*) = BigDecimal(ranks.map(r => 1.0 / (60 + r)).sum)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(10L) == ((2L, s(2, 3))))
    assert(got(1L) == ((1L, s(1))))
    assert(got(2L) == ((1L, s(1))))
    // 1/62 + 1/63 > 1/61: the doubly-listed doc wins both heads
    assert(got(10L)._2 > got(1L)._2 && got(10L)._2 > got(2L)._2)
  }

  test("rrfFuse: topN cap and (rrf desc, id) tie-break order") {
    import spark.implicits._
    val a = Seq((5L, 1), (6L, 2)).toDF("doc_id", "rank")
    val b = Seq((7L, 1), (8L, 2)).toDF("doc_id", "rank")
    val rows = Retrieval.rrfFuse(Seq(a, b), "doc_id", 60, 3)
      .collect().map(_.getAs[Long]("doc_id"))
    // ties: (5,7) at 1/61 then (6,8) at 1/62 — id breaks each tie
    assert(rows.toSeq == Seq(5L, 7L, 6L))
  }

  test("rankingMetrics: hand example — hits, precision, recall, MRR, " +
      "nDCG from a 3-deep ranking") {
    import spark.implicits._
    // query 1: relevant at rn 1 and 3, one more relevant unretrieved.
    // query 2: nothing relevant retrieved but 1 relevant exists.
    // query 3: no relevant documents at all.
    val ranked = Seq(
      (1L, 1, 101L), (1L, 2, 102L), (1L, 3, 103L),
      (2L, 1, 201L), (2L, 2, 202L), (2L, 3, 203L),
      (3L, 1, 301L), (3L, 2, 302L), (3L, 3, 303L)
    ).toDF("q_id", "rn", "neighbor_id")
    val rel = Seq((1L, 101L), (1L, 103L), (1L, 199L), (2L, 299L))
      .toDF("q_id", "neighbor_id")
    val got = Retrieval.rankingMetrics(ranked, rel, 3).collect()
      .map(r => r.getLong(0) -> r).toMap
    def log2d(x: Double) = math.log(x) / math.log(2.0)
    val g = (i: Int) => BigDecimal(1.0 / log2d(i + 1.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    // q1: hits 2/3, recall 2/3, mrr 1, ndcg = (g1+g3)/(g1+g2+g3)
    assert(got(1L).getLong(1) == 3 && got(1L).getLong(2) == 2)
    assert(got(1L).getDouble(3) == 0.666667) // precision@3
    assert(got(1L).getDouble(4) == 0.666667) // recall
    assert(got(1L).getDouble(5) == 1.0)      // mrr
    val wantNdcg = ((g(1) + g(3)) / (g(1) + g(2) + g(3)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got(1L).getDouble(6) - wantNdcg) < 1e-9)
    // q2: 0 hits but 1 relevant → zeros, not nulls
    assert(got(2L).getLong(2) == 0 && got(2L).getDouble(4) == 0.0
      && got(2L).getDouble(5) == 0.0 && got(2L).getDouble(6) == 0.0)
    // q3: no relevant → recall/ndcg null, precision/mrr defined
    assert(got(3L).getLong(1) == 0 && got(3L).isNullAt(4)
      && got(3L).getDouble(5) == 0.0 && got(3L).isNullAt(6))
  }

  test("averagePrecision: hand AP and MAP, no-rel query excluded") {
    import spark.implicits._
    // q1: rel hits at ranks 1 and 3 of 2 relevant →
    // AP = (P@1 + P@3)/2 = (1 + 2/3)/2 = 0.833333
    // q2: no relevant docs → null AP, excluded from MAP
    val ranked = Seq(
      (1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L),
      (2L, 1, 20L), (2L, 2, 21L))
      .toDF("q_id", "rn", "neighbor_id")
    val rel = Seq((1L, 10L), (1L, 12L)).toDF("q_id", "neighbor_id")
    val got = Retrieval.averagePrecision(ranked, rel, 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    val q1 = got(1L)
    assert(q1.getAs[Long]("n_rel") == 2 && q1.getAs[Long]("hits") == 2)
    assert(q1.getAs[Double]("ap_r") == 0.833333)
    assert(q1.getAs[Double]("map_r") == 0.833333)
    val q2 = got(2L)
    assert(q2.getAs[Long]("n_rel") == 0 && q2.isNullAt(
      q2.fieldIndex("ap_r")))
    assert(q2.getAs[Double]("map_r") == 0.833333)
  }

  test("bm25Prf: expansion terms come from the feedback set only and " +
      "recall a doc the seed query cannot rank") {
    import spark.implicits._
    // doc 1-2: seed-term docs that also contain "delta"; doc 3: has
    // ONLY "delta" (invisible to the seed query); doc 4: noise
    val docs = Seq(
      (1L, "spark spark delta alpha beta"),
      (2L, "spark merge delta gamma zeta"),
      (3L, "delta delta delta epsilon iota"),
      (4L, "omega kappa sigma tau phi")).toDF("doc_id", "text")
    val got = Retrieval.bm25Prf(docs, "doc_id", "text",
      Seq("spark", "merge", "window"), fbDocs = 2, fbTerms = 1, k = 4)
      .collect()
    val ids = got.map(_.getAs[Long]("doc_id")).toSet
    // doc 3 is reachable ONLY via the expansion term ("delta", the
    // most document-frequent length>=4 term in the feedback set)
    assert(ids.contains(3L), got.mkString(";"))
    assert(!ids.contains(4L))
    // ranks are 1..n with the rounded-score ordering
    assert(got.map(_.getAs[Int]("rnk")).toSeq ==
      (1 to got.length).toSeq)
  }

  test("rboExt: identical rankings score exactly 1; disjoint score 0; " +
      "a hand overlap matches the closed form") {
    def ranks(ids: Seq[Long]) = ids.zipWithIndex
      .map { case (id, i) => (id, i + 1) }.toDF("id", "rnk")
    val a = ranks(Seq(1L, 2L, 3L))
    val p = 0.5
    val same = Retrieval.rboExt(a, ranks(Seq(1L, 2L, 3L)), "id", "rnk",
      3, p).collect()(0)
    assert(same.getAs[Double]("rbo_ext_r") == 1.0)
    val disj = Retrieval.rboExt(a, ranks(Seq(7L, 8L, 9L)), "id", "rnk",
      3, p).collect()(0)
    assert(disj.getAs[Double]("rbo_ext_r") == 0.0)
    // swap ranks 1 and 2: X_1 = 0, X_2 = 2, X_3 = 3
    // RBO_ext = (1-p)/p (0/1 p + 2/2 p^2 + 3/3 p^3) + 3/3 p^3
    val swap = Retrieval.rboExt(a, ranks(Seq(2L, 1L, 3L)), "id", "rnk",
      3, p).collect()(0)
    val expect = (1 - p) / p * (p * p + p * p * p) +
      math.pow(p, 3)
    assert(math.abs(swap.getAs[Double]("rbo_ext_r") - expect) < 1e-6,
      s"got ${swap.getAs[Double]("rbo_ext_r")} want $expect")
  }

  test("errAtK: single perfect-grade hit at rank 1 gives R(g_max)/1; " +
      "the cascade discounts a second hit by (1 - R)") {
    val one = Seq((1, 3)).toDF("rnk", "g")
    val r3 = (math.pow(2, 3) - 1) / 8.0 // 0.875
    val got1 = Retrieval.errAtK(one, "rnk", "g", 10, 3).collect()(0)
    assert(math.abs(got1.getAs[Double]("err_r") - r3) < 1e-6)
    val two = Seq((1, 3), (2, 3)).toDF("rnk", "g")
    val got2 = Retrieval.errAtK(two, "rnk", "g", 10, 3).collect()(0)
    val expect = r3 + (1 - r3) * r3 / 2
    assert(math.abs(got2.getAs[Double]("err_r") - expect) < 1e-6,
      s"got ${got2.getAs[Double]("err_r")} want $expect")
  }
}
