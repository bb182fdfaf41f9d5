package graft.ops

import graft.SparkTestBase

/** Hand cases for the lexical-richness family. */
class RichnessSpec extends SparkTestBase {
  import spark.implicits._

  test("mattr: all-repeated tokens score 1/window, all-distinct score " +
      "1, short docs are excluded") {
    val rep = Seq.fill(30)("a").mkString(" ")
    val dis = (1 to 30).map(i => s"w$i").mkString(" ")
    val short = "x y z"
    val df = Seq(("en", 1L, rep), ("en", 2L, dis), ("en", 3L, short))
      .toDF("lang", "doc_id", "text")
    val r = TextOps.mattr(df, "lang", "doc_id", "text", 25).collect()(0)
    assert(r.getAs[Long]("n_docs") == 2L, r.toString)
    // mean of 0.04 and 1.0
    assert(r.getAs[Double]("mattr_r") == 0.52, r.toString)
  }

  test("vocabRichness: hand panel on 'a a b' — K = 10⁴·2/9, " +
      "D = 1/3, Honoré = 200·ln3") {
    val df = Seq((1L, "a a b")).toDF("doc_id", "text")
    val r = TextOps.vocabRichness(df, "text").collect()(0)
    assert(r.getAs[Long]("n_tokens") == 3L && r.getAs[Long]("vocab") == 2L)
    assert(r.getAs[Long]("v1") == 1L && r.getAs[Long]("v2") == 1L)
    assert(math.abs(r.getAs[Double]("yule_k_r") - 20000.0 / 9) < 1e-4,
      r.toString)
    assert(math.abs(r.getAs[Double]("simpson_r") - 1.0 / 3) < 1e-6)
    assert(math.abs(r.getAs[Double]("honore_r") - 200 * math.log(3))
      < 1e-4, r.toString)
    assert(r.getAs[Double]("sichel_r") == 0.5)
  }

  test("hillEvenness: a uniform 4-type source hits 4 on every Hill " +
      "order with Pielou J = 1") {
    val df = Seq(("s1", "a b c d")).toDF("source", "text")
    val r = TextOps.hillEvenness(df, "source", "text").collect()(0)
    assert(r.getAs[Long]("hill0") == 4L)
    assert(math.abs(r.getAs[Double]("hill1_r") - 4.0) < 1e-5, r.toString)
    assert(r.getAs[Double]("hill2_r") == 4.0)
    assert(math.abs(r.getAs[Double]("pielou_r") - 1.0) < 1e-6)
  }

  test("selfBleuSampled: identical docs score 1, disjoint docs 0") {
    val same = (1L to 4L).map(i => (i, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val r1 = TextOps.selfBleuSampled(same, "doc_id", "text", 4)
      .collect()(0)
    assert(r1.getAs[Double]("self_bleu_r") == 1.0, r1.toString)
    assert(r1.getAs[Long]("n_pairs") == 12L)
    val disj = (1L to 4L).map(i => (i, s"u$i v$i w$i x$i"))
      .toDF("doc_id", "text")
    val r2 = TextOps.selfBleuSampled(disj, "doc_id", "text", 4)
      .collect()(0)
    assert(r2.getAs[Double]("self_bleu_r") == 0.0, r2.toString)
  }
}
