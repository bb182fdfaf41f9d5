package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CorpusAuditSpec extends SparkTestBase {
  import spark.implicits._

  test("sourceOverlapMatrix: hand shingle sets — partial overlap, " +
      "zero-overlap pair emitted with jaccard 0") {
    // A: {a b c, b c d}; B: {a b c, b c e} → inter 1, union 3 → 1/3
    // C: {x y z} → disjoint from both
    val docs = Seq(
      (1L, "a b c d", "A"), (2L, "a b c e", "B"), (3L, "x y z", "C"))
      .toDF("doc_id", "text", "source")
    val got = CorpusAudit.sourceOverlapMatrix(docs, "source", "text")
      .orderBy("key_a", "key_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got == Seq(
      ("A", "B", 2L, 2L, 1L, 0.333333),
      ("A", "C", 2L, 1L, 0L, 0.0),
      ("B", "C", 2L, 1L, 0L, 0.0)), got.toString)
  }

  test("sourceOverlapMatrix: cross-doc shingle dedup within a slice " +
      "(two docs sharing a shingle count it once)") {
    val docs = Seq(
      (1L, "a b c", "A"), (2L, "a b c", "A"), (3L, "a b c", "B"))
      .toDF("doc_id", "text", "source")
    val got = CorpusAudit.sourceOverlapMatrix(docs, "source", "text")
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 1L, 1L)), got.toSeq.toString)
  }

  private def js(rows: Seq[(Long, String, String)]) =
    CorpusAudit.jsDivergenceMatrix(
        rows.toDF("doc_id", "text", "source"), "source", "text")
      .orderBy("key_a", "key_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq

  test("jsDivergenceMatrix: identical → 0, disjoint → ln 2, " +
      "hand-computed mixed case") {
    // identical unigram distributions
    val same = js(Seq((1L, "a b", "A"), (2L, "a b", "B")))
    assert(same.size == 1 && math.abs(same.head._3) < 1e-9, same.toString)
    // disjoint vocabularies: JS = ln 2
    val disj = js(Seq((1L, "a", "A"), (2L, "b", "B")))
    assert(math.abs(disj.head._3 - math.log(2)) < 1e-6, disj.toString)
    // A: p = {a: 2/3, b: 1/3}, B: {a: 1/3, b: 2/3} →
    // JS = ln2 − [−(2/3)ln(2/3) − (1/3)ln(1/3)] = 0.056633 (6 d.p.)
    val mixed = js(Seq((1L, "a a b", "A"), (2L, "a b b", "B")))
    assert(math.abs(mixed.head._3 - 0.056633) < 1e-6, mixed.toString)
  }

  test("jsDivergenceMatrix: zero-overlap pairs appear without a join row " +
      "(tail-scalar path) and JS is bounded by ln 2") {
    val rows = Seq((1L, "a a b c", "A"), (2L, "b c c d", "B"),
      (3L, "x y z", "C"))
    val got = js(rows)
    assert(got.map(p => (p._1, p._2)) ==
      Seq(("A", "B"), ("A", "C"), ("B", "C")), got.toString)
    assert(got.forall(p => p._3 >= 0 && p._3 <= math.log(2) + 1e-9),
      got.toString)
    // disjoint pairs hit exactly ln 2
    assert(math.abs(got(1)._3 - math.log(2)) < 1e-6, got.toString)
  }

  test("nearDupLeakage: threshold filter, unordered-pair normalization, " +
      "per-pair counts and mean jaccard") {
    val scored = Seq(
      (1L, 2L, 0.9), // A-B
      (2L, 5L, 0.7), // B-A → same unordered pair
      (1L, 3L, 0.6), // A-A within-source
      (3L, 4L, 0.4)  // below threshold, dropped
    ).toDF("doc_a", "doc_b", "jaccard")
    val docs = Seq((1L, "A"), (2L, "B"), (3L, "A"), (4L, "B"), (5L, "A"))
      .toDF("doc_id", "source")
    val got = CorpusAudit.nearDupLeakage(scored, docs, "doc_id", "source",
        0.5)
      .orderBy("key_lo", "key_hi").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(("A", "A", 1L, 0.6), ("A", "B", 2L, 0.8)),
      got.toString)
  }

  test("coverageCurve: first-occurrence attribution by min shard, " +
      "cumulative total equals the corpus distinct-gram count") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 40 docs with one gram each: half share a common bigram, half are
    // unique — the common gram must be attributed to exactly one shard
    val docs = (0L until 40L).map { i =>
      (i, if (i % 2 == 0) "common gram" else s"unique$i gram$i")
    }.toDF("doc_id", "text")
    val got = CorpusAudit.coverageCurve(docs, "doc_id", "text", 2, 4)
      .orderBy("shard").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // 1 shared + 20 unique bigrams in total, every new_gram counted once
    assert(got.last._3 == 21L, got.toSeq)
    assert(got.map(_._2).sum == 21L)
    // monotone cumulative
    assert(got.map(_._3).toSeq == got.scanLeft(0L)(_ + _._2).drop(1).toSeq)
  }

  test("corpusFingerprint: invariant to row order; one changed doc " +
      "changes its slice and the root; '*' covers the corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "a", "alpha text"), (2L, "a", "beta text"),
      (3L, "b", "gamma text")).toDF("doc_id", "src", "text")
    def fp(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
      CorpusAudit.corpusFingerprint(df, "src", "text").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val base = fp(docs)
    assert(base("*")._1 == 3L && base("a")._1 == 2L)
    // row order / partitioning must not matter
    assert(fp(docs.orderBy(col("doc_id").desc).repartition(3)) == base)
    // a one-doc edit moves its slice fingerprint AND the root, not 'b'
    val edited = fp(Seq((1L, "a", "alpha text EDITED"),
      (2L, "a", "beta text"), (3L, "b", "gamma text"))
      .toDF("doc_id", "src", "text"))
    assert(edited("a")._2 != base("a")._2)
    assert(edited("*")._2 != base("*")._2)
    assert(edited("b") == base("b"))
  }

  test("dpNoisedRelease: deterministic across runs; small groups " +
      "suppressed; contributions clamped; noise bounded by b·ln(10⁶)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // group a: 12 rows of 1000 (clamped to 500); group b: 3 rows (< 10)
    val rows = (1 to 12).map(i => ("a", 1000L)) ++
      (1 to 3).map(_ => ("b", 7L))
    val df = rows.toDF("grp", "v")
    def run() = CorpusAudit.dpNoisedRelease(df, "grp", "v",
      eps = 1.0, clamp = 500L, minGroup = 10L).collect()
    val r1 = run(); val r2 = run()
    assert(r1.toSeq == r2.toSeq, "released values must be deterministic")
    assert(r1.length == 1 && r1.head.getString(0) == "a",
      "group b (n=3 < 10) must be suppressed")
    val row = r1.head
    assert(row.getLong(1) == 12L)
    // exact expectation: replicate the md5-uniform Laplace inversion —
    // the clamp makes the noiseless sum 12·500 = 6000, not 12000
    def lap(key: String, b: Double): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val u = (java.lang.Long.parseLong(hex, 16) % 1000000 + 0.5) / 1e6
      -b * math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(3) == r6(6000.0 + lap("a#sum", 500.0)),
      row.toString)
    assert(row.getDouble(2) == r6(12.0 + lap("a#count", 1.0)),
      row.toString)
    assert(row.getDouble(2) != 12.0, "noise must actually perturb")
  }

  test("captureRecapture: p = 1 census gives exact N with zero error; " +
      "duplicates do not inflate the estimate (dedup-first)") {
    import spark.implicits._
    val docs = (1 to 50).map(i => s"doc $i").toDF("text")
    val r = CorpusAudit.captureRecapture(docs, "text", 1.1, 1.1)
      .collect().head
    assert(r.getAs[Long]("n_true") == 50)
    assert(r.getAs[Long]("m") == 50)
    assert(r.getAs[Double]("chapman_r") == 50.0)
    assert(r.getAs[Double]("rel_err_r") == 0.0)
    // 3 copies of every doc: the distinct universe is unchanged
    val dup = (1 to 150).map(i => s"doc ${(i - 1) % 50 + 1}").toDF("text")
    val r2 = CorpusAudit.captureRecapture(dup, "text", 1.1, 1.1)
      .collect().head
    assert(r2.getAs[Long]("n_true") == 50)
    assert(r2.getAs[Double]("chapman_r") == 50.0)
  }

  test("tCloseness: a pure group at TV 0.5 against a 50/50 global " +
      "breaches; a matching group reads 0") {
    import spark.implicits._
    val docs = Seq(("a", "s1"), ("a", "s1"), ("b", "s1"), ("b", "s2"),
      ("b", "s2"), ("b", "s1")).toDF("g", "sens")
    // global: s1 4/6, s2 2/6; group a: (1, 0) -> TV = (|1-2/3|+|0-1/3|)/2 = 1/3
    // group b: (1/2, 1/2) -> TV = (|1/2-2/3|+|1/2-1/3|)/2 = 1/6
    val got = CorpusAudit.tCloseness(docs, Seq("g"), "sens", 0.25)
      .orderBy("g").collect()
    assert(math.abs(got(0).getAs[Double]("tv_r") - 1.0 / 3) < 1e-6)
    assert(got(0).getAs[Boolean]("breached"))
    assert(math.abs(got(1).getAs[Double]("tv_r") - 1.0 / 6) < 1e-6)
    assert(!got(1).getAs[Boolean]("breached"))
  }

  test("equalizedOdds: hand TPR/FPR per group, gaps over defined " +
      "rates, null where a class is empty") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // g1: pos {T,F}, neg {T}: tpr 1/2, fpr 1
    // g2: pos {T}, neg {F,F}: tpr 1, fpr 0
    // g3: all positives -> fpr NULL
    val df = Seq(("g1", true, true), ("g1", true, false),
      ("g1", false, true),
      ("g2", true, true), ("g2", false, false), ("g2", false, false),
      ("g3", true, true)).toDF("g", "truth", "pred")
    val got = CorpusAudit.equalizedOdds(df, "g", col("pred"),
      col("truth")).orderBy("g").collect()
    assert(got(0).getAs[Double]("tpr_r") == 0.5)
    assert(got(0).getAs[Double]("fpr_r") == 1.0)
    assert(got(1).getAs[Double]("tpr_r") == 1.0)
    assert(got(1).getAs[Double]("fpr_r") == 0.0)
    assert(got(2).isNullAt(got(2).fieldIndex("fpr_r")))
    assert(got(0).getAs[Double]("tpr_gap_r") == 0.5)
    assert(got(0).getAs[Double]("fpr_gap_r") == 1.0)
  }

  test("randomizedResponse: deterministic coins; the estimator is the " +
      "exact debias of the observed rate") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (1L to 200L).map(i => (i, i % 4 == 0L))
      .toDF("id", "flag")
    val r = CorpusAudit.randomizedResponse(df, "id", col("flag"), 0.75)
      .collect()(0)
    assert(r.getAs[Long]("n") == 200L)
    assert(r.getAs[Double]("true_rate_r") == 0.25)
    val obs = r.getAs[Double]("observed_rate_r")
    val est = r.getAs[Double]("estimated_r")
    assert(math.abs(est - (obs - 0.125) / 0.75) < 1e-5)
    // the debiased estimate should land near the true rate
    assert(math.abs(est - 0.25) < 0.15, r.toString)
    // determinism: the same call returns the same row
    val r2 = CorpusAudit.randomizedResponse(df, "id", col("flag"), 0.75)
      .collect()(0)
    assert(r2 == r)
  }
}
