package graft.ops

import scala.util.Random

import graft.SparkTestBase

class HeavySpec extends SparkTestBase {
  import spark.implicits._

  /** Zipf-ish skewed stream over a vocabulary LARGER than the sketch
    * capacity, so evictions (the lossy path) actually run. */
  private def zipfStream(n: Int, vocab: Int, seed: Long): Seq[String] = {
    val rnd = new Random(seed)
    val weights = (1 to vocab).map(i => 1.0 / i)
    val total = weights.sum
    val cum = weights.map(_ / total).scanLeft(0.0)(_ + _).tail
    (1 to n).map { _ =>
      val u = rnd.nextDouble()
      s"t${cum.indexWhere(u <= _) + 1}"
    }
  }

  test("MG summary keeps every item with count > n/(k+1) — superset " +
    "guarantee under reduce AND merge evictions (fixed-seed property)") {
    val k = 10
    val mg = new Heavy.MisraGries(k)
    for (seed <- 1L to 5L) {
      val stream = zipfStream(4000, 50, seed)
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
      // simulate 8 partitions: per-chunk reduce folds, then merges
      val summary = stream.grouped(500)
        .map(_.foldLeft(mg.zero)(mg.reduce))
        .foldLeft(mg.zero)(mg.merge)
      assert(summary.size <= k)
      val bound = stream.size.toDouble / (k + 1)
      val mustSurvive = exact.filter(_._2 > bound).keySet
      assert(mustSurvive.subsetOf(summary.keySet),
        s"seed $seed: missing ${mustSurvive -- summary.keySet}")
      // undercount bound: tracked estimates are within n/(k+1) of truth
      summary.foreach { case (t, est) =>
        assert(est <= exact(t) && exact(t) - est <= bound.toLong + 1)
      }
    }
  }

  test("capacity-1 MG is Boyer-Moore majority") {
    val mg = new Heavy.MisraGries(1)
    val s = Seq("a", "b", "a", "c", "a", "a", "b", "a")
    val out = s.foldLeft(mg.zero)(mg.reduce)
    assert(out.keySet == Set("a"))
  }

  test("heavyHitters equals the brute-force GROUP BY under eviction " +
    "pressure (vocab 50 > k 10, phi 0.1)") {
    val stream = zipfStream(4000, 50, seed = 7L)
    val df = stream.toDF("term").repartition(8)
    val got = Heavy.heavyHitters(df, "term", phi = 0.1, k = 10)
      .orderBy("term").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val n = stream.size
    val want = stream.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c > n * 0.1 }.toSeq.sortBy(_._1)
    assert(got == want)
  }

  test("k too small for phi is rejected (the exactness precondition)") {
    val df = Seq("a").toDF("term")
    intercept[IllegalArgumentException] {
      Heavy.heavyHitters(df, "term", phi = 0.01, k = 10)
    }
  }

  test("empty input yields an empty result") {
    val df = Seq.empty[String].toDF("term")
    assert(Heavy.heavyHitters(df, "term", 0.1, 10).count() == 0L)
  }
}
