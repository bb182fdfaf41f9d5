package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase

/** Hand cases for the ranking-distance + decomposition batch. */
class RankDistSpec extends SparkTestBase {
  import spark.implicits._

  // items scored so ranking A is 1..4 by score desc; B reverses it
  private val agree = Seq(("a", 40L, 40L), ("b", 30L, 30L),
    ("c", 20L, 20L), ("d", 10L, 10L)).toDF("item", "s1", "s2")
  private val reverse = Seq(("a", 40L, 10L), ("b", 30L, 20L),
    ("c", 20L, 30L), ("d", 10L, 40L)).toDF("item", "s1", "s2")

  test("footrule: identical rankings give 0; full reversal hits the " +
      "permutation maximum ⌊n²/2⌋ (norm = 1) with max_disp = n−1") {
    val r1 = RankDist.footrule(agree, "item", "s1", "s2").collect()(0)
    assert(r1.getAs[Long]("footrule") == 0L, r1.toString)
    assert(r1.getAs[Double]("footrule_norm_r") == 0.0, r1.toString)
    val r2 = RankDist.footrule(reverse, "item", "s1", "s2").collect()(0)
    assert(r2.getAs[Long]("footrule") == 8L, r2.toString) // 3+1+1+3
    assert(r2.getAs[Long]("max_disp") == 3L, r2.toString)
    assert(r2.getAs[Double]("footrule_norm_r") == 1.0, r2.toString)
  }

  test("kendallDistance: identity gives D = 0, τ = 1; reversal gives " +
      "D = n_pairs, τ = −1") {
    val r1 = RankDist.kendallDistance(agree, "item", "s1", "s2")
      .collect()(0)
    assert(r1.getAs[Long]("discordant") == 0L, r1.toString)
    assert(r1.getAs[Double]("tau_a_r") == 1.0, r1.toString)
    val r2 = RankDist.kendallDistance(reverse, "item", "s1", "s2")
      .collect()(0)
    assert(r2.getAs[Long]("discordant") == 6L, r2.toString)
    assert(r2.getAs[Double]("tau_a_r") == -1.0, r2.toString)
  }

  test("rankTurbulence: identity contributes 0 everywhere; a 1↔2 swap " +
      "puts 1/2 on both swapped items") {
    val zero = RankDist.rankTurbulence(agree, "item", "s1", "s2")
      .collect()
    assert(zero.forall(_.getAs[Double]("rtd_r") == 0.0))
    val swap = Seq(("a", 40L, 30L), ("b", 30L, 40L), ("c", 20L, 20L),
      ("d", 10L, 10L)).toDF("item", "s1", "s2")
    val m = RankDist.rankTurbulence(swap, "item", "s1", "s2").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("rtd_r")).toMap
    assert(m("a") == 0.5 && m("b") == 0.5 && m("c") == 0.0, m.toString)
  }

  test("oaxacaBlinder: equal within-group lines make the gap fully " +
      "explained (unexplained = 0)") {
    // both groups on y = 2x; A at x∈{0,2}, B at x∈{1,3}
    val df = Seq(("A", 0.0, 0.0), ("A", 2.0, 4.0),
      ("B", 1.0, 2.0), ("B", 3.0, 6.0)).toDF("g", "x", "y")
    val r = RankDist.oaxacaBlinder(df, "g", "A", "B", "x", "y")
      .collect()(0)
    assert(r.getAs[Double]("gap_r") == -2.0, r.toString)
    assert(r.getAs[Double]("explained_r") == -2.0, r.toString)
    assert(r.getAs[Double]("unexplained_r") == 0.0, r.toString)
  }

  test("dieboldMariano: a constant series nulls DM (zero-variance " +
      "differential); a period-7 series makes lag-7 win (DM < 0)") {
    def ts(day: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-${day}%02d 10:00:00")
    def mk(xs: Seq[Int]) = xs.zipWithIndex.flatMap { case (x, d) =>
      (0 until x).map(e => (e.toLong, "k", ts(1 + d)))
    }.toDF("id", "k", "t")
    val const = mk(Seq.fill(21)(4))
    val r1 = Forecast.dieboldMariano(const, "k", "t", 7).collect()(0)
    assert(r1.getAs[Double]("mean_d_r") == 0.0, r1.toString)
    assert(r1.isNullAt(r1.fieldIndex("dm_r")), r1.toString)
    // weekly sawtooth: lag-7 is exact, lag-1 always misses by 1+
    val period = mk((0 until 28).map(d => 3 + (d % 7)))
    val r2 = Forecast.dieboldMariano(period, "k", "t", 7).collect()(0)
    assert(r2.getAs[Double]("mean_d_r") < 0, r2.toString)
    assert(r2.getAs[Double]("dm_r") < 0, r2.toString)
  }
}
