package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Hand cases for the clock/monitoring batch: Kuiper uniformity,
  * circular clock stats, Lomb–Scargle, the I-MR chart, Taylor's law. */
class ClockSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(day: Int, hour: Int, min: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-${day}%02d $hour%02d:$min%02d:00")

  test("kuiperUniform: a point mass at one minute gives V ≈ 1; a " +
      "spread over all minutes is far smaller") {
    val mass = (1 to 100).map(i => (i.toLong, ts(1 + i % 5, 12)))
      .toDF("id", "t")
    val v1 = Circular.kuiperUniform(mass, "t").collect()(0)
    // all mass in one 1/1440 cell: D+ = 1 − 1/1440, D− = 0 (F ≥ G
    // nowhere below), V ≈ 0.9993
    assert(v1.getAs[Double]("v_r") > 0.99, v1.toString)
    val spread = (0 until 1440).map(i =>
      (i.toLong, ts(1 + i % 7, i / 60, i % 60))).toDF("id", "t")
    val v2 = Circular.kuiperUniform(spread, "t").collect()(0)
    assert(v2.getAs[Double]("v_r") < 0.01, v2.toString)
    assert(v2.getAs[Long]("n") == 1440L)
  }

  test("clockStats: concentrated times give R̄ → 1 with the mean " +
      "direction at the mass; uniform times give R̄ → 0") {
    val conc = (1 to 50).map(i => ("a", ts(1 + i % 3, 6)))
      .toDF("k", "t")
    val r1 = Circular.clockStats(conc, "k", "t").collect()(0)
    assert(r1.getAs[Double]("rbar_r") > 0.999, r1.toString)
    // 06:00 is a quarter turn: θ = π/2 (bin center offset ≤ 2π/96)
    assert(math.abs(r1.getAs[Double]("mean_dir_r") - math.Pi / 2) < 0.1,
      r1.toString)
    assert(r1.getAs[Double]("kappa_r") > 100, r1.toString)
    val unif = (0 until 96).map(i => ("a", ts(1 + i % 7, i / 4, (i % 4) * 15)))
      .toDF("k", "t")
    val r2 = Circular.clockStats(unif, "k", "t").collect()(0)
    assert(r2.getAs[Double]("rbar_r") < 0.01, r2.toString)
    assert(r2.getAs[Double]("rayleigh_p_r") > 0.9, r2.toString)
  }

  test("lombScargle: a clean 7-day cycle observed on irregular days " +
      "peaks at period 7") {
    // 60 of 90 days observed (drop every third day — irregular), y =
    // strong 7-cycle + linear-free mean
    val rows = (0 until 90).filter(_ % 3 != 0).map { t =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(t.toLong)),
        (10 + 5 * math.cos(2 * math.Pi * t / 7)))
    }.toDF("day", "y")
    val got = TimeSeries.lombScargle(rows, "day", "y", Seq(3, 5, 7, 9))
    val byP = got.collect().map(r =>
      r.getAs[Int]("period") -> r.getAs[Double]("pnorm_r")).toMap
    assert(byP(7) > byP(3) * 5 && byP(7) > byP(5) * 5
      && byP(7) > byP(9) * 5, byP.toString)
  }

  test("imrChart: a stable series alarms nothing; an 8-day level " +
      "shift trips rule 4 (and the shift step can trip rule 1)") {
    def mk(xs: Seq[Int]) = xs.zipWithIndex.flatMap { case (x, d) =>
      (0 until x).map(e => (e.toLong, ts(1 + d, 10)))
    }.toDF("id", "t")
    // alternating 10/12 around the mean: no 3σ point, no 8-run
    val stable = mk(Seq(10, 12, 10, 12, 10, 12, 10, 12, 10, 12))
    val r1 = Control.imrChart(stable, "t").collect()(0)
    assert(r1.getAs[Long]("rule1") == 0 && r1.getAs[Long]("rule4") == 0,
      r1.toString)
    // 10 days at ~10 then 10 days at 30: the run above center trips
    // rule 4 at least once
    val shift = mk(Seq(10, 11, 10, 11, 10, 11, 10, 11, 10, 11,
      30, 30, 31, 30, 31, 30, 31, 30, 31, 30))
    val r2 = Control.imrChart(shift, "t").collect()(0)
    assert(r2.getAs[Long]("rule4") >= 1, r2.toString)
    assert(r2.getAs[Long]("n_days") == 20L)
  }

  test("imrChart rule 2 counts each side separately: +2σ, +2σ " +
      "closing a window that also holds a −2σ point fires even " +
      "though the signed sum is only 1") {
    def mk(xs: Seq[Int]) = xs.zipWithIndex.flatMap { case (x, d) =>
      (0 until x).map(e => (e.toLong, ts(1 + d, 10)))
    }.toDF("id", "t")
    // 16 stable days (50/51) pin x̄ and M̄R, then −beyond, +beyond,
    // +beyond: the trailing-3 window [20, 58, 58] has signed sum
    // (−1) + 1 + 1 = 1 (the pre-fix undercount) but 2 same-side
    // +2σ points — textbook rule 2 must fire exactly once. The 20
    // is also past 3σ → rule1 = 1.
    val mixed = mk(Seq.fill(8)(Seq(50, 51)).flatten ++ Seq(20, 58, 58))
    val r = Control.imrChart(mixed, "t").collect()(0)
    assert(r.getAs[Long]("rule2") == 1, r.toString)
    assert(r.getAs[Long]("rule1") == 1, r.toString)
  }

  test("taylorLaw: Poisson-like cells (var ≈ mean) fit slope ≈ 1 on " +
      "the synthetic panel") {
    // cells with (mean m, var ≈ m): daily counts m−1, m, m+1 repeated
    // → var = 1 at mean m... instead build var = m exactly by using
    // counts (m−k, m, m+k) with k² = m (m = 1, 4, 9, 16 → k = 1..4)
    val rows = for {
      (m, k, wk) <- Seq((4, 2, 0), (9, 3, 1), (16, 4, 2), (25, 5, 3))
      (c, di) <- Seq(m - k, m, m + k).zipWithIndex
      e <- 0 until c
    } yield (e.toLong, ts(1 + wk * 7 + di, 10), "t")
    val df = rows.toDF("id", "t", "k")
    val got = TimeSeries.taylorLaw(df, "k", "t").collect()(0)
    // var of {m−k, m, m+k} (sample) = k² = m → log-log slope 1
    assert(got.getAs[Long]("n_cells") == 4L)
    assert(math.abs(got.getAs[Double]("slope_r") - 1.0) < 0.05,
      got.toString)
    assert(got.getAs[Double]("r2_r") > 0.99, got.toString)
  }
}
