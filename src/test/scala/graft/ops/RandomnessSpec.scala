package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase

/** Hand cases for the sequence-randomness + capability batch. */
class RandomnessSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-${1 + (day - 1) / 28}%02d-${1 + (day - 1) % 28}%02d 10:00:00")

  private def mk(xs: Seq[Int]) = xs.zipWithIndex.flatMap { case (x, d) =>
    (0 until x).map(e => (e.toLong, ts(1 + d)))
  }.toDF("id", "t")

  test("runsTest: alternation maximizes runs (z > 0); two level " +
      "blocks give exactly 2 runs (z < 0); median days are excluded") {
    // 9× (10,30) alternating + two median-20 days → 18 scored days
    val alt = mk((0 until 18).map(i => if (i % 2 == 0) 10 else 30)
      ++ Seq(20, 20))
    val r1 = Randomness.runsTest(alt, "t").collect()(0)
    assert(r1.getAs[Long]("n_days") == 18L, r1.toString)
    assert(r1.getAs[Long]("runs") == 18L, r1.toString)
    assert(r1.getAs[Double]("e_runs_r") == 10.0, r1.toString)
    assert(r1.getAs[Double]("z_r") > 3, r1.toString)
    val blocks = mk(Seq.fill(9)(10) ++ Seq(20, 20) ++ Seq.fill(9)(30))
    val r2 = Randomness.runsTest(blocks, "t").collect()(0)
    assert(r2.getAs[Long]("runs") == 2L, r2.toString)
    assert(r2.getAs[Double]("z_r") < -3, r2.toString)
  }

  test("differenceSign: a strictly increasing series puts every " +
      "increment up (hand z on m = 9)") {
    val inc = mk((1 to 10).map(_ * 2))
    val r = Randomness.differenceSign(inc, "t").collect()(0)
    assert(r.getAs[Long]("n_incr") == 9L && r.getAs[Long]("n_up") == 9L,
      r.toString)
    // z = (9 − 4.5)/√(11/12)
    assert(math.abs(r.getAs[Double]("z_r")
      - 4.5 / math.sqrt(11.0 / 12)) < 1e-6, r.toString)
  }

  test("coxStuart: a monotone series makes every half-pair positive " +
      "(z = √m); a flat series nulls out (all tie pairs)") {
    val inc = mk((1 to 10).map(_ + 2))
    val r1 = Randomness.coxStuart(inc, "t").collect()(0)
    assert(r1.getAs[Long]("n_pairs") == 5L
      && r1.getAs[Long]("n_pos") == 5L, r1.toString)
    assert(math.abs(r1.getAs[Double]("z_r") - math.sqrt(5.0)) < 1e-6,
      r1.toString)
    val flat = mk(Seq.fill(10)(7))
    val r2 = Randomness.coxStuart(flat, "t").collect()(0)
    assert(r2.getAs[Long]("n_pairs") == 0L, r2.toString)
    assert(r2.isNullAt(r2.fieldIndex("z_r")), r2.toString)
  }

  test("rankVonNeumann: a monotone series collapses RVN to " +
      "12/(n(n+1)) (z < 0); alternation pushes RVN above 2 (z > 0)") {
    val inc = mk((1 to 12).map(_ + 1))
    val r1 = Randomness.rankVonNeumann(inc, "t").collect()(0)
    val n = 12.0
    assert(math.abs(r1.getAs[Double]("rvn_r") - 12.0 / (n * (n + 1)))
      < 1e-6, r1.toString)
    assert(r1.getAs[Double]("z_r") < -3, r1.toString)
    val alt = mk((0 until 12).map(i => if (i % 2 == 0) 5 else 50))
    val r2 = Randomness.rankVonNeumann(alt, "t").collect()(0)
    assert(r2.getAs[Double]("rvn_r") > 2, r2.toString)
    assert(r2.getAs[Double]("z_r") > 0, r2.toString)
  }

  test("capability: an unchanged process scores Cp ≈ Cpk with zero " +
      "out-of-limits; a shifted tail collapses Cpk and flags days") {
    // 20 days alternating 30/32 → base 14 days, tail 6 days, same MR
    val stable = mk((0 until 20).map(i => if (i % 2 == 0) 30 else 32))
    val r1 = Control.capability(stable, "t").collect()(0)
    assert(r1.getAs[Long]("n_base") == 14L
      && r1.getAs[Long]("n_eval") == 6L, r1.toString)
    assert(r1.getAs[Double]("frac_out_r") == 0.0, r1.toString)
    assert(r1.getAs[Double]("cp_r") > 0.8, r1.toString)
    // tail jumps to ~90: far past μ₀ + 3σ̂₀
    val shifted = mk((0 until 14).map(i => if (i % 2 == 0) 30 else 32)
      ++ (0 until 6).map(i => if (i % 2 == 0) 90 else 92))
    val r2 = Control.capability(shifted, "t").collect()(0)
    assert(r2.getAs[Double]("frac_out_r") == 1.0, r2.toString)
    assert(r2.getAs[Double]("cpk_r") < 0, r2.toString)
  }
}
