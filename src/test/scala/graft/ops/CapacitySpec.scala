package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Hand cases for the capacity/privacy/fit batch. */
class CapacitySpec extends SparkTestBase {
  import spark.implicits._

  test("erlangC: 36 arrivals in one hour at AHT 180s → a = 1.8; the " +
      "c = 2 row matches the hand Erlang-C value and P(wait) falls " +
      "with c") {
    val df = (1 to 36).map(i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-01 10:${i % 60}%02d:00")))
      .toDF("id", "ts")
    val got = Queueing.erlangC(df, "ts", lit(true), 180, 6).collect()
    val byC = got.map(r => r.getAs[Int]("c") -> r).toMap
    // a = 1.8: S₂ = 1 + 1.8, B₂ = (1.8²/2)·(2/0.2) = 16.2,
    // P = 16.2/19 ≈ 0.852632
    assert(math.abs(byC(2).getAs[Double]("p_wait_r") - 16.2 / 19.0)
      < 1e-4, byC(2).toString)
    assert(byC(2).getAs[Double]("occupancy_r") == 0.9)
    val ps = got.sortBy(_.getAs[Int]("c")).map(_.getAs[Double]("p_wait_r"))
    assert(ps.sliding(2).forall(p => p(0) > p(1)), ps.mkString(", "))
  }

  test("newsvendor: demands 1..7 with cu=5/co=2 stock the 5/7 " +
      "fractile q* = 5 at mean cost 5") {
    val df = (1 to 7).flatMap(d => (1 to d).map(e =>
      (e.toLong, Timestamp.valueOf(f"2024-01-0$d 10:00:00"))))
      .toDF("id", "ts")
    val r = Queueing.newsvendor(df, "ts", lit(true), 5L, 2L)
      .collect()(0)
    assert(r.getAs[Long]("q_star") == 5L, r.toString)
    assert(r.getAs[Double]("mean_cost_r") == 5.0, r.toString)
    assert(r.getAs[Long]("n_days") == 7L)
  }

  test("lDiversity: a constant-sensitive group scores l = 1 and " +
      "entropy-l = 1; a uniform-4 group scores 4") {
    val df = (Seq.fill(8)(("g1", "x")) ++
      Seq("a", "b", "c", "d").flatMap(v => Seq.fill(2)(("g2", v))))
      .toDF("qi", "sv")
    val r = Profile.lDiversity(df, Seq("qi"), "sv").collect()(0)
    assert(r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("min_distinct_l") == 1L)
    assert(r.getAs[Double]("min_entropy_l_r") == 1.0, r.toString)
    assert(r.getAs[Double]("frac_ge3_r") == 0.5)
  }

  test("energyDistance: identical samples score 0; point masses at " +
      "0 and 10 score 2·10 = 20") {
    val same = (Seq(1L, 2L, 3L).map(("a", _)) ++
      Seq(1L, 2L, 3L).map(("b", _))).toDF("g", "v")
    val r0 = Nonparam.energyDistance(same, "v", "g", "a", "b")
      .collect()(0)
    assert(r0.getAs[Double]("energy_r") == 0.0, r0.toString)
    val apart = (Seq.fill(4)(("a", 0L)) ++ Seq.fill(4)(("b", 10L)))
      .toDF("g", "v")
    val r1 = Nonparam.energyDistance(apart, "v", "g", "a", "b")
      .collect()(0)
    assert(r1.getAs[Double]("exy_r") == 10.0, r1.toString)
    assert(r1.getAs[Double]("energy_r") == 20.0, r1.toString)
  }

  test("zipEm: a half-zeros/half-fours panel fits pi near 0.5 and " +
      "lambda near 4; an all-positive panel drives pi to 0") {
    val mix = ((1 to 50).map(_ => 0L) ++ (1 to 50).map(_ => 4L))
      .toDF("y")
    val r = Fit.zipEm(mix, "y").collect()(0)
    assert(r.getAs[Double]("pi_r") > 0.4 && r.getAs[Double]("pi_r") < 0.5,
      r.toString)
    assert(math.abs(r.getAs[Double]("lambda_r") - 4.0) < 0.15,
      r.toString)
    val pos = (1 to 40).map(i => (i % 3 + 1).toLong).toDF("y")
    val r2 = Fit.zipEm(pos, "y").collect()(0)
    assert(r2.getAs[Double]("pi_r") == 0.0, r2.toString)
  }
}
