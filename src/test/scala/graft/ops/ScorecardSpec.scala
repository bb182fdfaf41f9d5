package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase

/** Hand cases for the model/representation scorecard batch. */
class ScorecardSpec extends SparkTestBase {
  import spark.implicits._

  test("logistic2Irls: a constant 50% success rate fixes beta at " +
      "exactly 0 (zero residuals from the zero init) with the " +
      "closed-form null deviance 2N·ln2") {
    val cells = Seq((1L, 1L, 10L, 5L), (5L, 1L, 10L, 5L),
      (20L, 1L, 10L, 5L)).toDF("x1", "x2", "n", "k")
    val r = Fit.logistic2Irls(cells, "x1", "x2", "n", "k").collect()(0)
    assert(r.getAs[Double]("b0_r") == 0.0 && r.getAs[Double]("b1_r") == 0.0
      && r.getAs[Double]("b2_r") == 0.0, r.toString)
    assert(math.abs(r.getAs[Double]("deviance_r")
      - 2 * 30 * math.log(2)) < 1e-4, r.toString)
  }

  test("logistic2Irls: success monotone in x1 with x2 constant " +
      "fits b1 > 0 and shrinks the deviance below the null") {
    val cells = Seq((1L, 1L, 50L, 5L), (5L, 1L, 50L, 25L),
      (20L, 1L, 50L, 45L)).toDF("x1", "x2", "n", "k")
    val r = Fit.logistic2Irls(cells, "x1", "x2", "n", "k").collect()(0)
    assert(r.getAs[Double]("b1_r") > 0.5, r.toString)
    // null deviance at base rate 0.5 would be 2·150·ln2 ≈ 207.9
    assert(r.getAs[Double]("deviance_r") < 160, r.toString)
  }

  test("linearCkaBlocks: duplicated halves give CKA = 1") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, 1.0f, 2.0f)),
      (2L, Seq(3.0f, 1.0f, 3.0f, 1.0f)),
      (3L, Seq(2.0f, 5.0f, 2.0f, 5.0f)),
      (4L, Seq(7.0f, 2.0f, 7.0f, 2.0f))).toDF("id", "vec")
    val r = Similarity.linearCkaBlocks(df, "id", "vec", 2).collect()(0)
    assert(r.getAs[Double]("cka_r") == 1.0, r.toString)
    assert(r.getAs[Long]("n") == 4L)
  }

  test("uniformityAlignment: identical vectors give alignment 0 and " +
      "uniformity 0 (= ln e⁰)") {
    val df = (1L to 6L).map(i =>
      (i, Seq(1.0f, 0.0f, 0.0f), (i % 2).toInt)).toDF("id", "vec", "lab")
    val r = Similarity.uniformityAlignment(df, "id", "vec", "lab", 6)
      .collect()(0)
    assert(r.getAs[Double]("alignment_r") == 0.0, r.toString)
    assert(r.getAs[Double]("uniformity_r") == 0.0, r.toString)
    assert(r.getAs[Long]("n_pairs") == 15L)
  }

  test("adTwoSample: hand A² = 5/3 on {1,2} vs {3,4}; identical " +
      "samples score far lower") {
    val apart = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L))
      .toDF("g", "v")
    val r1 = Nonparam.adTwoSample(apart, "v", "g", "a", "b")
      .collect()(0)
    assert(math.abs(r1.getAs[Double]("a2_r") - 5.0 / 3) < 1e-6,
      r1.toString)
    val same = (Seq(1L, 2L, 3L).map(("a", _)) ++
      Seq(1L, 2L, 3L).map(("b", _))).toDF("g", "v")
    val r2 = Nonparam.adTwoSample(same, "v", "g", "a", "b").collect()(0)
    assert(r2.getAs[Double]("a2_r") < 0.5, r2.toString)
  }

  test("forecastScorecard: a perfectly 7-periodic series scores " +
      "MASE = sMAPE = RMSSE = 0") {
    // 28 days of a strict weekly pattern: day-of-week d gets d+1
    // events
    val rows = for {
      d <- 0 until 28
      e <- 0 to d % 7
    } yield (e.toLong,
      Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"), "t")
    val df = rows.toDF("id", "ts", "k")
    val r = Forecast.forecastScorecard(df, "k", "ts", 7).collect()(0)
    assert(r.getAs[Double]("mase_r") == 0.0, r.toString)
    assert(r.getAs[Double]("smape_r") == 0.0, r.toString)
    assert(r.getAs[Double]("rmsse_r") == 0.0, r.toString)
    assert(r.getAs[Long]("n_days") == 21L)
  }
}
