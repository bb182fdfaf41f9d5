package graft.ops

import java.sql.Date

import graft.SparkTestBase

/** Hand-computable cases for the round-12 forecasters. */
class ForecastSpec extends SparkTestBase {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("brownDouble: a constant series has S1 = S2 = level, zero " +
      "drift, flat forecasts") {
    val daily = (1 to 40).map(i => (d(f"2024-01-01")
      .toLocalDate.plusDays(i).toString, 5.0))
      .map { case (s, y) => (Date.valueOf(s), y) }.toDF("day", "y")
    val got = Forecast.brownDouble(daily, "day", "y", 0.5, 8, 3)
      .collect()
    assert(got.length == 3)
    got.foreach { r =>
      assert(r.getAs[Double]("s1_r") == 5.0)
      assert(r.getAs[Double]("s2_r") == 5.0)
      assert(r.getAs[Double]("b_r") == 0.0)
      assert(r.getAs[Double]("forecast_r") == 5.0)
    }
  }

  test("thetaForecast: a perfect line recovers the OLS slope and " +
      "forecasts level + h*slope/2") {
    val daily = (0 to 39).map(i => (Date.valueOf(
      d("2024-01-01").toLocalDate.plusDays(i).toString),
      10.0 + 2.0 * i)).toDF("day", "y")
    val got = Forecast.thetaForecast(daily, "day", "y", 0.5, 8, 2)
      .collect()
    assert(got(0).getAs[Double]("slope_r") == 2.0)
    val ses = got(0).getAs[Double]("ses_r")
    assert(math.abs(got(0).getAs[Double]("forecast_r") - (ses + 1.0))
      < 1e-6)
    assert(math.abs(got(1).getAs[Double]("forecast_r") - (ses + 2.0))
      < 1e-6)
  }

  test("croston: regular demands of size 5 every 2 days give z = 5, " +
      "p = 2, rate = 2.5") {
    val daily = Seq(0, 2, 4, 6, 8).map(i => (Date.valueOf(
      d("2024-01-01").toLocalDate.plusDays(i).toString), 5.0))
      .toDF("day", "y")
    val r = Forecast.croston(daily, "day", "y", 0.5, 8).collect()(0)
    assert(r.getAs[Long]("n_demands") == 5L)
    assert(r.getAs[Double]("z_r") == 5.0)
    assert(r.getAs[Double]("p_r") == 2.0)
    assert(r.getAs[Double]("rate_r") == 2.5)
  }

  test("seasonalStrength: a pure weekly pattern reads f_seasonal = 1; " +
      "pure noisefree trend reads f_seasonal = 0") {
    // 35 days of a strict 7-periodic integer pattern
    val pat = Seq(0L, 10L, 20L, 30L, 40L, 50L, 60L)
    val weekly = (0 until 35).map(i => (Date.valueOf(
      d("2024-01-01").toLocalDate.plusDays(i).toString), pat(i % 7)))
      .toDF("day", "y")
    val r1 = Forecast.seasonalStrength(weekly, "day", "y")
      .collect()(0)
    assert(r1.getAs[Double]("var_remainder_r") == 0.0, r1.toString)
    assert(r1.getAs[Double]("f_seasonal_r") == 1.0)
    // a pure linear ramp: detrended interior is constant-ish, the DOW
    // means absorb nothing real -> remainder variance ~ detrended
    val ramp = (0 until 35).map(i => (Date.valueOf(
      d("2024-01-01").toLocalDate.plusDays(i).toString), 100L * i))
      .toDF("day", "y")
    val r2 = Forecast.seasonalStrength(ramp, "day", "y").collect()(0)
    assert(r2.getAs[Double]("f_trend_r") > 0.9, r2.toString)
  }
}
