package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Hand cases for the calibration/policy family. */
class CalibrateSpec extends SparkTestBase {
  import spark.implicits._

  private def calib = // perfectly calibrated two-bin frame
    ((1 to 40).map(i => (0.25, if (i <= 10) 1 else 0)) ++
      (1 to 40).map(i => (0.75, if (i <= 30) 1 else 0)))
      .toDF("p", "y")

  test("hosmerLemeshow: a perfectly calibrated frame scores 0 with " +
      "df = bins_used − 2") {
    val r = Calibrate.hosmerLemeshow(calib, "p", "y").collect()(0)
    assert(r.getAs[Double]("hl_r") == 0.0, r.toString)
    assert(r.getAs[Long]("n_bins_used") == 2L)
    assert(r.getAs[Long]("df") == 0L)
  }

  test("eceMce: 0 on the calibrated frame; a constant-0.25 score on " +
      "all-negative labels gaps by exactly 0.25") {
    val r0 = Calibrate.eceMce(calib, "p", "y").collect()(0)
    assert(r0.getAs[Double]("ece_r") == 0.0, r0.toString)
    val bad = (1 to 20).map(_ => (0.25, 0)).toDF("p", "y")
    val r1 = Calibrate.eceMce(bad, "p", "y").collect()(0)
    assert(r1.getAs[Double]("ece_r") == 0.25, r1.toString)
    assert(r1.getAs[Double]("mce_r") == 0.25, r1.toString)
  }

  test("ipsSnips: hand 4-row log — V_IPS = V_SNIPS = 2, ESS = 2") {
    val df = Seq((1L, "t", 1.0), (1L, "t", 3.0), (1L, "o", 5.0),
      (1L, "o", 7.0)).toDF("ctx", "a", "r")
    val r = Calibrate.ipsSnips(df, "ctx", "a", "r", "t").collect()(0)
    assert(r.getAs[Double]("v_ips_r") == 2.0, r.toString)
    assert(r.getAs[Double]("v_snips_r") == 2.0, r.toString)
    assert(r.getAs[Double]("v_clip_r") == 2.0, r.toString)
    assert(r.getAs[Double]("ess_r") == 2.0, r.toString)
  }

  test("bowker: symmetric transitions score 0; a one-way a→b flow of " +
      "5 scores 25/5 = 5 with df = 1") {
    val sym = (Seq.fill(3)(("a", "b")) ++ Seq.fill(3)(("b", "a")))
      .toDF("f", "l")
    val r0 = Calibrate.bowker(sym, "f", "l").collect()(0)
    assert(r0.getAs[Double]("chi2_r") == 0.0, r0.toString)
    val asym = Seq.fill(5)(("a", "b")).toDF("f", "l")
    val r1 = Calibrate.bowker(asym, "f", "l").collect()(0)
    assert(r1.getAs[Double]("chi2_r") == 5.0, r1.toString)
    assert(r1.getAs[Long]("df") == 1L)
  }

  test("nriIdi: hand 4-subject frame — NRI = 1, IDI = 0.2") {
    val df = Seq(
      (0.4, 0.6, 1), // event reclassified up
      (0.4, 0.4, 1), // event unchanged
      (0.6, 0.4, 0), // nonevent reclassified down
      (0.4, 0.4, 0)) // nonevent unchanged
      .toDF("po", "pn", "y")
    val r = Calibrate.nriIdi(df, "po", "pn", "y", Seq(0.5)).collect()(0)
    assert(r.getAs[Double]("nri_r") == 1.0, r.toString)
    assert(math.abs(r.getAs[Double]("idi_r") - 0.2) < 1e-9, r.toString)
  }
}
