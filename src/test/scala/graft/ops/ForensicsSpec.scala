package graft.ops

import graft.SparkTestBase

/** Hand cases for the data-forensics batch: Benford first digit,
  * last-digit uniformity, round-amount excess, burstiness/memory,
  * records test. */
class ForensicsSpec extends SparkTestBase {
  import spark.implicits._

  test("benfordFirstDigit: an exactly-Benford-proportioned sample " +
      "has chi2 = 0 and mad = 0 — and leading digits come from the " +
      "CENTS integer (12.34 -> digit 1)") {
    // counts proportional to log10(1+1/d) cannot be exact integers;
    // use the one distribution that IS exactly scored: put all mass
    // on amounts with known first digits and check counts/e against
    // the literal p table
    val amounts = (Seq.fill(3)(12.34) ++ Seq.fill(2)(9.5)
      ++ Seq.fill(1)(0.02)).toDF("a")
    val rows = Forensics.benfordFirstDigit(amounts, "a").collect()
    assert(rows.length == 9)
    val byD = rows.map(r => r.getAs[Int]("digit") ->
      r.getAs[Long]("n_d")).toMap
    assert(byD(1) == 3) // 1234 cents
    assert(byD(9) == 2) // 950 cents
    assert(byD(2) == 1) // 2 cents
    assert(byD(5) == 0)
    // digits ordered 1..9; chi2 constant across rows and positive
    assert(rows.map(_.getAs[Int]("digit")).toSeq == (1 to 9))
    assert(rows.map(_.getAs[Double]("chi2_r")).distinct.length == 1)
    assert(rows(0).getAs[Double]("chi2_r") > 0)
  }

  test("lastDigitUniformity: perfectly uniform terminal digits give " +
      "chi2 = 0 and maxdev = 0") {
    val amounts = (0 to 9).flatMap(d => Seq.fill(4)(1.0 + d / 100.0))
      .toDF("a")
    val rows = Forensics.lastDigitUniformity(amounts, "a").collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getAs[Long]("n_d") == 4L))
    assert(rows.forall(_.getAs[Double]("chi2_r") == 0.0))
    assert(rows.forall(_.getAs[Double]("maxdev_r") == 0.0))
  }

  test("roundAmountExcess: all-whole-dollar amounts give the maximal " +
      "positive z; nothing-round gives negative z") {
    val whole = Seq.fill(100)(5.0).toDF("a")
    val rw = Forensics.roundAmountExcess(whole, "a").collect()(0)
    assert(rw.getAs[Long]("n_whole") == 100)
    // z = (100 - 1)/sqrt(100*0.01*0.99) = 99/0.99498... ~ 99.5
    assert(rw.getAs[Double]("z_whole_r") > 99.0)
    val odd = Seq.fill(100)(5.03).toDF("a")
    val ro = Forensics.roundAmountExcess(odd, "a").collect()(0)
    assert(ro.getAs[Long]("n_whole") == 0)
    assert(ro.getAs[Double]("z_whole_r") < 0)
    assert(ro.getAs[Double]("z_quarter_r") < 0)
  }

  test("burstinessMemory: perfectly periodic arrivals give B = -1 " +
      "(variance 0) with memory null; a long-short alternation gives " +
      "negative memory") {
    def ev(key: String, ts: Seq[Long]): Seq[(String, java.sql.Timestamp,
        Long)] = ts.zipWithIndex.map { case (t, i) =>
      (key, new java.sql.Timestamp(t), i.toLong)
    }
    // periodic: gaps all 1000 ms -> sigma = 0 -> B = (0-mu)/(0+mu) = -1
    // alternating gaps 200 ms / 1800 ms -> lag-1 correlation negative
    val rows = Forensics.burstinessMemory(
      (ev("per", (1 to 6).map(_ * 1000L))
        ++ ev("alt", Seq(0L, 200L, 2000L, 2200L, 4000L, 4200L)))
        .toDF("k", "ts", "id"), "k", "ts", "id").collect()
      .map(r => r.getAs[String]("k") -> r).toMap
    assert(rows("per").getAs[Long]("n_gaps") == 5)
    assert(rows("per").getAs[Double]("burstiness_r") == -1.0)
    assert(rows("per").isNullAt(rows("per").fieldIndex("memory_r")))
    assert(rows("alt").getAs[Double]("memory_r") < -0.9,
      rows("alt").toString)
    assert(rows("alt").getAs[Double]("burstiness_r") > -1.0)
  }

  test("recordsTest: a strictly increasing daily series makes every " +
      "day an upper record (n_up = n, n_down = 1) and E[R] = H_n") {
    // day k has k+1 events over 5 days
    val evs = (0 until 5).flatMap { k =>
      (0 to k).map(i => (k.toLong * 5 + i,
        java.sql.Timestamp.valueOf(s"2026-01-0${k + 1} 12:00:00")))
    }.toDF("id", "ts")
    val r = Forensics.recordsTest(evs, "ts").collect()(0)
    assert(r.getAs[Long]("n_days") == 5)
    assert(r.getAs[Long]("n_up") == 5)
    assert(r.getAs[Long]("n_down") == 1)
    val h5 = 1.0 + 0.5 + 1.0 / 3 + 0.25 + 0.2
    assert(math.abs(r.getAs[Double]("e_records_r") - h5) < 1e-6)
    val hv = (1.0 - 1.0) + (0.5 - 0.25) + (1.0 / 3 - 1.0 / 9) +
      (0.25 - 1.0 / 16) + (0.2 - 1.0 / 25)
    assert(math.abs(r.getAs[Double]("var_records_r") - hv) < 1e-6)
  }
}
