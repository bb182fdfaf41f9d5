package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    // user 1: Jan 1, (gap 2-3), Jan 4 — two events on Jan 1
    (1L, ts("2024-01-01 08:00:00"), 1.5),
    (1L, ts("2024-01-01 09:00:00"), 2.5),
    (1L, ts("2024-01-04 10:00:00"), 7.0),
    // user 2: single active day
    (2L, ts("2024-02-10 12:00:00"), 3.0)
  ).toDF("user_id", "ts", "value")

  private lazy val filled =
    TimeSeries.fillDailyGaps(events, "user_id", "ts", "value")
      .orderBy("user_id", "day").collect()

  test("spine spans each key's own [min,max] day range, nothing more") {
    val u1 = filled.filter(_.getLong(0) == 1L).map(_.getDate(1).toString)
    assert(u1.toSeq == Seq("2024-01-01", "2024-01-02", "2024-01-03",
      "2024-01-04"))
    val u2 = filled.filter(_.getLong(0) == 2L).map(_.getDate(1).toString)
    assert(u2.toSeq == Seq("2024-02-10"))
  }

  test("gap days carry null day_value, is_gap=true, forward-filled value") {
    val u1 = filled.filter(_.getLong(0) == 1L)
    // day 1: 1.5+2.5 = 4.0; days 2-3: gaps carrying 4.0; day 4: 7.0
    assert(u1.map(r => Option(r.get(2))).toSeq ==
      Seq(Some(4.0), None, None, Some(7.0)))
    assert(u1.map(_.getDouble(3)).toSeq == Seq(4.0, 4.0, 4.0, 7.0))
    assert(u1.map(_.getBoolean(4)).toSeq ==
      Seq(false, true, true, false))
  }

  test("single-day key has one non-gap row") {
    val u2 = filled.filter(_.getLong(0) == 2L)
    assert(u2.length == 1 && !u2.head.getBoolean(4) &&
      u2.head.getDouble(3) == 3.0)
  }

  test("row count is the sum of per-key spans") {
    assert(filled.length == 4 + 1)
  }

  test("ewmaDaily: dyadic weights — hand-computed smoother values") {
    // user 1 daily values: Jan 1 → 4.0, Jan 4 → 7.0 (gap days 2-3)
    // ewma(Jan 1) = 4.0 (only itself)
    // ewma(Jan 4) = (7.0·1 + 4.0·2^-3) / (1 + 2^-3) = 7.5/1.125
    val got = TimeSeries.ewmaDaily(events, "user_id", "ts", "value",
        horizonDays = 8)
      .orderBy("user_id", "day").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2)))
    assert(got.length == 3, "evaluated only at observed days")
    assert(got(0) == ((1L, "2024-01-01", 4.0)))
    val expected = BigDecimal((7.0 + 4.0 / 8.0) / (1.0 + 1.0 / 8.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got(1)._3 - expected) < 1e-12)
    assert(got(2) == ((2L, "2024-02-10", 3.0)))
  }

  test("ewmaDaily: observations older than the horizon have no effect") {
    val far = Seq(
      (1L, ts("2024-01-01 00:00:00"), 100.0),
      (1L, ts("2024-03-01 00:00:00"), 5.0) // > 8 days later
    ).toDF("user_id", "ts", "value")
    val got = TimeSeries.ewmaDaily(far, "user_id", "ts", "value", 8)
      .orderBy("day").collect().map(_.getDouble(2))
    assert(got.toSeq == Seq(100.0, 5.0))
  }

  // one event row per desired daily count, keyed to a single stream
  private def dailySeries(counts: Seq[Int]) = {
    import spark.implicits._
    counts.zipWithIndex.flatMap { case (n, d) =>
      (0 until n).map(i =>
        ("k", java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00")))
    }.toDF("key", "ts")
  }

  test("rollingSlope: a linear daily series reports its exact slope " +
      "once the frame fills; the first day has no x-variance → null") {
    // counts 10, 12, 14, ... (slope 2/day)
    val got = TimeSeries.rollingSlope(
        dailySeries((0 until 10).map(d => 10 + 2 * d)),
        "key", "ts", windowDays = 7)
      .orderBy("day").collect()
      .map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    assert(got.head.isEmpty, "single-row frame must be null")
    assert(got.drop(1).forall(_.contains(2.0)), got.toSeq.toString)
  }

  test("cusumDaily: the window identity equals Page's direct recursion, " +
      "a flat series stays at 0") {
    val counts = Seq(10, 12, 9, 11, 30, 31, 29, 8, 10)
    val got = TimeSeries.cusumDaily(dailySeries(counts), "key", "ts",
        allowance = 2.0, threshold = 15.0)
      .orderBy("day").collect().map(r => (r.getDouble(3), r.getBoolean(4)))
    // direct fold of C+ = max(0, C + x - mu - k)
    val mu = counts.sum.toDouble / counts.size
    val want = counts.scanLeft(0.0)((c, x) =>
      math.max(0.0, c + x - mu - 2.0)).drop(1)
    got.map(_._1).zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-6, s"$g vs $w")
    }
    assert(got.map(_._2).toSeq ==
      want.map(_ > 15.0), "alarm flags")
    val flat = TimeSeries.cusumDaily(dailySeries(Seq.fill(6)(10)),
        "key", "ts", 1.0, 5.0)
      .collect().map(_.getDouble(3))
    assert(flat.forall(_ == 0.0), flat.toSeq.toString)
  }

  test("dowSeasonalIndex: hand case — Monday mean 3 vs overall 4 → " +
      "0.75; dow numbering is 0 = Sunday") {
    // Mondays 2024-01-01 (4 events) + 2024-01-08 (2), Tuesday 01-02 (6)
    val e = (Seq.fill(4)("2024-01-01 10:00:00")
      ++ Seq.fill(2)("2024-01-08 10:00:00")
      ++ Seq.fill(6)("2024-01-02 10:00:00"))
      .map(s => ("k", ts(s))).toDF("key", "ts")
    val got = TimeSeries.dowSeasonalIndex(e, "key", "ts").collect()
      .map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toMap
    assert(got(1) == ((2L, 3.0, 0.75)), s"Monday: $got") // dow 1 = Monday
    assert(got(2) == ((1L, 6.0, 1.5)), s"Tuesday: $got")
  }

  test("ratioToMaSeasonal: a constant series decomposes to seasonal 1.0 " +
      "on every weekday; incomplete edge windows are dropped") {
    // 14 days × 2 events/day → MA = 2 everywhere, ratios 1.0; complete
    // centered windows exist only for days 4..11 (8 days)
    val e = (1 to 14).flatMap(dd => Seq.fill(2)(
      ("k", ts(f"2024-01-$dd%02d 10:00:00")))).toDF("key", "ts")
    val rows = TimeSeries.ratioToMaSeasonal(e, "key", "ts").collect()
    assert(rows.map(_.getLong(2)).sum == 8L, rows.mkString(","))
    assert(rows.forall(_.getDouble(3) == 1.0), rows.mkString(","))
  }

  test("rollingMadAnomalies: a 10× spike against a constant baseline " +
      "is the ONLY flagged day (zero-MAD window flags any deviation)") {
    val base = (1 to 10).flatMap(dd => Seq.fill(5)(
      ("k", ts(f"2024-01-$dd%02d 10:00:00"))))
    val spike = Seq.fill(50)(("k", ts("2024-01-11 10:00:00")))
    val e = (base ++ spike).toDF("key", "ts")
    val got = TimeSeries.rollingMadAnomalies(e, "key", "ts",
        windowDays = 7)
      .collect().map(r => r.getDate(1).toString ->
        (r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap
    assert(got("2024-01-11") == ((5.0, 0.0, true)), got.toString)
    assert(got.filter(_._1 != "2024-01-11").values.forall(!_._3),
      got.toString)
  }

  test("acfDaily: alternating daily counts — hand-computed lag-1/lag-2 " +
      "values with the full-series-mean estimator") {
    // counts (2,1,2,1,2,1) over 6 consecutive days:
    // μ=1.5, SS−μS=1.5; lag1 num=−1.25 → −0.833333; lag2 num=1 → 0.666667
    val counts = Seq(2, 1, 2, 1, 2, 1)
    val e = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(("k", ts(f"2024-02-${i + 1}%02d 09:00:00")))
    }.toDF("key", "ts")
    val got = TimeSeries.acfDaily(e, "key", "ts", maxLag = 2)
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(1) == ((5L, -0.833333)), got.toString)
    assert(got(2) == ((4L, 0.666667)), got.toString)
  }

  test("acfDaily: silent days count as ZERO (spine fill), not spliced " +
      "out — (2,0,2) gives lag-1 acf −2/3") {
    val e = (Seq.fill(2)(("k", ts("2024-03-01 12:00:00"))) ++
      Seq.fill(2)(("k", ts("2024-03-03 12:00:00")))).toDF("key", "ts")
    val got = TimeSeries.acfDaily(e, "key", "ts", maxLag = 1).collect()
    assert(got.length == 1)
    assert(got.head.getLong(2) == 2L)
    assert(got.head.getDouble(3) == -0.666667, got.head.toString)
  }

  test("acfDaily: constant series has zero variance → null acf") {
    val e = (1 to 4).map(i => ("k", ts(f"2024-04-0$i 08:00:00")))
      .toDF("key", "ts")
    val got = TimeSeries.acfDaily(e, "key", "ts", maxLag = 1).collect()
    assert(got.head.isNullAt(3), got.head.toString)
  }

  test("theilSen: one outlier day cannot drag the median slope") {
    // days 1..5 with counts 1,2,3,4,50 — OLS would explode; the
    // pairwise-slope median stays at the underlying +1/day... with the
    // outlier, slopes are {1,1,1, 1,1, 1, 12.25, 16, 23.5, 46} →
    // median = 1.0
    val rows = Seq((1, 1), (2, 2), (3, 3), (4, 4), (5, 50)).flatMap {
      case (dayI, n) =>
        Seq.fill(n)(("k", ts(f"2024-06-0$dayI 08:00:00")))
    }
    val got = TimeSeries.theilSen(rows.toDF("key", "ts"), "key", "ts")
      .collect().head
    assert(got.getAs[Long]("n") == 10) // C(5,2) pairs
    assert(got.getAs[Double]("slope_med_r") == 1.0)
  }

  test("seasonalNaiveBacktest: perfect weekly repetition → zero error; " +
      "a level jump shows up as bias") {
    // key p: week 1 == week 2 (2 events/day) → MAE 0, bias 0, MAPE 0
    val perfect = (1 to 14).flatMap(i =>
      Seq.fill(2)(("p", ts(f"2024-06-$i%02d 08:00:00"))))
    // key j: week 1 at 1/day, week 2 at 3/day → err +2 on all 7 eval
    // days; MAE 2, bias +2, MAPE 2/3
    val jump = (1 to 7).map(i => ("j", ts(f"2024-06-$i%02d 08:00:00"))) ++
      (8 to 14).flatMap(i =>
        Seq.fill(3)(("j", ts(f"2024-06-$i%02d 08:00:00"))))
    val got = TimeSeries.seasonalNaiveBacktest(
        (perfect ++ jump).toDF("key", "ts"), "key", "ts", 7)
      .collect().map(r => r.getString(0) -> r).toMap
    val p = got("p")
    assert(p.getAs[Long]("n_days") == 7)
    assert(p.getAs[Double]("mae_r") == 0.0 &&
      p.getAs[Double]("bias_r") == 0.0 && p.getAs[Double]("mape_r") == 0.0)
    val j = got("j")
    assert(j.getAs[Double]("mae_r") == 2.0)
    assert(j.getAs[Double]("bias_r") == 2.0)
    assert(j.getAs[Double]("mape_r") == 0.666667)
  }

  test("spectralPower: a pure period-5 square wave lights the period-5 " +
      "bin and leaves period-7 near zero; constant series → 0 power") {
    // 20 days: 3 events on days ≡ 0 (mod 5), 1 otherwise
    val wave = (0 until 20).flatMap { t =>
      val n = if (t % 5 == 0) 3 else 1
      Seq.fill(n)(("w", ts(f"2024-06-${t + 1}%02d 08:00:00")))
    }
    val const = (0 until 20).map(t =>
      ("c", ts(f"2024-06-${t + 1}%02d 08:00:00")))
    val got = TimeSeries.spectralPower((wave ++ const).toDF("key", "ts"),
        "key", "ts", Seq(5, 7))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        r.getAs[Double]("power_r")).toMap
    assert(got(("c", 5)) == 0.0 && got(("c", 7)) == 0.0,
      "mean removal kills the DC-only series")
    // hand value: 4 cycles × amplitude 2 at lag-0 phase → |Σ(x−x̄)e|²
    // = (4·2·cos0 + ...)²; exact: deviations +1.6 at t≡0, −0.4 else
    assert(got(("w", 5)) > 20.0, got.toString)
    assert(got(("w", 7)) < got(("w", 5)) / 10,
      "off-period bin stays an order of magnitude down")
  }

  test("pinballBacktest: perfect forecast scores 0; constant +2 " +
      "under-forecast costs 1.0 at τ=.5 and 1.8 at τ=.9") {
    // week 1 at 1/day, week 2 at 3/day → e = +2 on all eval days
    val jump = (1 to 7).map(i => ("j", ts(f"2024-06-$i%02d 08:00:00"))) ++
      (8 to 14).flatMap(i =>
        Seq.fill(3)(("j", ts(f"2024-06-$i%02d 08:00:00"))))
    val flat = (1 to 14).map(i => ("f", ts(f"2024-06-$i%02d 08:00:00")))
    val got = TimeSeries.pinballBacktest((jump ++ flat).toDF("key", "ts"),
        "key", "ts", 7, Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        r.getAs[Double]("pinball_r")).toMap
    assert(got(("f", 0.5)) == 0.0 && got(("f", 0.9)) == 0.0)
    assert(got(("j", 0.5)) == 1.0) // max(.5·2, −.5·2) = 1
    assert(got(("j", 0.9)) == 1.8) // max(.9·2, −.1·2) = 1.8
  }

  test("xcorrDaily: B = A shifted one day forward → perfect r at " +
      "lag +1 only") {
    // A active days 1,3,5 (2 events), else 1; B mirrors A one day later
    val aDays = Map(1 -> 2, 2 -> 1, 3 -> 2, 4 -> 1, 5 -> 2, 6 -> 1)
    val rows = aDays.toSeq.flatMap { case (dayI, n) =>
      Seq.fill(n)(("A", ts(f"2024-06-0$dayI 08:00:00"))) ++
        Seq.fill(n)(("B", ts(f"2024-06-0${dayI + 1} 08:00:00")))
    }
    val df = rows.toDF("typ", "ts")
    val got = TimeSeries.xcorrDaily(df, "ts", col("typ") === "A",
        col("typ") === "B", 2)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(got(1).getAs[Double]("r_r") == 1.0, "A leads B by 1 day")
    assert(got(-1).getAs[Double]("r_r") < 1.0)
    assert(got(0).getAs[Double]("r_r") < 1.0)
    // overlap shrinks by |lag| against the 7-day spine
    assert(got(0).getAs[Long]("n_pairs") == 7)
    assert(got(2).getAs[Long]("n_pairs") == 5)
  }

  test("trendBreak: clean level shift found at the exact boundary") {
    // days 1-3 at 1 event/day, days 4-6 at 4 events/day → break after
    // day 3; means 1 and 4; gain = 3·(1-2.5)² + 3·(4-2.5)² = 13.5
    val rows = (1 to 3).map(i => ("k", ts(f"2024-05-0$i 08:00:00"))) ++
      (4 to 6).flatMap(i =>
        Seq.fill(4)(("k", ts(f"2024-05-0$i 08:00:00"))))
    val got = TimeSeries.trendBreak(rows.toDF("key", "ts"), "key", "ts")
      .collect().head
    assert(got.getAs[java.sql.Date]("break_day").toString == "2024-05-03")
    assert(got.getAs[Long]("n_left") == 3 && got.getAs[Long]("n_right") == 3)
    assert(got.getAs[Double]("mean_l_r") == 1.0)
    assert(got.getAs[Double]("mean_r_r") == 4.0)
    assert(got.getAs[Double]("gain_r") == 13.5)
  }

  test("trendBreak: flat series → zero gain, earliest-day tiebreak; " +
      "single-day key dropped") {
    val rows = (1 to 4).map(i => ("flat", ts(f"2024-05-0$i 08:00:00"))) :+
      ("one", ts("2024-05-01 08:00:00"))
    val got = TimeSeries.trendBreak(rows.toDF("key", "ts"), "key", "ts")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!got.contains("one"))
    val f = got("flat")
    assert(f.getAs[Double]("gain_r") == 0.0)
    assert(f.getAs[java.sql.Date]("break_day").toString == "2024-05-01")
  }

  test("timeWeightedAvg: piecewise-constant hold, hand case") {
    // value 10 for 3s, then 20 for 1s → twa = (30+20)/4 = 12.5; the
    // last event's value (99) carries no interval and is ignored.
    val e = Seq(
      ("k", ts("2024-01-01 00:00:00"), 10.0, 1L),
      ("k", ts("2024-01-01 00:00:03"), 20.0, 2L),
      ("k", ts("2024-01-01 00:00:04"), 99.0, 3L))
      .toDF("key", "ts", "v", "id")
    val got = TimeSeries.timeWeightedAvg(e, "key", "ts", "v", "id")
      .collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("n_events") == 3)
    assert(got.head.getAs[Long]("span_us") == 4000000L)
    assert(got.head.getAs[Double]("twa_r") == 12.5)
  }

  test("timeWeightedAvg: burst over-sampling does NOT skew the mean") {
    // 10 held for 10s sampled once vs re-sampled every second — same twa
    val base = ("k1", ts("2024-01-01 00:00:00"), 10.0, 0L) +:
      Seq(("k1", ts("2024-01-01 00:00:10"), 50.0, 10L),
        ("k1", ts("2024-01-01 00:00:20"), 50.0, 20L))
    val burst = (0 until 10).map(i =>
      ("k2", ts(f"2024-01-01 00:00:$i%02d"), 10.0, i.toLong)) ++
      Seq(("k2", ts("2024-01-01 00:00:10"), 50.0, 10L),
        ("k2", ts("2024-01-01 00:00:20"), 50.0, 20L))
    val e = (base ++ burst).toDF("key", "ts", "v", "id")
    val got = TimeSeries.timeWeightedAvg(e, "key", "ts", "v", "id")
      .collect().map(r => r.getAs[String]("key") ->
        r.getAs[Double]("twa_r")).toMap
    assert(got("k1") == 30.0) // (10·10 + 50·10)/20
    assert(got("k2") == 30.0) // identical despite 10× samples in [0,10)
  }

  test("timeWeightedAvg: zero-span and single-event keys are dropped") {
    val e = Seq(
      ("one", ts("2024-01-01 00:00:00"), 5.0, 1L),
      ("same", ts("2024-01-01 00:00:00"), 5.0, 1L),
      ("same", ts("2024-01-01 00:00:00"), 7.0, 2L))
      .toDF("key", "ts", "v", "id")
    assert(TimeSeries.timeWeightedAvg(e, "key", "ts", "v", "id")
      .count() == 0)
  }

  test("mannKendall: strictly rising daily counts → τ=1, hand z; " +
      "constant series → all-tied variance 0, null z, τ=0") {
    // key "up": 1,2,3,4,5 events on 5 consecutive days; key "flat":
    // 2 events on each of 5 days
    val rows = (1 to 5).flatMap { d =>
      (1 to d).map(i => ("up", ts(f"2024-01-0$d 0$i:00:00"))) ++
        (1 to 2).map(i => ("flat", ts(f"2024-01-0$d 0$i:00:00")))
    }.toDF("key", "ts")
    val got = TimeSeries.mannKendall(rows, "key", "ts")
      .collect().map(r => r.getString(0) -> r).toMap
    val up = got("up")
    assert(up.getAs[Long]("n") == 5 && up.getAs[Long]("s_stat") == 10)
    assert(up.getAs[Double]("tau_r") == 1.0)
    // z = (10−1)/sqrt(5·4·15/18) = 9/sqrt(300/18) = 2.204541
    assert(up.getAs[Double]("z_r") == 2.204541)
    val fl = got("flat")
    assert(fl.getAs[Long]("s_stat") == 0
      && fl.getAs[Double]("tau_r") == 0.0)
    assert(fl.isNullAt(fl.fieldIndex("z_r")),
      "all-tied series has Var 0 -> null z")
  }

  test("classicalDecomposition: pure weekly pattern recovered exactly") {
    import spark.implicits._
    // 21 days from Mon 2024-01-01: y=7 on Sundays, 0 otherwise.
    // Every full 7-day window sums to 7 → trend 1; detrended is 6 on
    // Sundays, −1 elsewhere; seasonal already sums to 0; residual 0.
    val days = (0 until 21).map { i =>
      val day = java.sql.Date.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong))
      val dow = (i + 1) % 7 // Jan 7 (i=6) is Sunday
      (day, if (dow == 0) 7L else 0L)
    }.toDF("day", "y")
    val got = TimeSeries.classicalDecomposition(days, "day", "y")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 7)
    assert(got(0L).getAs[Double]("seasonal_r") == 6.0) // Sunday
    for (d <- 1L to 6L)
      assert(got(d).getAs[Double]("seasonal_r") == -1.0, s"dow $d")
    assert(got.values.forall(_.getAs[Double]("resid_sd_r") == 0.0))
  }

  test("bestMeanShift: locates the break, exact segment means, big F") {
    import spark.implicits._
    val daily = Seq((0L, 10L), (1L, 10L), (2L, 11L), (3L, 50L),
      (4L, 51L)).toDF("t", "y")
    val r = TimeSeries.bestMeanShift(daily, "t", "y").collect().head
    assert(r.getAs[Long]("n_days") == 5)
    assert(r.getAs[Long]("break_t") == 3)
    assert(r.getAs[Long]("n_left") == 3)
    assert(r.getAs[Double]("mean_left_r") == 10.333333)
    assert(r.getAs[Double]("mean_right_r") == 50.5)
    // SSE0 = 1937.2, split SSE = 7/6 → F ≈ 4978
    assert(r.getAs[Double]("f_r") > 1000.0, r.toString)
    // a perfectly clean shift has split SSE 0: F undefined → NULL
    val clean = Seq((0L, 10L), (1L, 10L), (2L, 50L), (3L, 50L))
      .toDF("t", "y")
    val c = TimeSeries.bestMeanShift(clean, "t", "y").collect().head
    assert(c.getAs[Long]("break_t") == 2)
    assert(c.isNullAt(c.fieldIndex("f_r")))
  }

  test("bestMeanShift: net-refund (negative) days keep exact totals " +
      "and the true break") {
    import spark.implicits._
    // day 2 is a net refund: max(_cy) over cumulative prefixes would
    // overshoot the true total (10+10-40+50+51 = 81 vs running max 91)
    // — totals must come from the LAST day's prefix (r10 ADVICE)
    val daily = Seq((0L, 10L), (1L, 10L), (2L, -40L), (3L, 50L),
      (4L, 51L)).toDF("t", "y")
    val r = TimeSeries.bestMeanShift(daily, "t", "y").collect().head
    // left {10,10,-40} mean -20/3; right {50,51} mean 50.5 — the split
    // a wrong grand total would misplace
    assert(r.getAs[Long]("break_t") == 3, r.toString)
    assert(r.getAs[Double]("mean_left_r") == -6.666667)
    assert(r.getAs[Double]("mean_right_r") == 50.5)
  }

  test("kpss: constant series -> zero long-run variance -> NULL eta; " +
      "distributed plumbing == scalar reference exactly") {
    import spark.implicits._
    val const = (0L to 19L).map(t => (t, 500000000L)).toDF("t", "y")
    val c = TimeSeries.kpss(const, "t", "y").collect().head
    assert(c.getAs[Long]("n") == 20)
    assert(c.getAs[Double]("s2l_r") == 0.0)
    assert(c.isNullAt(c.fieldIndex("kpss_r")))
    // scalar mirror of the op's exact formulas + rounding grid
    def r(x: Double, s: Int) = BigDecimal(java.math.BigDecimal
      .valueOf(x)).setScale(s, BigDecimal.RoundingMode.HALF_UP)
    def ref(ys: Seq[Long], lags: Int): (Double, Double, Double) = {
      val n = ys.size
      val nD = n.toDouble
      val cum = ys.scanLeft(0L)(_ + _).tail
      val sy = cum.last.toDouble
      val ss2 = (1 to n).map { i =>
        val v = (nD * cum(i - 1).toDouble - i.toDouble * sy) / 1e8
        r(v * v / (nD * nD), 6)
      }.sum.toDouble
      val gam = (0 to lags).map { l =>
        (1 to n - l).map { k =>
          val e0 = (nD * ys(k - 1).toDouble - sy) / 1e8
          val e1 = (nD * ys(k + l - 1).toDouble - sy) / 1e8
          r(e0 * e1 / (nD * nD), 6)
        }.sum.toDouble
      }
      val s2n = gam.head + (1 to lags).map(l =>
        2.0 * (1.0 - l.toDouble / (lags + 1.0)) * gam(l)).sum
      (r(gam.head / nD, 6).toDouble, r(s2n / nD, 6).toDouble,
        r(ss2 / (nD * nD) / (s2n / nD), 6).toDouble)
    }
    // a wandering-level series (partial sums large): op == reference
    val ys = Seq(4L, 7L, 9L, 12L, 8L, 15L, 19L, 22L, 18L, 25L)
      .map(_ * 100000000L)
    val (g0, s2l, eta) = ref(ys, 7)
    val got = TimeSeries.kpss(
      ys.zipWithIndex.map { case (y, t) => (t.toLong, y) }.toDF("t", "y"),
      "t", "y").collect().head
    assert(got.getAs[Double]("gamma0_r") == g0, s"$got vs $g0")
    assert(got.getAs[Double]("s2l_r") == s2l, s"$got vs $s2l")
    assert(got.getAs[Double]("kpss_r") == eta, s"$got vs $eta")
  }

  test("pageHinkley: constant series never alarms; a level jump drives " +
      "PH past lambda at the jump") {
    import spark.implicits._
    val const = (0L to 9L).map(t => (t, 100000000L)).toDF("t", "y")
    val c = TimeSeries.pageHinkley(const, "t", "y", 0.0, 500.0)
      .collect().head
    assert(c.getAs[Double]("ph_max") == 0.0)
    assert(c.getAs[Long]("n_alarms") == 0L)
    assert(c.isNullAt(c.fieldIndex("t_first_alarm")))
    // 5 days at 1000 k$ then 5 at 3000 k$ (cents = k$·1e5): each
    // post-jump day adds ~+1000 k$ to m while the running mean lags
    val jump = (0L to 9L).map(t =>
      (t, if (t < 5) 100000000000L else 300000000000L)).toDF("t", "y")
    val j = TimeSeries.pageHinkley(jump, "t", "y", 0.0, 500.0)
      .collect().head
    assert(j.getAs[Double]("ph_max") > 1000.0, j.toString)
    assert(j.getAs[Long]("n_alarms") > 0L)
    assert(j.getAs[Long]("t_first_alarm") >= 5L)
    assert(j.getAs[Long]("t_at_max") == 9L)
  }

  test("hurstRs: single 4-day block hand R/S; one size -> null H") {
    import spark.implicits._
    // y = 0,1,2,3: Z (n-scaled) = -6,-8,-6,0 -> R = 8/4 = 2;
    // pop SD = sqrt(1.25) -> R/S = 2/sqrt(1.25)
    val df = Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L)).toDF("t", "y")
    val r = TimeSeries.hurstRs(df, "t", "y", Seq(4)).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_blocks") == 1L)
    assert(math.abs(r(0).getAs[Double]("mean_rs_r")
      - 2 / math.sqrt(1.25)) < 1e-6)
    assert(r(0).isNullAt(r(0).fieldIndex("h_r")))
  }

  test("hurstRs: linear trend, sizes {2, 4} -> hand slope; size-2 " +
      "blocks are R/S = 1 identically") {
    import spark.implicits._
    val df = (0L to 7L).map(t => (t, t)).toDF("t", "y")
    val got = TimeSeries.hurstRs(df, "t", "y", Seq(2, 4))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(got(2).getAs[Long]("n_blocks") == 4L)
    assert(got(2).getAs[Double]("mean_rs_r") == 1.0)
    assert(got(4).getAs[Long]("n_blocks") == 2L)
    val rs4 = 2 / math.sqrt(1.25)
    assert(math.abs(got(4).getAs[Double]("mean_rs_r") - rs4) < 1e-6)
    val h = math.log(rs4) / math.log(2) // (ln rs4 - ln 1)/(ln 4 - ln 2)
    assert(math.abs(got(2).getAs[Double]("h_r") - h) < 1e-5)
    assert(got(2).getAs[Double]("h_r") == got(4).getAs[Double]("h_r"))
  }

  test("hurstRs: incomplete trailing block is dropped, constant " +
      "blocks (SD = 0) are excluded") {
    import spark.implicits._
    // 6 days at size 4: only days 0-3 form a block; constant values
    // -> SD = 0 -> no R/S terms -> empty result
    val flat = (0L to 5L).map(t => (t, 7L)).toDF("t", "y")
    assert(TimeSeries.hurstRs(flat, "t", "y", Seq(4)).collect().isEmpty)
  }

  test("binarySegmentation2: three-regime series recovers both " +
      "breaks; the constant sub-segment emits a NULL-F earliest pick") {
    import spark.implicits._
    // 4 days at 0, 4 at 100k, 4 at 500k: root split isolates the big
    // jump (break 8), the left child finds the small one (break 4)
    val daily = ((0L to 3L).map((_, 0L)) ++ (4L to 7L).map((_, 100000L))
      ++ (8L to 11L).map((_, 500000L))).toDF("t", "y")
    val got = TimeSeries.binarySegmentation2(daily, "t", "y")
      .orderBy("segment").collect()
      .map(r => r.getAs[String]("segment") -> r).toMap
    assert(got.size == 3)
    assert(got("root").getAs[Long]("break_t") == 8)
    assert(got("root").getAs[Long]("n_days") == 12)
    assert(got("left").getAs[Long]("break_t") == 4)
    assert(got("left").getAs[Long]("n_days") == 8)
    // right child is constant: zero reduction everywhere -> earliest
    // candidate, F undefined
    assert(got("right").getAs[Long]("break_t") == 9)
    assert(got("right").isNullAt(got("right").fieldIndex("f_r")))
  }

  test("priceIndexFisher: hand two-month case — Laspeyres uses base " +
      "quantities, Paasche current, Fisher the geometric mean; " +
      "unmatched items drop") {
    import spark.implicits._
    // month 1: item A p=100 q=10, item B p=200 q=5; month 2: A p=110
    // q=20, B p=180 q=10, item C (no base) must be excluded
    val sales = Seq(
      ("A", "2024-01", 1000L, 10L), ("B", "2024-01", 1000L, 5L),
      ("A", "2024-02", 2200L, 20L), ("B", "2024-02", 1800L, 10L),
      ("C", "2024-02", 999L, 1L))
      .toDF("i", "m", "c", "q")
    val r = TimeSeries.priceIndexFisher(sales, "i", "m", "c", "q")
      .collect().head
    assert(r.getAs[String]("month") == "2024-02")
    assert(r.getAs[Long]("n_items") == 2)
    // L = (110*10 + 180*5)/(100*10 + 200*5) = 2000/2000 = 1.0
    assert(r.getAs[Double]("laspeyres_r") == 1.0)
    // P = (110*20 + 180*10)/(100*20 + 200*10) = 4000/4000 = 1.0
    assert(r.getAs[Double]("paasche_r") == 1.0)
    assert(r.getAs[Double]("fisher_r") == 1.0)
  }

  test("seasonalMannKendall: a pure weekly cycle scores S = 0 while " +
      "the plain test would see spurious pairs; a monotone trend " +
      "within strata scores positive") {
    import spark.implicits._
    import java.sql.Timestamp
    // 4 weeks; weekday pattern high/low alternating but NO trend
    // within any day-of-week stratum -> every within-stratum pair ties
    def ts(day: Int) = new Timestamp(
      java.sql.Date.valueOf("2024-01-01").getTime + day * 86400000L)
    val cyc = (0 until 28).flatMap { d =>
      val n = if (d % 7 < 3) 3 else 1 // weekly cycle only
      (1 to n).map(i => ("a", d.toLong * 10 + i, ts(d)))
    }.toDF("k", "event_id", "ts")
    val r = TimeSeries.seasonalMannKendall(cyc, "k", "ts")
      .collect().head
    assert(r.getAs[Long]("s_stat") == 0L, r.toString)
    // monotone: week w contributes w events per day -> every
    // within-stratum pair increases
    val tr = (0 until 28).flatMap { d =>
      (1 to (d / 7 + 1)).map(i => ("a", d.toLong * 100 + i, ts(d)))
    }.toDF("k", "event_id", "ts")
    val r2 = TimeSeries.seasonalMannKendall(tr, "k", "ts")
      .collect().head
    // per stratum C(4,2)=6 increasing pairs x 7 strata = 42
    assert(r2.getAs[Long]("s_stat") == 42L, r2.toString)
    assert(r2.getAs[Double]("z_r") > 0)
  }

  test("allanVariance: a constant stream gives AVAR = 0 at every " +
      "tau; a linear ramp quadruples AVAR per tau doubling (random-" +
      "walk signature)") {
    import spark.implicits._
    def evs(counts: Seq[Int]): org.apache.spark.sql.DataFrame =
      counts.zipWithIndex.flatMap { case (c, day) =>
        (1 to c).map(i => java.sql.Timestamp.valueOf(
          f"2026-01-${day + 1}%02d 12:00:${i % 60}%02d"))
      }.toDF("ts")
    val const = TimeSeries.allanVariance(evs(Seq.fill(16)(5)), "ts",
      Seq(1, 2, 4)).collect()
    assert(const.forall(_.getAs[Double]("avar_r") == 0.0))
    // x_t = t + 1 over 16 days: block-sum diffs 1, 4, 16 ->
    // AVAR = 0.5, 2, 8
    val ramp = TimeSeries.allanVariance(evs((1 to 16)), "ts",
      Seq(1, 2, 4)).collect()
      .map(r => r.getAs[Int]("tau_days") -> r.getAs[Double]("avar_r"))
      .toMap
    assert(ramp(1) == 0.5, ramp.toString)
    assert(ramp(2) == 2.0, ramp.toString)
    assert(ramp(4) == 8.0, ramp.toString)
  }

  test("spectralFlatness: a constant series has zero power in every " +
      "bin (null flatness); a planted 7-cycle peaks at period 7 with " +
      "flatness strictly inside (0, 1)") {
    import spark.implicits._
    def evs(counts: Seq[Int]) = counts.zipWithIndex.flatMap {
      case (c, day) => (1 to c).map(i => java.sql.Timestamp.valueOf(
        f"2026-01-${day + 1}%02d 10:00:${i % 60}%02d"))
    }.toDF("ts")
    val const = TimeSeries.spectralFlatness(evs(Seq.fill(28)(5)),
      "ts", Seq(2, 3, 5, 7)).collect()(0)
    assert(const.isNullAt(const.fieldIndex("flatness_r")))
    val mixed = (0 until 28).map(t =>
      10 + (if (t % 7 == 0) 15 else 0) + t % 3)
    val r = TimeSeries.spectralFlatness(evs(mixed), "ts",
      Seq(2, 3, 5, 7)).collect()(0)
    assert(r.getAs[Int]("peak_period") == 7, r.toString)
    val f = r.getAs[Double]("flatness_r")
    assert(f > 0.0 && f < 1.0, r.toString)
  }
}
