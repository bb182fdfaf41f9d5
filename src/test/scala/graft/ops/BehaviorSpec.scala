package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BehaviorSpec extends SparkTestBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private val ev = Seq(
    // user 1: full ordered funnel view(1:00) → click(2:00) → purchase(3:00)
    (1L, 101L, "view", t("2024-01-01 01:00:00")),
    (1L, 102L, "click", t("2024-01-01 02:00:00")),
    (1L, 103L, "purchase", t("2024-01-01 03:00:00")),
    // user 2: purchase BEFORE the first view — order matters, stage stays 1
    (2L, 201L, "purchase", t("2024-01-01 00:30:00")),
    (2L, 202L, "view", t("2024-01-01 01:00:00")),
    // user 3: view then click, no purchase → stage 2
    (3L, 301L, "view", t("2024-01-02 01:00:00")),
    (3L, 302L, "click", t("2024-01-02 01:05:00")),
    // user 4: click only, never viewed → stage 0
    (4L, 401L, "click", t("2024-01-03 01:00:00"))
  ).toDF("user_id", "event_id", "event_type", "ts")

  test("funnel: ordered stages, later events must follow earlier stages") {
    val got = Behavior.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy("user_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toSeq
    assert(got == Seq(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 0))
  }

  test("funnel: same-timestamp stage event does NOT advance (strictly after)") {
    val sameTs = Seq(
      (9L, 1L, "view", t("2024-01-01 01:00:00")),
      (9L, 2L, "click", t("2024-01-01 01:00:00"))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = Behavior.funnel(sameTs, "user_id", "event_type", "ts",
      Seq("view", "click")).collect()
    assert(got.head.getInt(1) == 1)
  }

  test("weeklyRetention: cohort = first ISO week, offsets count active weeks") {
    // user 1 active in weeks of Jan 1 (Mon) and Jan 15 → offsets 0 and 2;
    // user 2 active only in week of Jan 8 → its own cohort, offset 0
    val e = Seq(
      (1L, t("2024-01-02 10:00:00")),
      (1L, t("2024-01-03 10:00:00")), // same week, no extra row
      (1L, t("2024-01-16 10:00:00")),
      (2L, t("2024-01-09 10:00:00"))
    ).toDF("user_id", "ts")
    val got = Behavior.weeklyRetention(e, "user_id", "ts")
      .orderBy("cohort_week", "week_offset").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L)))
  }

  test("transitions: consecutive pairs per user, ordered by (ts, id)") {
    val got = Behavior.transitions(ev, "user_id", "event_type",
        Seq(col("ts"), col("event_id")))
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // user1: view→click, click→purchase; user2: purchase→view; user3: view→click
    assert(got == Seq(("click", "purchase", 1L), ("purchase", "view", 1L),
      ("view", "click", 2L)))
  }

  test("rollingDistinct: trailing window, only observed days emitted") {
    val e = Seq(
      (1L, "a", t("2024-01-01 01:00:00")),
      (2L, "a", t("2024-01-03 01:00:00")),
      (1L, "a", t("2024-01-10 01:00:00")) // > 7 days after day 1
    ).toDF("user_id", "grp", "ts")
    val got = Behavior.rollingDistinct(e, "user_id", "grp", "ts", 7)
      .orderBy("window_day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(2))).toSeq
    // Jan 1: {1}; Jan 3: {1,2}; Jan 10: {1} (Jan 3 is 7 days back —
    // outside the 7-day window [Jan 4, Jan 10])
    assert(got == Seq(("2024-01-01", 1L), ("2024-01-03", 2L),
      ("2024-01-10", 1L)))
  }

  test("rollingDistinct window shorter than gap never bridges") {
    val e = Seq(
      (1L, "a", t("2024-01-01 01:00:00")),
      (2L, "a", t("2024-01-02 01:00:00"))
    ).toDF("user_id", "grp", "ts")
    val got = Behavior.rollingDistinct(e, "user_id", "grp", "ts", 1)
      .orderBy("window_day").collect().map(_.getLong(2)).toSeq
    assert(got == Seq(1L, 1L)) // window of 1 day = the day itself only
  }

  test("kaplanMeier: hand case — censored subjects stay at risk; a " +
      "zero factor drives survival to exactly 0") {
    val subj = Seq((1L, true), (2L, false), (3L, true), (3L, true))
      .toDF("t", "observed")
    val got = Behavior.kaplanMeier(subj, "t", "observed")
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // t=1: 4 at risk, 1 event -> S = 0.75; the t=2 censor is NOT an
    // event row but reduces the at-risk count; t=3: 2 at risk, 2 events
    // -> factor 0 -> S = 0 exactly
    assert(got.toSeq == Seq((1L, 4L, 1L, 0.75), (3L, 2L, 2L, 0.0)))
  }

  test("kaplanMeier: all-censored input emits nothing; product matches " +
      "the sequential formula on a no-censoring series") {
    val censored = Seq((5L, false), (7L, false)).toDF("t", "observed")
    assert(Behavior.kaplanMeier(censored, "t", "observed").isEmpty)
    val obs = Seq((1L, true), (2L, true), (4L, true)).toDF("t", "observed")
    val got = Behavior.kaplanMeier(obs, "t", "observed")
      .orderBy("t").collect().map(_.getDouble(3)).toSeq
    // S: 2/3, (2/3)(1/2)=1/3, then factor 0 at the last event -> 0
    assert(got.head == BigDecimal(2.0 / 3).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(math.abs(got(1) - 1.0 / 3) < 1e-6 && got(2) == 0.0)
  }

  test("twoProportionTest: hand-computed z and lift; degenerate " +
      "variance (all or none converted) yields null z") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // arm A: 100 units, 20 converted; arm B: 100 units, 30 converted
    val units = ((0 until 100).map(i => (false, i < 20)) ++
      (0 until 100).map(i => (true, i < 30))).toDF("armb", "conv")
    val r = Behavior.twoProportionTest(units, col("armb"), col("conv"))
      .head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((100L, 20L, 100L, 30L)))
    assert(r.getDouble(6) == 0.1, "lift")
    // z = 0.1 / sqrt(0.25·0.75·(0.02)) ≈ 1.632993
    val want = 0.1 / math.sqrt(0.25 * 0.75 * 0.02)
    assert(math.abs(r.getDouble(7) - want) < 1e-6, r.toString)
    // all converted in both arms → p̂ = 1 → null z
    val degen = Seq((false, true), (true, true)).toDF("armb", "conv")
    val d = Behavior.twoProportionTest(degen, col("armb"), col("conv"))
      .head
    assert(d.isNullAt(7), d.toString)
  }

  test("twoProportionTest: an empty arm yields null rate/lift/z, " +
      "never NaN (Spark 0/0 is NaN where SQL engines yield NULL)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // only arm B has units: n_a = 0, so rate_a, lift and z are undefined
    val units = Seq((true, true), (true, false)).toDF("armb", "conv")
    val r = Behavior.twoProportionTest(units, col("armb"), col("conv"))
      .head
    assert(r.getLong(0) == 0L && r.getLong(2) == 2L, r.toString)
    assert(r.isNullAt(4), "rate_a must be null for an empty arm")
    assert(r.getDouble(5) == 0.5, "rate_b")
    assert(r.isNullAt(6), "lift must be null when an arm is empty")
    assert(r.isNullAt(7), "z must be null when an arm is empty")
  }

  test("cuped: hand θ; a perfect covariate collapses the variance ratio " +
      "to 0 and equalizes adjusted means; zero-variance X is a no-op") {
    // y = 2x exactly → θ = 2, y_adj = ȳ for every unit → var ratio 0 and
    // both arms' adjusted means equal the global mean (scaleDiv = 1)
    val units = Seq((false, 100L, 200L), (false, 300L, 600L),
      (true, 200L, 400L), (true, 400L, 800L))
      .toDF("armb", "x", "y")
    val r = Behavior.cuped(units, col("armb"), "x", "y", scaleDiv = 1.0)
      .orderBy("arm_b").collect()
    assert(r.map(_.getDouble(4)).toSeq == Seq(2.0, 2.0), "theta")
    assert(r.map(_.getDouble(5)).toSeq == Seq(0.0, 0.0), "var ratio")
    assert(r.map(_.getDouble(3)).toSeq == Seq(500.0, 500.0),
      "adjusted means collapse to the global ȳ = 500")
    // constant X → vx = 0 → θ = 0, adjusted mean = raw mean, ratio 1
    val const = Seq((false, 5L, 10L), (true, 5L, 30L)).toDF("armb", "x", "y")
    val c = Behavior.cuped(const, col("armb"), "x", "y", scaleDiv = 1.0)
      .orderBy("arm_b").collect()
    assert(c.map(_.getDouble(4)).toSeq == Seq(0.0, 0.0))
    assert(c.map(r => r.getDouble(2) == r.getDouble(3)).forall(identity))
    assert(c.map(_.getDouble(5)).toSeq == Seq(1.0, 1.0))
  }

  test("attribution: hand credits — first/last to the right touches, " +
      "linear splits 1/n; users without a conversion are excluded; " +
      "credit mass per model equals the number of converters") {
    val e = Seq(
      // user 1: view(1:00), click(1:30), view(1:45) then purchase(2:00)
      (1L, 1L, "view", t("2024-01-01 01:00:00")),
      (1L, 2L, "click", t("2024-01-01 01:30:00")),
      (1L, 3L, "view", t("2024-01-01 01:45:00")),
      (1L, 4L, "purchase", t("2024-01-01 02:00:00")),
      // user 2: click only then purchase — all three models give click 1.0
      (2L, 5L, "click", t("2024-01-01 01:00:00")),
      (2L, 6L, "purchase", t("2024-01-01 01:10:00")),
      // user 3: touches but no purchase → contributes nothing
      (3L, 7L, "view", t("2024-01-01 01:00:00")),
      // user 4: purchase with no prior touch → nothing to credit
      (4L, 8L, "purchase", t("2024-01-01 01:00:00"))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = Behavior.attribution(e, "user_id", "event_type", "ts",
        "purchase")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got(("1_first", "view")) == 1.0 && got(("1_first", "click")) == 1.0)
    assert(got(("2_last", "view")) == 1.0 && got(("2_last", "click")) == 1.0)
    // linear: user 1 → view 2/3, click 1/3 (rounded to 6dp); user 2 → click 1
    assert(math.abs(got(("3_linear", "view")) - 0.666666) < 1e-9)
    assert(math.abs(got(("3_linear", "click")) - 1.333333) < 1e-9)
    // per-model credit mass == number of crediting converters (2)
    Seq("1_first", "2_last").foreach { m =>
      val mass = got.collect { case ((`m`, _), v) => v }.sum
      assert(mass == 2.0, s"$m mass $mass")
    }
  }

  test("diffInDiff: hand 2×2 — a pure additive time trend yields DiD 0; " +
      "a treatment bump lands only in did_r") {
    def mk(rows: Seq[(Long, Boolean, String, Long)]) =
      rows.map { case (u, arm, ts, v) => (u, arm, t(ts), v) }
        .toDF("user_id", "armb", "ts", "cents")
    val cut = 1704153600000000L // 2024-01-02T00:00:00Z
    // both arms +100 cents in the post period → parallel trends, DiD = 0
    val trend = mk(Seq(
      (1L, false, "2024-01-01 10:00:00", 100L),
      (1L, false, "2024-01-03 10:00:00", 200L),
      (2L, true, "2024-01-01 10:00:00", 300L),
      (2L, true, "2024-01-03 10:00:00", 400L)))
    val r0 = Behavior.diffInDiff(trend, "user_id", col("armb"), "ts",
      col("cents"), cut, scaleDiv = 1.0).head
    assert(r0.getDouble(8) == 0.0, r0.toString)
    // arm B gets an extra +50 post → DiD = 50
    val bump = mk(Seq(
      (1L, false, "2024-01-01 10:00:00", 100L),
      (1L, false, "2024-01-03 10:00:00", 200L),
      (2L, true, "2024-01-01 10:00:00", 300L),
      (2L, true, "2024-01-03 10:00:00", 450L)))
    val r1 = Behavior.diffInDiff(bump, "user_id", col("armb"), "ts",
      col("cents"), cut, scaleDiv = 1.0).head
    assert(r1.getDouble(8) == 50.0, r1.toString)
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3))
      == ((1L, 1L, 1L, 1L)))
  }

  test("stageDurations: exact chain deltas; stalled entities drop out " +
      "of later pairs") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, "view", t("2024-01-01 10:00:00")),
      (1L, "click", t("2024-01-01 10:30:00")),
      (1L, "purchase", t("2024-01-01 12:30:00")),
      (2L, "view", t("2024-01-01 09:00:00")),
      (2L, "click", t("2024-01-01 09:10:00")))
      .toDF("user_id", "event_type", "ts")
    val got = Behavior.stageDurations(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got(("view->click", 1L)) == 30L * 60 * 1000000)
    assert(got(("click->purchase", 1L)) == 120L * 60 * 1000000)
    assert(got(("view->click", 2L)) == 10L * 60 * 1000000)
    assert(!got.contains(("click->purchase", 2L)))
  }

  test("decayAttribution: equal-Δt touches split evenly; decay favors " +
      "the recent touch; out-of-window touches earn nothing") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val hourUs = 3600L * 1000000
    val ev = Seq(
      // u1: view 2h before, click 1h before purchase → click earns
      // e^{-1/24} / (e^{-1/24} + e^{-2/24}) of the credit (τ = 1 day)
      (1L, 1L, "view", t("2024-01-01 08:00:00")),
      (1L, 2L, "click", t("2024-01-01 09:00:00")),
      (1L, 3L, "purchase", t("2024-01-01 10:00:00")),
      // u2: a touch 8 days out — outside the 7-day lookback
      (2L, 4L, "view", t("2024-01-01 00:00:00")),
      (2L, 5L, "purchase", t("2024-01-09 00:00:00")))
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = Behavior.decayAttribution(ev, "user_id", "event_type",
        "ts", "event_id", "purchase", Seq("view", "click"),
        7L * 24 * hourUs, 24L * hourUs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getAs[Double]("credit_r"))).toMap
    val wC = math.exp(-1.0 / 24); val wV = math.exp(-2.0 / 24)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got("click")._2 == r6(wC / (wC + wV)))
    assert(got("view")._2 == r6(wV / (wC + wV)),
      "u2's out-of-window view earns nothing")
    assert(got("view")._1 == 1L && got("click")._1 == 1L)
  }

  test("cohortLtv: two cohorts, exact weekly and cumulative cents") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s + " 12:00:00")
    // cohort of Mon 2024-01-01: u1 spends 100 in wk0, 200 in wk1;
    // cohort of Mon 2024-01-08: u2 spends 50 in its wk0
    val ev = Seq(
      (1L, "purchase", 1.0, t("2024-01-02")),
      (1L, "purchase", 2.0, t("2024-01-10")),
      (2L, "purchase", 0.5, t("2024-01-09")))
      .toDF("user_id", "event_type", "value", "ts")
    val got = Behavior.cohortLtv(ev, "user_id", "ts",
        when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).otherwise(0L))
      .collect().map(r => (r.getAs[java.sql.Date]("cohort_week")
        .toString, r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(("2024-01-01", 0L)) == ((1L, 100L, 100L)))
    assert(got(("2024-01-01", 1L)) == ((1L, 200L, 300L)))
    assert(got(("2024-01-08", 0L)) == ((1L, 50L, 50L)))
  }

  test("funnelWithin: a conversion past the deadline does not count") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1 clicks 1h after view → stage 2; u2 clicks 7h after → stage 1
      (1L, "view", t("2024-01-01 10:00:00")),
      (1L, "click", t("2024-01-01 11:00:00")),
      (2L, "view", t("2024-01-01 10:00:00")),
      (2L, "click", t("2024-01-01 17:00:00")),
      // u3: click BEFORE view — order still matters
      (3L, "click", t("2024-01-01 09:00:00")),
      (3L, "view", t("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val got = Behavior.funnelWithin(ev, "user_id", "event_type", "ts",
        Seq("view", "click"), 6L * 3600 * 1000000)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(1L) == 2)
    assert(got(2L) == 1)
    assert(got(3L) == 1)
  }

  test("stickiness: hand DAU/MAU over a 3-day window") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s + " 12:00:00")
    // day1: {a,b}; day2: {a}; day3: {c}. window=3 days:
    // d1 MAU {a,b}=2, d2 MAU {a,b}=2, d3 MAU {a,b,c}=3
    val ev = Seq(("a", "2024-01-01"), ("b", "2024-01-01"),
      ("a", "2024-01-02"), ("c", "2024-01-03"))
      .map { case (u, d) => (u, t(d)) }.toDF("user", "ts")
    val got = Behavior.stickiness(ev, "user", "ts", 3)
      .collect().map(r => r.getAs[java.sql.Date]("window_day").toString ->
        (r.getLong(1), r.getLong(2), r.getAs[Double]("stickiness_r")))
      .toMap
    assert(got("2024-01-01") == ((2L, 2L, 1.0)))
    assert(got("2024-01-02") == ((1L, 2L, 0.5)))
    assert(got("2024-01-03") == ((1L, 3L, 0.333333)))
  }

  test("twoStepTransitions: deterministic 2-state chain → P² by hand") {
    import spark.implicits._
    // u1: A B A B A  → transitions A→B ×2, B→A ×2
    // u2: A A B      → A→A ×1, A→B ×1
    // P: A→A 1/4, A→B 3/4; B→A 1, so
    // P²(A→A) = ¼·¼ + ¾·1 = 0.8125, P²(A→B) = ¼·¾ = 0.1875
    // P²(B→A) = 1·¼ = 0.25,         P²(B→B) = 1·¾ = 0.75
    val ev = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"), (1L, 4L, "B"),
      (1L, 5L, "A"),
      (2L, 1L, "A"), (2L, 2L, "A"), (2L, 3L, "B"))
      .toDF("user_id", "seq", "event_type")
    val got = Behavior.twoStepTransitions(ev, "user_id", "event_type",
        Seq(col("seq")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("p2_r")).toMap
    assert(got(("A", "A")) == 0.8125)
    assert(got(("A", "B")) == 0.1875)
    assert(got(("B", "A")) == 0.25)
    assert(got(("B", "B")) == 0.75)
  }

  test("activityStreaks: gaps split islands; exact run profile") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s + " 09:00:00")
    // u1: days 1,2,3, gap, 5,6, gap, 9 → runs of 3, 2, 1
    val ev = Seq("01", "02", "03", "05", "06", "09")
      .map(d => (1L, t(s"2024-07-$d"))) ++
      Seq((1L, t("2024-07-02"))) // duplicate day — must not inflate
    val got = Behavior.activityStreaks(ev.toDF("user_id", "ts"),
        "user_id", "ts")
      .collect().head
    assert(got.getAs[Long]("n_active_days") == 6)
    assert(got.getAs[Long]("n_streaks") == 3)
    assert(got.getAs[Long]("longest_streak") == 3)
  }

  test("entropyRate: hand chain — deterministic state has H=0, the " +
      "rate is the P(c)-weighted mean") {
    import spark.implicits._
    // from A: A×1, B×3 (rt 4); from B: A×2 (rt 2, deterministic)
    val ev = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"), (1L, 4L, "B"),
      (1L, 5L, "A"),
      (2L, 1L, "A"), (2L, 2L, "A"), (2L, 3L, "B"))
      .toDF("user_id", "seq", "event_type")
    val got = Behavior.entropyRate(ev, "user_id", "event_type",
        Seq(col("seq")))
      .collect().map(r => r.getString(0) -> r).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val hA = -(0.25 * math.log(0.25)) - 0.75 * math.log(0.75)
    assert(got("B").getAs[Double]("h_cond_r") == 0.0)
    assert(math.abs(got("A").getAs[Double]("h_cond_r") - r6(hA)) <= 1e-6)
    val rate = got("A").getAs[Double]("entropy_rate_r")
    assert(math.abs(rate - r6(4.0 / 6 * hA)) <= 1e-6)
    assert(got("B").getAs[Double]("entropy_rate_r") == rate,
      "global rate identical on every row")
    assert(got("A").getAs[Long]("n_trans") == 4 &&
      got("B").getAs[Long]("n_trans") == 2)
  }

  test("entityEntropy: uniform 2-type user = ln 2, single-type user " +
      "= 0 with null normalized form") {
    import spark.implicits._
    val ev = Seq(
      (1L, "A"), (1L, "B"), (1L, "A"), (1L, "B"),
      (2L, "A"), (2L, "A"))
      .toDF("user_id", "event_type")
    val got = Behavior.entityEntropy(ev, "user_id", "event_type")
      .collect().map(r => r.getLong(0) -> r).toMap
    val u1 = got(1L)
    assert(u1.getAs[Long]("n_events") == 4 &&
      u1.getAs[Long]("n_types") == 2)
    assert(u1.getAs[Double]("entropy_r") == 0.693147) // ln 2
    assert(u1.getAs[Double]("entropy_norm_r") == 1.0)
    val u2 = got(2L)
    assert(u2.getAs[Double]("entropy_r") == 0.0)
    assert(u2.isNullAt(u2.fieldIndex("entropy_norm_r")))
  }

  test("topPaths: first-k events in time order form the path; counts " +
      "across users; top-N slice deterministic") {
    val rows = Seq(
      (1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L), (1L, "d", 4L),
      (2L, "a", 1L), (2L, "b", 2L), (2L, "c", 3L),
      (3L, "a", 5L), (3L, "b", 6L), (3L, "c", 7L),
      (4L, "x", 1L), (4L, "y", 2L)
    ).toDF("user_id", "event_type", "ord")
    val got = Behavior.topPaths(rows, "user_id", "event_type",
        Seq(col("ord")), pathLen = 3, topN = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    // users 1-3 share a>b>c (user 1's 4th event ignored); user 4 has x>y
    assert(got == Seq("a>b>c" -> 3L, "x>y" -> 1L))
  }

  test("stationaryDistribution: alternating 2-state chain stays " +
      "uniform; absorbing state collects all mass") {
    def ev(rows: Seq[(Long, String, Long)]) =
      rows.toDF("user_id", "event_type", "ord")
    // A->B->A->B...: P swaps mass, uniform start is stationary
    val alt = Behavior.stationaryDistribution(
        ev(Seq((1L, "A", 1L), (1L, "B", 2L), (1L, "A", 3L),
          (1L, "B", 4L))),
        "user_id", "event_type", Seq(col("ord")), iters = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(alt == Map("A" -> 0.5, "B" -> 0.5))
    // A->B, B->B: B absorbs everything; A has no incoming -> drops out
    val abs = Behavior.stationaryDistribution(
        ev(Seq((1L, "A", 1L), (1L, "B", 2L), (1L, "B", 3L),
          (1L, "B", 4L))),
        "user_id", "event_type", Seq(col("ord")), iters = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(abs == Map("B" -> 1.0), abs.toString)
  }

  test("stationaryDistribution: sinkSelfLoops makes Σπ = 1 on a " +
      "sink-bearing chain (default leaks the sink's mass)") {
    import spark.implicits._
    // A -> B -> END for two users: END is always last, so it has no
    // outgoing transitions — a true sink state
    val rows = Seq(
      (1L, "A", 1L), (1L, "B", 2L), (1L, "END", 3L),
      (2L, "A", 1L), (2L, "B", 2L), (2L, "END", 3L))
      .toDF("user_id", "event_type", "ord")
    // default (restricted-chain semantics): mass flowing into END
    // vanishes — the documented drift below 1
    val leaky = Behavior.stationaryDistribution(rows, "user_id",
        "event_type", Seq(col("ord")), iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(leaky.values.sum < 0.999,
      s"restricted chain must leak sink mass, got $leaky")
    // with self-loops END is absorbing: conservation holds and, by
    // iters = 3 from the uniform start, everything has been absorbed
    val total = Behavior.stationaryDistribution(rows, "user_id",
        "event_type", Seq(col("ord")), iters = 3, sinkSelfLoops = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(total.values.sum - 1.0) < 1e-6,
      s"Σπ must be 1 with sink self-loops, got $total")
    assert(total("END") == 1.0, total.toString)
  }

  test("littlesLawMonthly: hand January/February case") {
    import spark.implicits._
    // [Jan 1, Jan 10]: 10 days; [Jan 20, Feb 8]: 12 in Jan, 8 in Feb
    val iv = Seq(("2023-01-01", "2023-01-10"),
      ("2023-01-20", "2023-02-08")).toDF("s", "e")
    val got = Behavior.littlesLawMonthly(iv, "s", "e")
      .orderBy("month").collect()
    assert(got.length == 2)
    val jan = got(0)
    assert(jan.getAs[Long]("n_arrivals") == 2)
    assert(jan.getAs[Double]("l_avg_r") == math.rint(22.0 / 31 * 1e6) / 1e6)
    assert(jan.getAs[Double]("w_days_r") == 15.0) // (10 + 20) / 2
    // L/(λW) = (22/31)/((2/31)·15) = 22/30
    assert(jan.getAs[Double]("littles_ratio_r") == 0.733333)
    val feb = got(1)
    assert(feb.getAs[Long]("n_arrivals") == 0)
    assert(feb.getAs[Double]("l_avg_r") == math.rint(8.0 / 28 * 1e6) / 1e6)
    assert(feb.isNullAt(feb.fieldIndex("littles_ratio_r")))
  }

  test("eventualFollow: first-a-before-last-b semantics") {
    import spark.implicits._
    // user 1: a then b; user 2: b then a — each direction holds for
    // exactly one of the two users
    val ev = Seq((1L, "a", 1L), (1L, "b", 2L),
      (2L, "b", 1L), (2L, "a", 2L))
      .toDF("user_id", "event_type", "us")
      .select(col("user_id"), col("event_type"),
        expr("timestamp_micros(us)").as("ts"))
    val got = Behavior.eventualFollow(ev, "user_id", "event_type", "ts")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_both"), r.getAs[Long]("n_follow"),
          r.getAs[Double]("follow_r"))).toMap
    assert(got(("a", "b")) == ((2L, 1L, 0.5)), got.toString)
    assert(got(("b", "a")) == ((2L, 1L, 0.5)), got.toString)
  }

  test("nelsonAalen: hand cumulative hazard with censoring") {
    import spark.implicits._
    // events at t=1 (2 of 2 at risk=4) and t=3 (1 of 1); censor at t=2
    val subj = Seq((1L, true), (1L, true), (2L, false), (3L, true))
      .toDF("t", "observed")
    val got = Behavior.nelsonAalen(subj, "t", "observed")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_risk") == 4 &&
      got(1L).getAs[Long]("d") == 2)
    assert(got(1L).getAs[Double]("cumhaz_r") == 0.5)
    assert(got(1L).getAs[Double]("fh_survival_r") == 0.606531)
    assert(got(3L).getAs[Long]("n_risk") == 1)
    assert(got(3L).getAs[Double]("cumhaz_r") == 1.5)
    assert(got(3L).getAs[Double]("fh_survival_r") == 0.22313)
  }

  test("logRank: hand hypergeometric O-E on separated groups") {
    import spark.implicits._
    // group1 events at t=1,2; group0 at t=3,4 — fully separated
    val subj = Seq((1L, true, true), (2L, true, true),
      (3L, true, false), (4L, true, false))
      .toDF("t", "observed", "g")
    val r = Behavior.logRank(subj, "t", "observed", col("g"))
      .collect().head
    assert(r.getAs[Long]("n_g1") == 2 && r.getAs[Long]("n_g0") == 2)
    assert(r.getAs[Long]("o1") == 2)
    // E1 = 1·2/4 + 1·1/3 (12-dp terms); V = 0.25 + (1/3)(2/3)
    val e1 = 0.5 + 0.333333333333
    val v = 0.25 + 0.222222222222
    assert(r.getAs[Double]("e1_r") == 0.833333)
    assert(math.abs(r.getAs[Double]("z_r")
      - (2 - e1) / math.sqrt(v)) < 1e-6)
    assert(math.abs(r.getAs[Double]("chi2_r")
      - (2 - e1) * (2 - e1) / v) < 1e-6)
  }

  test("typeEntropy: uniform two-type user = ln 2, single-type = 0") {
    import spark.implicits._
    val ev = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "a"))
      .toDF("user_id", "event_type")
    val got = Behavior.typeEntropy(ev, "user_id", "event_type")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_events") == 2L)
    assert(got(1L).getAs[Long]("n_types") == 2L)
    val h1 = got(1L).getAs[java.math.BigDecimal]("h").doubleValue()
    assert(math.abs(h1 - math.log(2)) < 1e-9)
    assert(got(2L).getAs[java.math.BigDecimal]("h").doubleValue() == 0.0)
  }

  test("armBalanceAudit: hand SMD and SRM on a 2-vs-3 split") {
    import spark.implicits._
    // arm A: x = 1, 3 (mean 2, var 2); arm B: x = 2, 4, 6
    // (mean 4, var 4) -> SMD = 2/sqrt(3); SRM z = 1/sqrt(5)
    val units = Seq((false, 1L), (false, 3L), (true, 2L), (true, 4L),
      (true, 6L)).toDF("armb", "x")
    val r = Behavior.armBalanceAudit(units, col("armb"), Seq("x"))
      .collect()(0)
    assert(r.getAs[String]("covariate") == "x")
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Double]("mean_a_r") == 2.0)
    assert(r.getAs[Double]("mean_b_r") == 4.0)
    assert(math.abs(r.getAs[Double]("smd_r") - 2 / math.sqrt(3)) < 1e-6)
    assert(math.abs(r.getAs[Double]("srm_z_r") - 1 / math.sqrt(5)) < 1e-6)
    assert(math.abs(r.getAs[Double]("srm_chi2_r") - 0.2) < 1e-6)
  }

  test("armBalanceAudit: null covariate values are excluded from BOTH " +
      "counts and sums (never a null-skipping sum over a " +
      "null-including count)") {
    import spark.implicits._
    val units = Seq((false, Some(1L)), (false, None),
      (true, Some(2L)), (true, Some(4L))).toDF("armb", "x")
    val r = Behavior.armBalanceAudit(units, col("armb"), Seq("x"))
      .collect()(0)
    assert(r.getAs[Long]("n_a") == 1L, "the null row must not count")
    assert(r.getAs[Double]("mean_a_r") == 1.0)
    assert(r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("mean_b_r") == 3.0)
  }

  test("armBalanceAudit: zero-variance covariate gives null SMD") {
    import spark.implicits._
    val units = Seq((false, 7L), (false, 7L), (true, 7L), (true, 7L))
      .toDF("armb", "x")
    val r = Behavior.armBalanceAudit(units, col("armb"), Seq("x"))
      .collect()(0)
    assert(r.isNullAt(r.fieldIndex("smd_r")))
    assert(r.getAs[Double]("srm_z_r") == 0.0)
  }

  test("positivityAudit: propensity, ESS and overlap flags exact on " +
      "hand strata; one-arm stratum flags with NULL ESS") {
    import spark.implicits._
    // bin 0: 8 treated / 2 control (p = .8, inside [.05,.95])
    // bin 1: 10 treated / 0 control (one-arm: flagged, ESS NULL)
    val u = (Seq.fill(8)((0L, true)) ++ Seq.fill(2)((0L, false)) ++
      Seq.fill(10)((1L, true))).toDF("bin", "tr")
    val got = Behavior.positivityAudit(u, "bin", col("tr"), 5)
      .collect()
    assert(got.length == 2)
    val b0 = got(0)
    assert(b0.getAs[Double]("p_r") == 0.8)
    assert(!b0.getAs[Boolean]("low_overlap"))
    // ESS: sw = 8/.8 + 2/.2 = 20; sw2 = 8/.64 + 2/.04 = 62.5
    assert(b0.getAs[Double]("ess_r") == 6.4)
    val b1 = got(1)
    assert(b1.getAs[Boolean]("low_overlap"))
    assert(b1.isNullAt(b1.fieldIndex("ess_r")))
  }

  test("aalenJohansen: hand competing-risks table; CIF1 + CIF2 = " +
      "1 - KM(all-cause) at every event time") {
    import spark.implicits._
    // 6 subjects: t=1 cause1; t=2 cause2; t=2 censor; t=3 cause1;
    // t=4 censor; t=5 cause2
    val subj = Seq((1L, 1), (2L, 2), (2L, 0), (3L, 1), (4L, 0), (5L, 2))
      .toDF("t", "cause")
    val got = Behavior.aalenJohansen(subj, "t", "cause")
      .orderBy("t").collect()
    assert(got.map(_.getAs[Long]("t")).toSeq == Seq(1L, 2L, 3L, 5L))
    val r1 = got.head
    assert(r1.getAs[Long]("n_risk") == 6)
    assert(r1.getAs[Double]("s_minus_r") == 1.0)
    assert(r1.getAs[Double]("cif1_r") == 0.166667)
    // t=2: S(2-) = 5/6; cif2 += (5/6)*(1/5) = 1/6
    val r2 = got(1)
    assert(r2.getAs[Long]("n_risk") == 5)
    assert(r2.getAs[Double]("cif2_r") == 0.166667)
    // the AJ identity: cif1 + cif2 + S(t) = 1 at each event time
    // (reconstruct S(t) = S(t-) * (n-d)/n)
    got.foreach { r =>
      val s = math.BigDecimal(r.getAs[Double]("s_minus_r")) *
        (r.getAs[Long]("n_risk") - r.getAs[Long]("d1") -
          r.getAs[Long]("d2")).toDouble / r.getAs[Long]("n_risk")
      val lhs = r.getAs[Double]("cif1_r") + r.getAs[Double]("cif2_r") +
        s.toDouble
      assert(math.abs(lhs - 1.0) < 1e-4, r.toString)
    }
  }

  test("simpsonAudit: per-segment slopes negative, pooled positive " +
      "-> paradox flagged; aligned signs -> not flagged") {
    import spark.implicits._
    // classic construction: within each segment y decreases in x, but
    // the higher segment sits at higher x AND higher y
    val par = (Seq((0.0, 10.0), (1.0, 9.0), (2.0, 8.0))
        .map { case (x, y) => ("s1", x, y) } ++
      Seq((10.0, 30.0), (11.0, 29.0), (12.0, 28.0))
        .map { case (x, y) => ("s2", x, y) })
      .toDF("seg", "x", "y")
    val got = Behavior.simpsonAudit(par, "seg", "x", "y")
      .collect().map(r => r.getAs[String]("segment") -> r).toMap
    assert(got("s1").getAs[Double]("slope_r") == -1.0)
    assert(got("s2").getAs[Double]("slope_r") == -1.0)
    assert(got("(pooled)").getAs[Double]("slope_r") > 0)
    assert(got.values.forall(_.getAs[Boolean]("paradox")))
    // aligned: all slopes positive -> no paradox
    val ok = Seq(("s1", 0.0, 0.0), ("s1", 1.0, 1.0),
      ("s2", 2.0, 2.0), ("s2", 3.0, 3.0)).toDF("seg", "x", "y")
    val got2 = Behavior.simpsonAudit(ok, "seg", "x", "y").collect()
    assert(got2.forall(!_.getAs[Boolean]("paradox")))
  }

  test("rmst: hand KM area - leading full-survival segment, " +
      "piecewise S steps, tau clipping") {
    import spark.implicits._
    // 4 subjects: events at t=2 (1 of 4) and t=6 (1 of 3), censor at
    // t=6 and t=100. S: [0,2)=1, [2,6)=0.75, [6,10]=0.5
    val subj = Seq((2L, true), (6L, true), (6L, false), (100L, false))
      .toDF("t", "observed")
    val r = Behavior.rmst(subj, "t", "observed", 10L).collect().head
    assert(r.getAs[Long]("n") == 4)
    assert(r.getAs[Long]("n_events_le_tau") == 2)
    // 2*1 + 4*0.75 + 4*0.5 = 7
    assert(r.getAs[Double]("rmst_r") == 7.0, r.toString)
  }
}
