package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase

class IntervalsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("concurrencyProfile: duration-weighted quantiles of the sweep " +
      "line — hand ladder") {
    // [0h,4h) and [1h,3h): conc 1 for 2h total, conc 2 for 2h.
    // p50 → conc 1 (cum 2h·20 = 40 ≥ 10·4h = 40); p95 → conc 2.
    val iv = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 04:00:00"), 1L),
      (1L, ts("2024-01-01 01:00:00"), ts("2024-01-01 03:00:00"), 2L))
      .toDF("k", "s", "e", "tie")
    val got = Intervals.concurrencyProfile(iv, "k", "s", "e", "tie",
        pNums = Seq(10, 19), pDen = 20)
      .collect().map(r => r.getDouble(1) -> r.getLong(2)).toMap
    assert(got(0.5) == 1L)
    assert(got(0.95) == 2L)
    val span = Intervals.concurrencyProfile(iv, "k", "s", "e", "tie",
      Seq(10), 20).collect().head.getAs[Long]("span_us")
    assert(span == 4L * 3600 * 1000000)
  }

  test("overlapJoin: exact overlap days, disjoint pairs absent, " +
      "cross-bucket pairs emitted exactly once") {
    val iv = Seq(
      // key 1: [Jan1,Jan5) × [Jan3,Jan8) overlap [Jan3,Jan5) = 2 days;
      // [Jan3,Jan8) × [Jan7,Jan9) overlap [Jan7,Jan8) = 1 day;
      // [Jan1,Jan5) vs [Jan7,Jan9): disjoint
      (1L, 10L, ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00")),
      (1L, 20L, ts("2024-01-03 00:00:00"), ts("2024-01-08 00:00:00")),
      (1L, 30L, ts("2024-01-07 00:00:00"), ts("2024-01-09 00:00:00")),
      // key 2: touching ends are NOT overlap ([s,e) exclusive)
      (2L, 40L, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")),
      (2L, 50L, ts("2024-01-03 00:00:00"), ts("2024-01-05 00:00:00")))
      .toDF("k", "id", "s", "e")
    for (bucketDays <- Seq(1, 3, 100)) {
      val got = Intervals.overlapJoin(iv, "k", "id", "s", "e",
          bucketDays)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
          r.getLong(3)).toMap
      assert(got.size == 2, s"bucketDays=$bucketDays: $got")
      assert(got((1L, 10L, 20L)) == 2L)
      assert(got((1L, 20L, 30L)) == 1L)
    }
  }

  test("overlapping intervals stack; disjoint ones do not") {
    val iv = Seq(
      // key 1: [1,5), [2,6), [3,4) → all three open at t=3
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-05 00:00:00"), 1L),
      (1L, ts("2024-01-02 00:00:00"), ts("2024-01-06 00:00:00"), 2L),
      (1L, ts("2024-01-03 00:00:00"), ts("2024-01-04 00:00:00"), 3L),
      // key 2: strictly disjoint
      (2L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"), 4L),
      (2L, ts("2024-01-03 00:00:00"), ts("2024-01-04 00:00:00"), 5L)
    ).toDF("k", "s", "e", "tie")
    val got = Intervals.maxConcurrent(iv, "k", "s", "e", "tie")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 1L))
  }

  test("exclusive ends: back-to-back intervals never count as concurrent") {
    val iv = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"), 1L),
      (1L, ts("2024-01-02 00:00:00"), ts("2024-01-03 00:00:00"), 2L)
    ).toDF("k", "s", "e", "tie")
    val got = Intervals.maxConcurrent(iv, "k", "s", "e", "tie")
      .collect().head.getLong(1)
    assert(got == 1L, "the -1 must sort before the +1 at the shared instant")
  }

  test("one shuffle on the key — no interval self-join in the plan") {
    val iv = Seq((1L, ts("2024-01-01 00:00:00"),
      ts("2024-01-02 00:00:00"), 1L)).toDF("k", "s", "e", "tie")
    val plan = Intervals.maxConcurrent(iv, "k", "s", "e", "tie")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"sweep line must not join:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"expected exactly one key exchange:\n$plan")
  }

  test("bucketedPointJoin ≡ brute-force theta join (start inclusive, " +
      "end exclusive, multi-day spans, cross-midnight points)") {
    val iv = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")),
      (2L, ts("2024-01-02 12:00:00"), ts("2024-01-02 18:00:00")),
      (3L, ts("2024-02-01 00:00:00"), ts("2024-02-02 00:00:00")))
      .toDF("k", "s", "e")
    val pts = Seq(
      (10L, ts("2024-01-01 00:00:00")),  // == start of 1: included
      (11L, ts("2024-01-02 23:59:59")),  // inside 1 only
      (12L, ts("2024-01-03 00:00:00")),  // == end of 1: EXCLUDED
      (13L, ts("2024-01-02 12:00:00")),  // starts 2 (and inside 1)
      (14L, ts("2024-01-02 18:00:00")),  // end of 2: excluded; inside 1
      (15L, ts("2024-03-05 09:00:00")))  // matches nothing
      .toDF("p", "pts")
    val got = Intervals.bucketedPointJoin(iv, "s", "e", pts, "pts")
      .select("k", "p").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val want = (for {
      (k, s, e) <- Seq((1L, "2024-01-01 00:00:00", "2024-01-03 00:00:00"),
        (2L, "2024-01-02 12:00:00", "2024-01-02 18:00:00"),
        (3L, "2024-02-01 00:00:00", "2024-02-02 00:00:00"))
      (p, t) <- Seq((10L, "2024-01-01 00:00:00"),
        (11L, "2024-01-02 23:59:59"), (12L, "2024-01-03 00:00:00"),
        (13L, "2024-01-02 12:00:00"), (14L, "2024-01-02 18:00:00"),
        (15L, "2024-03-05 09:00:00"))
      if t >= s && t < e
    } yield (k, p)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(want == Set((1L, 10L), (1L, 11L), (1L, 13L), (1L, 14L),
      (2L, 13L)))
  }

  test("bucketedPointJoin plans an equi-join on the bucket, not a " +
      "nested loop") {
    val iv = Seq((1L, ts("2024-01-01 00:00:00"),
      ts("2024-01-03 00:00:00"))).toDF("k", "s", "e")
    val pts = Seq((10L, ts("2024-01-01 05:00:00"))).toDF("p", "pts")
    val plan = Intervals.bucketedPointJoin(iv, "s", "e", pts, "pts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"),
      s"must not plan a nested-loop join:\n$plan")
  }
}
