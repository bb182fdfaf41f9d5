package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase

class IntervalsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

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
}
