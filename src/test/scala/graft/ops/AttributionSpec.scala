package graft.ops

import graft.SparkTestBase

/** Hand cases for exact Shapley attribution. */
class AttributionSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("shapleyAttribution: two converters {click} and {click,view} " +
      "give the exact hand values phi24 = 36/12/0/0") {
    // user 1: click -> purchase; user 2: click, view -> purchase
    // v(S): user1 counted iff click in S; user2 iff {click,view} sub S
    // phi(click)*24 = sum over S not containing click of
    //   w(|S|)*(1 + [view in S]) = 24 + 12 = 36;
    // phi(view)*24 = sum over S containing click of w = 12; others 0
    val events = Seq(
      (1L, "click", ts(1000)), (1L, "purchase", ts(2000)),
      (2L, "click", ts(1000)), (2L, "view", ts(1500)),
      (2L, "purchase", ts(3000))
    ).toDF("user_id", "event_type", "ts")
    val got = Attribution.shapleyAttribution(events, "user_id",
        "event_type", "ts", "purchase")
      .collect().map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("phi24"), r.getAs[Double]("phi_r"))).toMap
    assert(got("click") == (36L, 1.5))
    assert(got("view") == (12L, 0.5))
    assert(got("error") == (0L, 0.0))
    assert(got("signup") == (0L, 0.0))
  }

  test("shapleyAttribution: efficiency — phis sum to v(full) minus " +
      "the zero-touch converters; non-converters earn nothing") {
    val events = Seq(
      (1L, "view", ts(1000)), (1L, "purchase", ts(2000)),
      (2L, "purchase", ts(500)), // converter with no touches: no credit
      (3L, "click", ts(1000)), (3L, "error", ts(1100)) // non-converter
    ).toDF("user_id", "event_type", "ts")
    val got = Attribution.shapleyAttribution(events, "user_id",
        "event_type", "ts", "purchase")
      .collect().map(r => r.getAs[String]("channel") ->
        r.getAs[Long]("phi24")).toMap
    // only user 1 (set {view}) earns credit: phi(view) = 1
    assert(got.values.sum == 24L)
    assert(got("view") == 24L)
    assert(got("click") == 0L)
  }
}
