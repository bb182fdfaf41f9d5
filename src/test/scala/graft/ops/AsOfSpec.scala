package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase

class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of picks the latest right row at or before left.ts") {
    val left = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00")),
      (11L, 1L, ts("2024-01-01 12:00:00")),
      (12L, 2L, ts("2024-01-01 09:00:00"))   // before any right row
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100L, "a"),
      (1L, ts("2024-01-01 11:00:00"), 101L, "b"),
      (2L, ts("2024-01-01 09:30:00"), 102L, "c")
    ).toDF("user_id", "ts", "sig_id", "tag")

    val got = AsOf.backward(left, right, "user_id", "ts", "sig_id",
      Seq("tag" -> "tag")).orderBy("event_id")
      .collect().map(r => (r.getLong(0), Option(r.getAs[String]("tag"))))
    assert(got.toSeq == Seq((10L, Some("a")), (11L, Some("b")), (12L, None)))
  }

  test("same-instant right row is visible (<= semantics); latest seq wins") {
    val left = Seq((1L, 7L, ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, ts("2024-01-01 10:00:00"), 1L, "early"),
      (7L, ts("2024-01-01 10:00:00"), 2L, "late")
    ).toDF("user_id", "ts", "sig_id", "tag")
    val got = AsOf.backward(left, right, "user_id", "ts", "sig_id",
      Seq("tag" -> "tag")).collect()
    assert(got.head.getAs[String]("tag") == "late")
  }
}
