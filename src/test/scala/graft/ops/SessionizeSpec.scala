package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase

class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("gap rule splits sessions; boundary gap stays in-session") {
    // user 1: events at 10:00, 10:10, 10:40 with a 15-min gap rule:
    // 10-min gap keeps, 30-min gap breaks. user 2: single event.
    val events = Seq(
      (1L, 1L, ts(0)), (2L, 1L, ts(10)), (3L, 1L, ts(40)),
      (4L, 2L, ts(5))
    ).toDF("event_id", "user_id", "ts")
    val got = Sessionize.sessions(events, "user_id", "ts", "event_id", 900L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getTimestamp(3), r.getTimestamp(4))).toMap
    assert(got.size == 3)
    assert(got((1L, 1L)) == ((2L, ts(0), ts(10))))
    assert(got((1L, 2L)) == ((1L, ts(40), ts(40))))
    assert(got((2L, 1L)) == ((1L, ts(5), ts(5))))
    // a gap EXACTLY equal to the threshold does not break (strict >)
    val exact = Seq((1L, 1L, ts(0)), (2L, 1L, ts(15)))
      .toDF("event_id", "user_id", "ts")
    assert(Sessionize.sessions(exact, "user_id", "ts", "event_id", 900L)
      .count() == 1)
  }

  test("duplicate timestamps order by id: one session, deterministic") {
    val events = Seq((2L, 1L, ts(0)), (1L, 1L, ts(0)), (3L, 1L, ts(1)))
      .toDF("event_id", "user_id", "ts")
    val got = Sessionize.sessions(events, "user_id", "ts", "event_id", 900L)
      .collect()
    assert(got.length == 1 && got.head.getLong(2) == 3L)
  }

  test("sessionPathNGrams: trigrams respect event order and never cross " +
      "a session boundary") {
    val events = Seq(
      // user 1, session 1: a b c d -> trigrams "a b c", "b c d"
      (1L, 1L, ts(0), "a"), (2L, 1L, ts(1), "b"),
      (3L, 1L, ts(2), "c"), (4L, 1L, ts(3), "d"),
      // user 1, session 2 (40-min gap): c d e -> "c d e"; the boundary
      // must NOT produce "c d c"/"d c d" spanning grams
      (5L, 1L, ts(43), "c"), (6L, 1L, ts(44), "d"), (7L, 1L, ts(45), "e"),
      // user 2: a b c again -> "a b c" count rises to 2
      (8L, 2L, ts(0), "a"), (9L, 2L, ts(1), "b"), (10L, 2L, ts(2), "c"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Sessionize.sessionPathNGrams(events, "user_id", "ts",
        "event_id", "event_type", gapSeconds = 900L, n = 3, topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a b c" -> 2L, "b c d" -> 1L, "c d e" -> 1L))
  }

  test("sessionPathNGrams: topK truncates on (count desc, gram asc)") {
    val events = Seq(
      (1L, 1L, ts(0), "x"), (2L, 1L, ts(1), "y"), (3L, 1L, ts(2), "z"),
      (4L, 2L, ts(0), "a"), (5L, 2L, ts(1), "b"), (6L, 2L, ts(2), "c"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Sessionize.sessionPathNGrams(events, "user_id", "ts",
        "event_id", "event_type", 900L, n = 3, topK = 1)
      .collect()
    assert(got.length == 1)
    assert(got.head.getString(0) == "a b c") // tie on count -> gram asc
  }
}
