package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase

class ScdSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val log = Seq(
    // key 1: A → A (restated, compressed) → B → B (restated) → C
    (1L, ts("2024-01-01 00:00:00"), 10L, Some("A")),
    (1L, ts("2024-01-02 00:00:00"), 11L, Some("A")),
    (1L, ts("2024-01-03 00:00:00"), 12L, Some("B")),
    (1L, ts("2024-01-04 00:00:00"), 13L, Some("B")),
    (1L, ts("2024-01-05 00:00:00"), 14L, Some("C")),
    // key 2: single version
    (2L, ts("2024-01-01 00:00:00"), 20L, Some("X")),
    // key 3: null attr is a value: null → Y → null are three versions
    (3L, ts("2024-01-01 00:00:00"), 30L, None),
    (3L, ts("2024-01-02 00:00:00"), 31L, Some("Y")),
    (3L, ts("2024-01-03 00:00:00"), 32L, None)
  ).toDF("k", "ts", "tie", "attr")

  private lazy val hist =
    Scd.scd2(log, "k", "ts", "tie", Seq("attr"))
      .orderBy("k", "version").collect()

  test("consecutive equal attributes are compressed into one version") {
    val k1 = hist.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getString(1)).toSeq == Seq("A", "B", "C"))
    assert(k1.map(_.getLong(5)).toSeq == Seq(1L, 2L, 3L))
  }

  test("validity intervals chain: valid_to equals the next valid_from") {
    val k1 = hist.filter(_.getLong(0) == 1L)
    val froms = k1.map(_.getTimestamp(2))
    val tos = k1.map(r => Option(r.getTimestamp(3)))
    assert(tos.init.map(_.get).toSeq == froms.tail.toSeq)
    assert(tos.last.isEmpty)
  }

  test("exactly one current version per key, flagged by null valid_to") {
    val currents = hist.filter(_.getBoolean(4))
    assert(currents.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(currents.forall(_.isNullAt(3)))
  }

  test("null attribute values compare null-safely (null -> Y -> null = 3 versions)") {
    val k3 = hist.filter(_.getLong(0) == 3L)
    assert(k3.length == 3)
    assert(k3.map(r => Option(r.getString(1))).toSeq ==
      Seq(None, Some("Y"), None))
  }

  test("single-change key yields one open-ended version 1") {
    val k2 = hist.filter(_.getLong(0) == 2L)
    assert(k2.length == 1 && k2.head.getLong(5) == 1L &&
      k2.head.getBoolean(4))
  }

  test("plan: both windows share one exchange on the key") {
    val plan = Scd.scd2(log, "k", "ts", "tie", Seq("attr"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 key exchange, plan:\n$plan")
  }

  test("pitJoin: probes pick the version valid AT their ts — boundary " +
      "goes to the NEW version, pre-history probes drop, the current " +
      "row is open-ended") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val changes = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "bronze"),
      (1L, ts("2024-02-01 00:00:00"), 2L, "silver"),
      (1L, ts("2024-03-01 00:00:00"), 3L, "gold"))
      .toDF("k", "ts", "tie", "tier")
    val dim = Scd.scd2(changes, "k", "ts", "tie", Seq("tier"))
    val probes = Seq(
      (10L, 1L, ts("2023-12-31 23:59:59")), // before history → drops
      (11L, 1L, ts("2024-01-15 00:00:00")), // bronze
      (12L, 1L, ts("2024-02-01 00:00:00")), // boundary → silver
      (13L, 1L, ts("2024-12-01 00:00:00"))) // open current → gold
      .toDF("pid", "k", "ts")
    val got = Scd.pitJoin(probes, dim, "k", "ts")
      .orderBy("pid").collect()
      .map(r => (r.getAs[Long]("pid"), r.getAs[String]("tier"))).toSeq
    assert(got == Seq((11L, "bronze"), (12L, "silver"), (13L, "gold")),
      got.toString)
  }
}
