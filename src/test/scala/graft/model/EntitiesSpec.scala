package graft.model

import graft.SparkTestBase
import graft.etl.Transforms

class EntitiesSpec extends SparkTestBase {
  import spark.implicits._
  import Entities._

  test("pipeline output binds to Dataset[VideoStats] (schema contract)") {
    val raw = Seq(
      ("v1", "1000", "10", "5", "0", Some(Seq("a")), Some("desc"),
        "2024-03-05T10:20:30Z", "PT1M"),
      ("v2", "0", null, null, "0", None, None, "bad", "PT2M")
    ).toDF("videoId", "views", "likes", "comments", "favourites", "tags",
      "description", "publishedAt", "duration")
      .withColumn("channel", org.apache.spark.sql.functions.lit("c"))
      .withColumn("video_title", org.apache.spark.sql.functions.lit("t"))
    val typed = Transforms.enrichVideoStats(raw).as[VideoStats]
    val byId = typed.collect().map(v => v.videoId -> v).toMap
    assert(byId("v1").duration_sec.contains(60.0))
    assert(byId("v1").tags.exists(_ == Seq("a")))
    assert(byId("v2").publishedAt.isEmpty) // coerce→None through the Encoder
    assert(byId("v2").likes == 0L)
  }

  test("typed top-k engagement runs distributed and ranks correctly") {
    val raw = Seq(
      ("hi", "100", "50", "1", "0"), // ratio 500
      ("lo", "100", "1", "1", "0"),  // ratio 10
      ("zero", "0", "9", "1", "0")   // filtered (no views)
    ).map { case (id, v, l, c, f) =>
      (id, v, l, c, f, None: Option[Seq[String]], None: Option[String],
        "2024-01-01T00:00:00Z", "PT1S")
    }.toDF("videoId", "views", "likes", "comments", "favourites", "tags",
      "description", "publishedAt", "duration")
      .withColumn("channel", org.apache.spark.sql.functions.lit("c"))
      .withColumn("video_title", org.apache.spark.sql.functions.lit("t"))
    val typed = Transforms.enrichVideoStats(raw).as[Entities.VideoStats]
    val top = Entities.topEngagement(typed, 1).collect()
    assert(top.map(_.videoId).toSeq == Seq("hi"))
    val p = Entities.topEngagement(typed, 1)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
    assert(p.contains("TakeOrderedAndProject"), "top-k must not global-sort")
  }
}
