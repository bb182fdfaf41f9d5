package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.Row

import graft.SparkTestBase

/** O12–O21 enrichment (/root/reference/fetch_youtube_data.py:171-190) with
  * the SURVEY.md §2.1 divergences pinned: null-safe casts, ÷0 → null,
  * size(null) → 0, coerce-to-null timestamp parse. */
class TransformsSpec extends SparkTestBase {
  import spark.implicits._

  private def raw = Seq(
    // videoId, views, likes, comments, favourites, tags, description, publishedAt, duration
    ("v1", "1000", "10", "5", "0", Seq("a", "b"), "hello world",
      "2024-03-05T10:20:30Z", "PT1H2M10S"),
    ("v2", "0", null, null, "0", null, null,
      "2024-07-01T00:00:00Z", "PT15S"),
    ("v3", null, "3", "1", "0", Seq(), "",
      "not-a-date", "bogus")
  ).toDF("videoId", "views", "likes", "comments", "favourites", "tags",
    "description", "publishedAt", "duration")

  private lazy val out = Transforms.enrichVideoStats(raw)
    .orderBy("videoId").collect()

  private def row(id: String): Row =
    out.find(_.getAs[String]("videoId") == id).get

  test("casts: strict views → null-safe; likes/comments null-fill to 0") {
    assert(row("v1").getAs[Long]("views") == 1000L)
    assert(row("v3").isNullAt(row("v3").fieldIndex("views"))) // ref crashes here
    assert(row("v2").getAs[Long]("likes") == 0L)
    assert(row("v2").getAs[Long]("comments") == 0L)
  }

  test("lengths: tag_count/description_length with null → 0") {
    assert(row("v1").getAs[Int]("tag_count") == 2)
    assert(row("v2").getAs[Int]("tag_count") == 0)   // null tags
    assert(row("v3").getAs[Int]("tag_count") == 0)   // empty tags
    assert(row("v1").getAs[Int]("description_length") == 11)
    assert(row("v2").getAs[Int]("description_length") == 0) // null description
  }

  test("date parts: year / HH:mm:ss / day-name; coerce → null on garbage") {
    val r1 = row("v1")
    assert(r1.getAs[Int]("publish_year") == 2024)
    assert(r1.getAs[String]("publish_time") == "10:20:30")
    assert(r1.getAs[String]("published_dayofweek") == "Tuesday")
    val r3 = row("v3")
    assert(r3.isNullAt(r3.fieldIndex("publishedAt"))) // pandas NaT ≡ null
    assert(r3.isNullAt(r3.fieldIndex("publish_year")))
  }

  test("duration_sec: iso8601 parse; garbage → null") {
    assert(row("v1").getAs[Double]("duration_sec") == 3730.0)
    assert(row("v2").getAs[Double]("duration_sec") == 15.0)
    assert(row("v3").isNullAt(row("v3").fieldIndex("duration_sec")))
  }

  test("ratios: per-mille engagement; ÷0 and null views → null (not inf)") {
    assert(row("v1").getAs[Double]("comment_view_ratio") == 5.0)
    assert(row("v1").getAs[Double]("like_view_ratio") == 10.0)
    val r2 = row("v2") // views == 0: pandas yields inf; we pin null
    assert(r2.isNullAt(r2.fieldIndex("comment_view_ratio")))
    val r3 = row("v3") // views null
    assert(r3.isNullAt(r3.fieldIndex("like_view_ratio")))
  }

  test("publishedAt parses RFC-3339 to UTC instant") {
    assert(row("v1").getAs[Timestamp]("publishedAt") ==
      Timestamp.valueOf("2024-03-05 10:20:30"))
  }
}
