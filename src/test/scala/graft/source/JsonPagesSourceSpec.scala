package graft.source

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.source.v2.JsonPagesSource

class JsonPagesSourceSpec extends SparkTestBase {

  private lazy val dir = {
    val d = Files.createTempDirectory(
      Paths.get("/root/repo/target"), "pages_").toString
    Files.writeString(Paths.get(s"$d/page1.json"),
      """{"items": [{"contentDetails": {"videoId": "v1"}},
        |           {"contentDetails": {"videoId": "v2"}}],
        | "nextPageToken": "p2"}""".stripMargin)
    Files.writeString(Paths.get(s"$d/page2.json"),
      """{"items": [{"contentDetails": {"videoId": "v3"}}]}""")
    d
  }

  test("DSv2 source: one row and one partition per page") {
    val df = spark.read.format(JsonPagesSource.Name)
      .option("path", dir).load()
    assert(df.count() == 2)
    assert(df.rdd.getNumPartitions == 2,
      "each page must be its own InputPartition (parallel fetch unit)")
  }

  test("pages flow into the YouTubeSource flatten (end-to-end O3)") {
    import spark.implicits._
    val pages = spark.read.format(JsonPagesSource.Name)
      .option("path", dir).load().as[String]
    val ids = YouTubeSource.playlistVideoIds(spark, pages)
      .as[String].collect().sorted.toSeq
    assert(ids == Seq("v1", "v2", "v3"))
  }

  test("empty/missing dir yields an empty frame, not an error") {
    val df = spark.read.format(JsonPagesSource.Name)
      .option("path", s"$dir/nonexistent").load()
    assert(df.isEmpty)
  }
}
