package graft.source

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.source.v2.{JsonPagesSource, PagedFetch}

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

  // --- live modes: the pagination loop + chunking THROUGH the DSv2 seam --

  test("mode=pages: reader follows nextPageToken across a fake fetcher") {
    PagedFetch.Fetchers.register("spec-pages", {
      case PagedFetch.PageRequest(None, Nil) =>
        """{"items": [{"contentDetails": {"videoId": "v1"}}],
          | "nextPageToken": "t2"}""".stripMargin
      case PagedFetch.PageRequest(Some("t2"), Nil) =>
        """{"items": [{"contentDetails": {"videoId": "v2"}}]}"""
      case other => fail(s"unexpected request: $other")
    })
    import spark.implicits._
    val pages = spark.read.format(JsonPagesSource.Name)
      .option("fetcher", "spec-pages").option("mode", "pages").load()
    assert(pages.rdd.getNumPartitions == 1,
      "a token stream is sequential: exactly one partition")
    val ids = YouTubeSource.playlistVideoIds(spark, pages.as[String])
      .as[String].collect().sorted.toSeq
    assert(ids == Seq("v1", "v2"))
  }

  test("mode=chunks: one partition per 50-id chunk, ids batched correctly") {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Seq[String]]()
    PagedFetch.Fetchers.register("spec-chunks", { req =>
      seen.add(req.ids)
      s"""{"n": ${req.ids.size}}"""
    })
    val ids = (1 to 120).map(i => s"v$i")
    val df = spark.read.format(JsonPagesSource.Name)
      .option("fetcher", "spec-chunks").option("mode", "chunks")
      .option("ids", ids.mkString(",")).load()
    assert(df.rdd.getNumPartitions == 3, "120 ids -> 50/50/20 partitions")
    // camelCase options must be honored (getTable delivers original-case
    // keys; a lowercase-only lookup would silently fall back to 50)
    val sized = spark.read.format(JsonPagesSource.Name)
      .option("fetcher", "spec-chunks").option("mode", "chunks")
      .option("chunkSize", "60").option("ids", ids.mkString(",")).load()
    assert(sized.rdd.getNumPartitions == 2, "chunkSize=60 -> 2 partitions")
    assert(df.count() == 3)
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSeq.sortBy(-_.size).map(_.size) == Seq(50, 50, 20))
    assert(seen.asScala.flatten.toSeq.sorted == ids.sorted)
  }

  test("retry path: a flaky fetcher succeeds through the source") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    PagedFetch.Fetchers.register("spec-flaky", { _ =>
      if (attempts.incrementAndGet() < 2)
        throw new RuntimeException("transient")
      """{"items": []}"""
    })
    val df = spark.read.format(JsonPagesSource.Name)
      .option("fetcher", "spec-flaky").option("mode", "pages")
      .option("retries", "3").option("backoffMs", "1").load()
    assert(df.count() == 1)
    assert(attempts.get() == 2)
  }
}
