package graft

import java.nio.file.{Files, Paths}

/** Smoke test for the spark-submit entry point: fixture page files on disk
  * → RunPipeline.run → sink snapshots written, idempotent re-run. */
class RunPipelineSpec extends SparkTestBase {

  test("RunPipeline.run wires DSv2 page dirs into the pipeline") {
    val base = Files.createTempDirectory(
      Paths.get("/root/repo/target"), "runpipe_").toString
    for (sub <- Seq("channels", "playlists", "videos"))
      Files.createDirectories(Paths.get(s"$base/pages/$sub"))
    Files.writeString(Paths.get(s"$base/pages/channels/p1.json"),
      """{"items": [
        |  {"snippet": {"title": "Chan A",
        |               "publishedAt": "2020-01-01T00:00:00Z"},
        |   "statistics": {"subscriberCount": "1", "viewCount": "2",
        |                  "videoCount": "1"},
        |   "contentDetails": {"relatedPlaylists": {"uploads": "PL_A"}}}
        |]}""".stripMargin)
    Files.writeString(Paths.get(s"$base/pages/playlists/p1.json"),
      """{"items": [{"contentDetails": {"videoId": "v1"}}]}""")
    Files.writeString(Paths.get(s"$base/pages/videos/p1.json"),
      """{"items": [
        |  {"id": "v1",
        |   "snippet": {"channelTitle": "Chan A", "title": "T",
        |               "publishedAt": "2024-01-01T00:00:00Z"},
        |   "statistics": {"likeCount": "1", "viewCount": "10",
        |                  "favoriteCount": "0"},
        |   "contentDetails": {"duration": "PT30S"}}
        |]}""".stripMargin)

    val sink = s"$base/sink"
    val r1 = RunPipeline.run(spark, s"$base/pages", sink)
    assert(r1.newVideos == 1 && r1.channels == 1)
    assert(spark.read.parquet(s"$sink/video_stats").count() == 1)
    assert(spark.read.parquet(s"$sink/channel_stats").count() == 1)

    val r2 = RunPipeline.run(spark, s"$base/pages", sink)
    assert(r2.newVideos == 0, "second run over same pages must be a no-op")
  }
}
