package graft

import org.apache.spark.sql.SparkSession

import graft.etl.Pipeline
import graft.source.v2.JsonPagesSource

/** The daily-ETL job entry point (E1) — the spark-submit analog of the
  * reference's scheduled run (/root/reference/.github/workflows/
  * daily_etl.yml:44-46 cron → `python fetch_youtube_data.py`).
  *
  * Page documents are read through the DSv2 source from three
  * subdirectories of the pages dir (offline fixtures; a live deployment
  * points the same source at a registered fetcher instead):
  *
  *   <pagesDir>/channels/  one channels.list response .json per page
  *   <pagesDir>/playlists/ playlistItems.list response pages
  *   <pagesDir>/videos/    videos.list response pages
  *
  * Usage:
  *   spark-submit --class graft.RunPipeline <jar> <pagesDir> <sinkDir>
  * (or env SPARK_GRAFT_PAGES / SPARK_GRAFT_SINK; args win). Re-running is
  * a no-op on video_stats — the reference's crash-recovery invariant.
  */
object RunPipeline {

  /** The job body, separated from session construction so tests and
    * notebooks can call it on an existing session. */
  def run(spark: SparkSession, pagesDir: String,
      sinkDir: String): Pipeline.Result = {
    import spark.implicits._
    def pages(sub: String) = spark.read.format(JsonPagesSource.Name)
      .option("path", s"$pagesDir/$sub").load().as[String]
    Pipeline.run(spark, pages("channels"), pages("playlists"),
      pages("videos"), sinkDir)
  }

  def main(args: Array[String]): Unit = {
    val pagesDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_PAGES"))
      .getOrElse(sys.error("usage: RunPipeline <pagesDir> <sinkDir>"))
    val sinkDir = args.lift(1)
      .orElse(sys.env.get("SPARK_GRAFT_SINK"))
      .getOrElse(sys.error("usage: RunPipeline <pagesDir> <sinkDir>"))
    val spark = SparkSession.builder()
      .appName("graft-daily-etl")
      // spark-submit supplies the master on a cluster; default local here
      .config("spark.sql.session.timeZone", "UTC")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val r = run(spark, pagesDir, sinkDir)
      println(s"""{"new_videos":${r.newVideos},"channels":${r.channels}}""")
    } finally spark.stop()
  }
}
