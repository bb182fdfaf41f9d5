package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.source.YouTubeSource

/** The reference's full daily ETL (E1, /root/reference/fetch_youtube_data.py
  * :143-200) as one composable, idempotent pipeline over the offline source
  * seam:
  *
  *   channels → playlist ids → video ids (fan-out, dedup O4) →
  *   incremental anti-join vs sink (O6-O8) → empty short-circuit (O9) →
  *   fetch+flatten new stats (O10/O11) → enrich (O12-O21) →
  *   append video_stats / overwrite channel_stats (O22/O23).
  *
  * Sinks are parquet directories here (the Verify-compatible twin of the
  * reference's Postgres tables); sink.Jdbc holds the JDBC form. The
  * cross-run state is ONLY the sink — re-running with the same inputs is a
  * no-op on video_stats, which is the reference's crash-recovery invariant
  * (:152-165) and our golden e2e test.
  */
object Pipeline {

  final case class Result(newVideos: Long, channels: Long)

  def run(
      spark: SparkSession,
      channelPages: Dataset[String],
      playlistPages: Dataset[String],
      videoPages: Dataset[String],
      sinkDir: String): Result = {

    val channelData = YouTubeSource.channels(spark, channelPages)

    // O3+O4: fan-out to video ids, global dedup
    val fetchedIds = Incremental.dedup(
      YouTubeSource.playlistVideoIds(spark, playlistPages), "videoId")

    // O6: sink scan (empty relation when the sink doesn't exist yet ≡ the
    // has_table probe at :155-156)
    val videoSinkPath = s"$sinkDir/video_stats"
    val existing: DataFrame =
      if (new java.io.File(videoSinkPath).exists())
        spark.read.parquet(videoSinkPath).select("videoId")
      else fetchedIds.limit(0)

    // O8/O9: incremental filter + short-circuit
    val newCount = Incremental.incrementalBatch(fetchedIds, existing, "videoId")
      .map { newIds =>
        // O10/O11: "fetch" = the video pages source filtered to new ids
        // (the API-quota saving of :152-168: only new ids are fetched)
        val stats = YouTubeSource.videoStats(spark, videoPages)
          .join(newIds, Seq("videoId"), "left_semi")
        // O12-O21 + O22. The row count rides the write itself via
        // observe() — a count() after the append would re-execute the
        // whole plan (parse, joins, anti-join) AND re-read the sink path
        // it just appended to, relying on a stale file listing for
        // correctness.
        val obs = new org.apache.spark.sql.Observation()
        Transforms.enrichVideoStats(stats)
          .observe(obs, count(lit(1)).as("n"))
          .write.mode(SaveMode.Append).parquet(videoSinkPath)
        obs.get("n").asInstanceOf[Long]
      }
      .getOrElse(0L)

    // O23: full snapshot replace each run
    channelData.write.mode(SaveMode.Overwrite)
      .parquet(s"$sinkDir/channel_stats")

    Result(newCount, channelData.count())
  }
}
