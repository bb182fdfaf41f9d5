package graft.source

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** Offline-first YouTube Data API v3 source seam (SURVEY.md §2.2).
  *
  * The reference fetches live JSON (channels().list at
  * /root/reference/fetch_youtube_data.py:53-57, playlistItems pagination
  * :83-100, videos().list chunks :113-119) and flattens by hand
  * (:59-69, :121-134). Here each endpoint's *response documents* arrive as
  * a Dataset[String] of raw JSON (canned fixtures offline; at scale a
  * DataSourceV2 reader would emit the same strings one page per
  * InputPartition, with the 50-id batching of :113-117 inside the
  * partition reader) and flattening is declarative: from_json + nested
  * field projection, so Catalyst prunes/pushes like any other source.
  */
object YouTubeSource {

  /** O1/O2: channels.list response pages → channel_data frame
    * (column names from fetch_youtube_data.py:61-69). */
  def channels(spark: SparkSession, pages: Dataset[String]): DataFrame =
    pages
      .select(from_json(col("value"), Schemas.channelsResponse).as("r"))
      .select(explode(col("r.items")).as("item"))
      .select(
        col("item.snippet.title").as("channel_title"),
        col("item.snippet.publishedAt").as("published_date"),
        col("item.snippet.country").as("country"), // nullable ≡ .get(:64)
        col("item.statistics.subscriberCount").as("subscribers"),
        col("item.statistics.viewCount").as("views"),
        col("item.statistics.videoCount").as("totalVideos"),
        col("item.contentDetails.relatedPlaylists.uploads").as("playlistId"))

  /** O3: playlistItems.list pages → (videoId) rows — the 1-playlist→N-ids
    * fan-out (:95-96) as explode; pagination is upstream (one JSON doc per
    * page). */
  def playlistVideoIds(spark: SparkSession, pages: Dataset[String]): DataFrame =
    pages
      .select(from_json(col("value"), Schemas.playlistItemsResponse).as("r"))
      .select(explode(col("r.items")).as("item"))
      .select(col("item.contentDetails.videoId").as("videoId"))

  /** O10/O11: videos.list response pages → raw video_stats frame with the
    * reference's column names (:122-134), ready for
    * etl.Transforms.enrichVideoStats. */
  def videoStats(spark: SparkSession, pages: Dataset[String]): DataFrame =
    pages
      .select(from_json(col("value"), Schemas.videosResponse).as("r"))
      .select(explode(col("r.items")).as("item"))
      .select(
        col("item.id").as("videoId"),
        col("item.snippet.channelTitle").as("channel"),
        col("item.snippet.title").as("video_title"),
        col("item.snippet.description").as("description"),
        col("item.snippet.tags").as("tags"),
        col("item.snippet.publishedAt").as("publishedAt"),
        col("item.statistics.likeCount").as("likes"),
        col("item.statistics.viewCount").as("views"),
        col("item.statistics.commentCount").as("comments"),
        col("item.statistics.favoriteCount").as("favourites"),
        col("item.contentDetails.duration").as("duration"))
}
