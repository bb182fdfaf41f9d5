package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Typed entities for the two core output tables (SURVEY.md §1.3:
  * `Dataset[T]` where type safety pays — the stable, hand-maintained
  * schemas; DataFrame everywhere schemas are dynamic).
  *
  * Field names/types mirror FIXTURES.md §B exactly, so
  * `df.as[VideoStats]` works directly on pipeline output.
  */
object Entities {

  /** channel_stats row (replaced each run —
    * /root/reference/fetch_youtube_data.py:198; counters stay strings
    * exactly like the reference loads them, :65-67). */
  final case class ChannelStats(
      channel_title: String,
      published_date: String,
      country: Option[String],
      subscribers: String,
      views: String,
      totalVideos: String,
      playlistId: String)

  /** video_stats row (appended — :194; raw + derived columns :171-190). */
  final case class VideoStats(
      videoId: String,
      channel: String,
      video_title: String,
      description: Option[String],
      tags: Option[Seq[String]],
      publishedAt: Option[Timestamp],
      likes: Long,
      views: Option[Long],
      comments: Long,
      favourites: Long,
      duration: String,
      tag_count: Int,
      description_length: Int,
      publish_year: Option[Int],
      publish_time: Option[String],
      published_dayofweek: Option[String],
      duration_sec: Option[Double],
      comment_view_ratio: Option[Double],
      like_view_ratio: Option[Double])

  implicit val channelStatsEncoder: Encoder[ChannelStats] =
    Encoders.product[ChannelStats]
  implicit val videoStatsEncoder: Encoder[VideoStats] =
    Encoders.product[VideoStats]

  /** Typed engagement top-k: lambda filter with compile-time field access,
    * distributed TakeOrderedAndProject for the ranking (no driver sort). */
  def topEngagement(ds: Dataset[VideoStats], k: Int): Dataset[VideoStats] =
    ds.filter((v: VideoStats) => v.views.exists(_ > 0))
      .orderBy(org.apache.spark.sql.functions.desc_nulls_last("like_view_ratio"))
      .limit(k)
}
