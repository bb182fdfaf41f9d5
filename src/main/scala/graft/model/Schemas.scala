package graft.model

import org.apache.spark.sql.types._

/** Pinned StructTypes for every engine boundary (SURVEY.md §1.3: the
  * reference infers schemas from dicts at
  * /root/reference/fetch_youtube_data.py:71,136; we pin them explicitly).
  *
  * API shapes mirror exactly the fields the reference reads
  * (FIXTURES.md §A, citations inline).
  */
object Schemas {

  /** channels.list item — fields read at fetch_youtube_data.py:60-68. */
  val channelItem: StructType = StructType(Seq(
    StructField("snippet", StructType(Seq(
      StructField("title", StringType),         // :62
      StructField("publishedAt", StringType),   // :63 RFC-3339
      StructField("country", StringType)        // :64 optional (.get)
    ))),
    StructField("statistics", StructType(Seq(
      StructField("subscriberCount", StringType), // :65 API returns strings
      StructField("viewCount", StringType),       // :66
      StructField("videoCount", StringType)       // :67
    ))),
    StructField("contentDetails", StructType(Seq(
      StructField("relatedPlaylists", StructType(Seq(
        StructField("uploads", StringType)        // :68
      )))
    )))
  ))

  val channelsResponse: StructType = StructType(Seq(
    StructField("items", ArrayType(channelItem))))

  /** playlistItems.list — read at fetch_youtube_data.py:95-98. */
  val playlistItemsResponse: StructType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("contentDetails", StructType(Seq(
        StructField("videoId", StringType)))))))), // :96
    StructField("nextPageToken", StringType)       // :98-100 pagination
  ))

  /** videos.list item — fields read at fetch_youtube_data.py:121-133. */
  val videoItem: StructType = StructType(Seq(
    StructField("id", StringType),                 // :123
    StructField("snippet", StructType(Seq(
      StructField("channelTitle", StringType),     // :124
      StructField("title", StringType),            // :125
      StructField("description", StringType),      // :126
      StructField("tags", ArrayType(StringType)),  // :127 optional → null
      StructField("publishedAt", StringType)       // :128
    ))),
    StructField("statistics", StructType(Seq(
      StructField("likeCount", StringType),        // :129 optional
      StructField("viewCount", StringType),        // :130 optional
      StructField("commentCount", StringType),     // :131 optional
      StructField("favoriteCount", StringType)     // :132
    ))),
    StructField("contentDetails", StructType(Seq(
      StructField("duration", StringType)          // :133 ISO-8601
    )))
  ))

  val videosResponse: StructType = StructType(Seq(
    StructField("items", ArrayType(videoItem))))

  /** Output: channel_stats (replaced each run, fetch_youtube_data.py:198). */
  val channelStats: StructType = StructType(Seq(
    StructField("channel_title", StringType),
    StructField("published_date", StringType),
    StructField("country", StringType),
    StructField("subscribers", StringType), // kept string like the reference :65
    StructField("views", StringType),
    StructField("totalVideos", StringType),
    StructField("playlistId", StringType)
  ))
}
