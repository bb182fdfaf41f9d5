package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.Iso8601.iso8601_seconds

/** The reference's video enrichment (O12–O21,
  * /root/reference/fetch_youtube_data.py:171-190) as pure
  * DataFrame => DataFrame transforms — vectorized, codegen'd, no UDFs
  * except the custom Iso8601Seconds expression.
  *
  * Documented divergences (SURVEY.md §2.1 / §7.4), all pinned by tests:
  *  - casts are null-safe (`cast` → null) where the reference crashes (:171);
  *  - ÷0 → null instead of pandas inf/NaN (:189-190);
  *  - `size(null)` is forced to 0 via coalesce (legacy -1 never leaks);
  *  - time-of-day is "HH:mm:ss" string (Spark has no TIME type, :181).
  */
object Transforms {

  /** O12/O13: strict + null-filled numeric casts (:171-174). `try_cast`
    * keeps coerce-to-null semantics even under Spark 4's default ANSI mode
    * (the reference crashes on unparseable counts — we totalize). */
  def castCounters(df: DataFrame): DataFrame = df
    .withColumn("views", expr("try_cast(views AS BIGINT)"))
    .withColumn("likes", coalesce(expr("try_cast(likes AS BIGINT)"), lit(0L)))
    .withColumn("comments", coalesce(expr("try_cast(comments AS BIGINT)"), lit(0L)))
    .withColumn("favourites", coalesce(expr("try_cast(favourites AS BIGINT)"), lit(0L)))

  /** O14/O15: array/string lengths with null→0 (:176-177). */
  def addLengths(df: DataFrame): DataFrame = df
    .withColumn("tag_count", coalesce(size(col("tags")), lit(0))
      .cast("int"))
    .withColumn("tag_count", when(col("tag_count") < 0, 0)
      .otherwise(col("tag_count"))) // legacy size(null) = -1 guard
    .withColumn("description_length",
      coalesce(length(col("description")), lit(0)).cast("int"))

  /** O16–O19: timestamp parse (coerce→null, pandas `errors="coerce"`
    * semantics — try_to_timestamp, ANSI-proof) + date parts (:179-182). */
  def addDateParts(df: DataFrame): DataFrame = df
    .withColumn("publishedAt", try_to_timestamp(col("publishedAt")))
    .withColumn("publish_year", year(col("publishedAt")))
    .withColumn("publish_time", date_format(col("publishedAt"), "HH:mm:ss"))
    .withColumn("published_dayofweek", date_format(col("publishedAt"), "EEEE"))

  /** O20: ISO-8601 duration → seconds (:184-186), custom expression. */
  def addDurationSeconds(df: DataFrame): DataFrame =
    df.withColumn("duration_sec", iso8601_seconds(col("duration")))

  /** O21: engagement ratios; ÷0 → null (documented divergence, :189-190). */
  def addRatios(df: DataFrame): DataFrame = df
    .withColumn("comment_view_ratio",
      col("comments") / nullif(col("views"), lit(0L)) * 1000)
    .withColumn("like_view_ratio",
      col("likes") / nullif(col("views"), lit(0L)) * 1000)

  /** Full enrichment pipeline over a raw video_stats frame
    * (FIXTURES.md §B output schema). */
  def enrichVideoStats(df: DataFrame): DataFrame =
    addRatios(addDurationSeconds(addDateParts(addLengths(castCounters(df)))))
}
