package graft.sink

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC sink/scan wrappers (O6, O22, O23 —
  * /root/reference/fetch_youtube_data.py:154-156, :194, :198).
  *
  * The sandbox has no database, so these are thin, untested-at-runtime
  * wrappers documenting the engine's JDBC surface; the parquet twins in
  * etl.Pipeline carry the tested semantics. Key points vs the reference:
  *  - truncate-overwrite (not drop) preserves DDL, matching
  *    `if_exists="replace"` intent without losing grants/indexes;
  *  - the :155 `SELECT videoid` case-folding bug (SURVEY.md §2.1 bug 1) is
  *    avoided by quoting through the DataFrame API instead of raw SQL;
  *  - predicate/column pruning pushes into the remote scan via Catalyst.
  */
object Jdbc {

  def read(spark: SparkSession, url: String, table: String,
      props: Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** O22: append (video_stats). */
  def append(df: DataFrame, url: String, table: String,
      props: Properties): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, props)

  /** O23: snapshot replace (channel_stats). */
  def replace(df: DataFrame, url: String, table: String,
      props: Properties): Unit =
    df.write.mode(SaveMode.Overwrite).option("truncate", "true")
      .jdbc(url, table, props)

  /** O6's guard: does the table exist? (≡ engine.has_table at :155). */
  def tableExists(spark: SparkSession, url: String, table: String,
      props: Properties): Boolean =
    try { spark.read.jdbc(url, table, props).schema; true }
    catch { case _: Exception => false }
}
