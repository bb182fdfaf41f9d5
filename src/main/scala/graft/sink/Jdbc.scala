package graft.sink

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC sink/scan wrappers (O6, O22, O23 —
  * /root/reference/fetch_youtube_data.py:154-156, :194, :198).
  *
  * Runtime-exercised against embedded Derby in JdbcSpec (the sandbox has
  * no server database; Derby ships with Spark and runs in-process, so the
  * append / truncate-replace / probe semantics are tested for real).
  * Key points vs the reference:
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

  /** O22: append (video_stats). Creates the table on first append, like
    * pandas `to_sql(if_exists="append")`. */
  def append(df: DataFrame, url: String, table: String,
      props: Properties): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, props)

  /** O23: snapshot replace (channel_stats). */
  def replace(df: DataFrame, url: String, table: String,
      props: Properties): Unit =
    df.write.mode(SaveMode.Overwrite).option("truncate", "true")
      .jdbc(url, table, props)

  /** O6's guard: does the table exist? (≡ engine.has_table at :155).
    * Probes the catalog through connection METADATA, not a trial query —
    * and only a successful connection can answer "absent": a
    * connectivity/auth failure propagates instead of being misread as
    * "no table" (which, in the reference's incremental flow, would
    * re-append the full fetch as duplicates). A `schema.table` qualifier
    * is honored (both parts compared); comparisons are case-insensitive
    * to absorb engines that fold unquoted identifiers (Derby/Postgres
    * fold opposite directions). Note: DriverManager resolves drivers from
    * the application classloader — on a cluster, ship the JDBC driver on
    * the driver classpath (--driver-class-path), not only --jars. */
  def tableExists(spark: SparkSession, url: String, table: String,
      props: Properties): Boolean = {
    val (schemaOpt, name) = table.lastIndexOf('.') match {
      case -1 => (None, table)
      case i  => (Some(table.substring(0, i)), table.substring(i + 1))
    }
    val conn = DriverManager.getConnection(url, props)
    try {
      val rs = conn.getMetaData.getTables(null, null, null,
        Array("TABLE", "VIEW"))
      try {
        var found = false
        while (!found && rs.next())
          found = rs.getString("TABLE_NAME").equalsIgnoreCase(name) &&
            schemaOpt.forall(s =>
              s.equalsIgnoreCase(rs.getString("TABLE_SCHEM")))
        found
      } finally rs.close()
    } finally conn.close()
  }
}
