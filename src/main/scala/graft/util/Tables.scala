package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the driver testdata
  * (/root/testdata/sf{0.001,0.01,0.1}/&lt;name&gt;.parquet — TESTDATA.md).
  *
  * All engine queries read through here so scan behavior (vectorized
  * parquet reader, pushdown, pruning) is uniform. At 100 TB these become
  * partitioned-table reads; the call sites don't change.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` arrives in whatever parquet timestamp flavor the
    * fixture generator used, normalized here to session-tz
    * `TimestampType` (sessions pin UTC):
    *  - timestamp[ns]: Spark has no ns TimestampType, so sessions set
    *    `spark.sql.legacy.parquet.nanosAsLong=true` and we floor-divide
    *    to micros — matching DuckDB's truncating ns→µs read;
    *  - timestamp[us] without tz (isAdjustedToUTC=false): Spark reads
    *    TIMESTAMP_NTZ, which watermarks/unix_micros reject — cast to
    *    TimestampType interprets the naive value in the UTC session tz,
    *    the same instants DuckDB's naive TIMESTAMP read yields. */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
