package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark plan plus (when SQL-expressible)
  * its DuckDB oracle twin. Column names MUST match between the two — the
  * driver sorts columns by name and hash-compares values (builder prompt).
  * Every query ends in a total-order sort for deterministic row order
  * (SURVEY.md §5.3).
  */
final case class Q(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)
