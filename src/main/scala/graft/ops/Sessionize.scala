package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: the gap-rule counterpart of the streaming
  * `session_window` (Streams.sessionWindows) for bounded event tables —
  * the classic "rebuild sessions over a year of logs" job.
  *
  * Plan shape: ONE shuffle by user — the lag window, the running-sum
  * window, and the final per-session aggregate all share the same
  * (user) hash partitioning, so Catalyst plans a single Exchange and
  * three in-partition passes. Event-time comparisons run on exact
  * microseconds (unix_micros), never on seconds-truncated casts, so the
  * DuckDB twin (epoch_us) agrees bit-for-bit. Ordering inside a user is
  * (ts, id) — a total order, making session boundaries deterministic
  * even with duplicate timestamps.
  */
object Sessionize {

  /** One row per (user, session): a session breaks when the gap since
    * the user's previous event exceeds `gapSeconds`. */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_us", unix_micros(col(tsCol)))
      .withColumn("_prev", lag(col("_us"), 1).over(w))
      .withColumn("_new",
        when(col("_prev").isNull ||
          col("_us") - col("_prev") > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("_new")).over(run))
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("sess_start"),
        max(col(tsCol)).as("sess_end"))
  }
}
