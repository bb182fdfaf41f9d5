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

  /** Per-EVENT session assignment: every input row plus its
    * `session_idx` (1-based per user). The building block [[sessions]]
    * aggregates and path/sequence analyses consume row-wise; both share
    * the one-exchange shape (lag + running sum on the same user
    * partitioning). */
  def assignSessions(events: DataFrame, userCol: String, tsCol: String,
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
      .drop("_us", "_prev", "_new")
  }

  /** One row per (user, session): a session breaks when the gap since
    * the user's previous event exceeds `gapSeconds`. */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapSeconds: Long): DataFrame = {
    assignSessions(events, userCol, tsCol, idCol, gapSeconds)
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("sess_start"),
        max(col(tsCol)).as("sess_end"))
  }

  /** Top-k within-session event-type n-grams — the "what do users DO"
    * sequence-mining view (path trigrams are the standard behavioral
    * fingerprint; at training-data scale the same shape mines action
    * sequences from interaction logs). Composition: [[assignSessions]]
    * (one user-keyed exchange) → per-session ordered type sequence via
    * sort_array(collect_list(struct(ts, id, type))) — the struct sort
    * makes the order total and deterministic under parallel collection —
    * → row-local n-grams (Dedup.kGramExpr, instances kept) → one
    * gram-keyed count agg → global top-k (TakeOrdered, no full sort).
    * The per-session sequence fits comfortably in a row (sessions are
    * gap-bounded); nothing quadratic anywhere. */
  def sessionPathNGrams(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, gapSeconds: Long, n: Int,
      topK: Int): DataFrame = {
    val assigned = assignSessions(events, userCol, tsCol, idCol, gapSeconds)
    val seqs = assigned
      .groupBy(col(userCol), col("session_idx"))
      .agg(sort_array(collect_list(
        struct(col(tsCol), col(idCol), col(typeCol).as("_t")))).as("_evs"))
      .select(expr("transform(_evs, e -> e._t)").as("_toks"))
    seqs
      .select(explode(expr(Dedup.kGramExpr("_toks", n, distinct = false)))
        .as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram").asc)
      .limit(topK)
  }
}
