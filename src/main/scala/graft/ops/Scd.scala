package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) history builder: turns an
  * append-only change log into versioned dimension rows with
  * `valid_from` / `valid_to` / `is_current` / `version`. The reference
  * pipeline overwrites or appends raw rows and keeps no history
  * (/root/reference/fetch_youtube_data.py:150-160, 190-200); SCD2 is
  * the warehouse-native answer to "what did this row look like when the
  * model was trained" — the lineage question every reproducible
  * training-data pipeline eventually asks.
  *
  * Scale posture (100 TB): ONE hash shuffle on the entity key. Both
  * windows (the change-compression lag and the validity lead) share the
  * same `partitionBy(key)` exchange, so Catalyst plans a single
  * Exchange + Sort with two Window operators over it — no second
  * shuffle, no self-join. Memory per task is one entity's change run,
  * which is bounded by per-key history length, not table size.
  */
object Scd {

  /** Builds the Type-2 history of `attrCols` from a change log.
    *
    * Rows are ordered per `keyCol` by (`tsCol`, `tieCol`) — the tie
    * column makes the ordering total so ties on the change timestamp are
    * deterministic. Consecutive rows whose attributes are null-safely
    * equal are compressed away (re-stating the same value is not a new
    * version). Each surviving row becomes a version valid from its own
    * timestamp until the next version's (`valid_to` null = open-ended =
    * `is_current`).
    */
  def scd2(changes: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "scd2 needs at least one tracked attribute")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    // lag of the tie column marks the first row per key (tie is non-null
    // by contract — it is an ordering column); attribute lags feed the
    // null-safe change test
    val withPrev = attrCols.foldLeft(
      changes.withColumn("_prev_tie", lag(col(tieCol), 1).over(w))) {
      (df, a) => df.withColumn(s"_prev_$a", lag(col(a), 1).over(w))
    }
    val changed: Column = attrCols
      .map(a => !(col(a) <=> col(s"_prev_$a")))
      .reduce(_ || _)
    val kept = withPrev
      .withColumn("_keep", col("_prev_tie").isNull || changed)
      .where(col("_keep"))
    // validity windows over the compressed rows — same key partitioning,
    // so the exchange is reused; only the sort re-runs
    val wk = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    kept
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(wk))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumn("version", row_number().over(wk).cast("long"))
      .select(keyCol +: attrCols :+ "valid_from" :+ "valid_to" :+
        "is_current" :+ "version" map col: _*)
  }

  /** Point-in-time (PIT) join: each probe row picks up the [[scd2]]
    * dimension version that was valid AT its own timestamp —
    * valid_from ≤ ts < valid_to (open current row matches everything
    * after its valid_from). THE temporal-warehouse join: "what was this
    * customer's segment when the order was placed", with no
    * leakage-from-the-future, which a plain join to the current row
    * silently commits.
    *
    * Shape: equi-join on the key, then the validity range as a post-join
    * filter — per-key history is small by construction (scd2 compressed
    * consecutive duplicates), so the fan-out before the filter is
    * |probe|·|versions per key|, not a range-join blowup; probes whose
    * ts precedes the first version drop (inner semantics). */
  def pitJoin(probes: DataFrame, dim: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    probes.join(dim, Seq(keyCol))
      .where(col("valid_from") <= col(tsCol) &&
        (col("valid_to").isNull || col(tsCol) < col("valid_to")))
  }
}
