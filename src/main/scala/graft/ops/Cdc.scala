package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture between table snapshots: classify every key as
  * insert / update / delete / unchanged by comparing an old and a new
  * snapshot. The reference approximates this with a driver-side id-set
  * anti-join that can only see inserts
  * (/root/reference/fetch_youtube_data.py:115-119); a warehouse engine
  * needs the full diff to drive incremental downstream refresh.
  *
  * Scale posture (100 TB): ONE co-partitioned full-outer sort-merge join
  * on the key — both sides shuffle once on the same key (or zero times if
  * the snapshots are bucketed on it, the layout a daily CDC pipeline
  * would use). Column comparison happens post-join with null-safe
  * equality on the value columns themselves — no row-serialization hash,
  * so no cross-engine float-formatting hazard and no false "updates"
  * from formatting drift.
  */
object Cdc {

  /** Diff `oldSnap` → `newSnap` on `keyCol`, comparing `compareCols`.
    * Emits one row per changed key: (key, change_type, old/new value
    * columns); unchanged keys are dropped. change_type ∈
    * {insert, update, delete}.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "snapshotDiff needs compare columns")
    val o = oldSnap.select(keyCol, compareCols: _*).alias("o")
    val n = newSnap.select(keyCol, compareCols: _*).alias("n")
    val joined = o.join(n, col(s"o.$keyCol") === col(s"n.$keyCol"),
      "full_outer")
    val differs = compareCols
      .map(c => !(col(s"o.$c") <=> col(s"n.$c")))
      .reduce(_ || _)
    val changeType = when(col(s"o.$keyCol").isNull, lit("insert"))
      .when(col(s"n.$keyCol").isNull, lit("delete"))
      .when(differs, lit("update"))
    val outCols =
      coalesce(col(s"o.$keyCol"), col(s"n.$keyCol")).as(keyCol) +:
        changeType.as("change_type") +:
        compareCols.flatMap(c =>
          Seq(col(s"o.$c").as(s"old_$c"), col(s"n.$c").as(s"new_$c")))
    joined
      .where(changeType.isNotNull)
      .select(outCols: _*)
  }

  /** Apply a [[snapshotDiff]] back onto the old snapshot:
    * `applyDiff(old, snapshotDiff(old, new)) == new` (the round-trip law
    * PropertiesSpec asserts) — the consumer side of incremental sync: a
    * replica holding `old` reaches `new` from the (much smaller) diff
    * alone. One anti-join on the touched keys + a union of the diff's
    * new-side rows; both shuffle on the key the snapshots are already
    * keyed by.
    */
  def applyDiff(oldSnap: DataFrame, diff: DataFrame, keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    val touched = diff.select(col(keyCol))
    val newRows = diff
      .where(col("change_type").isin("insert", "update"))
      .select(col(keyCol) +: compareCols.map(c => col(s"new_$c").as(c)): _*)
    oldSnap.select(keyCol, compareCols: _*)
      .join(touched, Seq(keyCol), "left_anti")
      .unionByName(newRows)
  }

  /** Incremental aggregate-view maintenance: merge a delta batch's
    * partial (count, sum) state into a materialized rollup WITHOUT
    * recomputing the base table — the algebraic-aggregate identity
    * merge(agg(A), agg(B)) = agg(A ∪ B) that lets a daily 100 TB rollup
    * cost only the day's delta. Both inputs carry (key, n, sum); output
    * is the same shape, so maintenance composes day after day. Shape:
    * one co-partitioned full-outer join on the key (zero shuffles if
    * both states are bucketed on it), null-safe coalesce arithmetic —
    * deletes are handled upstream by feeding a negated delta
    * (count/sum are self-inverting; MIN/MAX are not, which is exactly
    * why this op takes the algebraic pair only). */
  def mergeAggState(state: DataFrame, delta: DataFrame,
      keyCol: String): DataFrame = {
    val s = state.select(col(keyCol), col("n").as("_sn"),
      col("sum").as("_ss"))
    val d = delta.select(col(keyCol), col("n").as("_dn"),
      col("sum").as("_ds"))
    s.join(d, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        (coalesce(col("_sn"), lit(0L)) + coalesce(col("_dn"), lit(0L)))
          .as("n"),
        (coalesce(col("_ss"), lit(0.0)) + coalesce(col("_ds"), lit(0.0)))
          .as("sum"))
  }
}
