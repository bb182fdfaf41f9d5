package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, the most recent right row
  * with `right.ts <= left.ts` within the same key.
  *
  * Spark has no built-in as-of join; the scalable relational form is the
  * union + sorted-window `last(_, ignoreNulls)` pattern: one shuffle on
  * the key, one sort per partition — no range cross-join, no per-key
  * collect. (A tolerance-bounded variant would add a range-join condition;
  * not needed by the engine surface.)
  */
object AsOf {

  /** @param left      probe side
    * @param right     reference side (its `tsCol` must be comparable)
    * @param key       equi-join key column present on both sides
    * @param tsCol     event-time column present on both sides
    * @param rightSeq  deterministic tie-break column on the right side
    *                  (latest wins among equal timestamps)
    * @param pick      right columns to carry, as (rightName -> outName)
    */
  def backward(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      rightSeq: String, pick: Seq[(String, String)]): DataFrame = {
    val lCols = left.columns
    val l = left
      .withColumn("_isRight", lit(0))
      .withColumn("_rpayload",
        lit(null).cast(org.apache.spark.sql.types.StructType(
          pick.map { case (rn, _) =>
            org.apache.spark.sql.types.StructField(rn,
              right.schema(rn).dataType)
          })))
    val r = right
      .select((Seq(col(key), col(tsCol), col(rightSeq)) ++ Seq(
        struct(pick.map { case (rn, _) => col(rn) }: _*).as("_rpayload"))): _*)
      .withColumn("_isRight", lit(1))
    val lAligned = l.select(
      (Seq(col(key), col(tsCol), lit(null).cast(right.schema(rightSeq).dataType)
        .as(rightSeq), col("_rpayload"), col("_isRight")) ++
        lCols.filterNot(c => c == key || c == tsCol).map(c => col(c))): _*)
    val rAligned = r.select(
      (Seq(col(key), col(tsCol), col(rightSeq), col("_rpayload"),
        col("_isRight")) ++
        lCols.filterNot(c => c == key || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    // right rows sort before left rows at equal ts (desc on _isRight), so a
    // same-instant reference is visible to the probe (<= semantics); among
    // equal-ts right rows the greatest rightSeq wins (last in order).
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol).asc, col("_isRight").desc, col(rightSeq).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = lAligned.unionByName(rAligned)
      .withColumn("_asof",
        last(when(col("_isRight") === 1, col("_rpayload")), ignoreNulls = true)
          .over(w))
    carried.filter(col("_isRight") === 0)
      .select(lCols.toIndexedSeq.map(col) ++
        pick.map { case (rn, out) => col(s"_asof.$rn").as(out) }: _*)
  }
}
