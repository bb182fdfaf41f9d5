package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline (Pareto frontier) queries — the classic OLAP operator Spark
  * has no builtin for: the rows not DOMINATED by any other row, where
  * "dominated" means another row is at-least-as-good on both criteria
  * and strictly better on one. The naive formulation is a NOT EXISTS
  * self-join (O(n²)); for the ubiquitous 2-D case there is a
  * sort-free-of-self-joins shape:
  *
  *   maximize y, minimize x  ⇒  a point is on the frontier iff its y
  *   is strictly greater than every y at a strictly smaller x.
  *
  * So: collapse to the best y per x (one hash-agg), then compare with
  * the running max of y over x ascending (one window on the same key
  * exchange). Total cost: 2 narrow passes over |distinct x| rows after
  * the per-x rollup — linear, per group, deterministic.
  */
object Skyline {

  /** Per-group 2-D frontier: minimize `xCol`, maximize `yCol`. Output:
    * (group, x, y) frontier points, one row per frontier x. */
  def frontier2D(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val bestY = df.groupBy(col(groupCol), col(xCol))
      .agg(max(col(yCol)).as("_y"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(xCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    bestY
      .withColumn("_prevMax", max(col("_y")).over(w))
      // first x (null prevMax) is always on the frontier
      .filter(col("_prevMax").isNull || col("_y") > col("_prevMax"))
      .select(col(groupCol), col(xCol), col("_y").as(yCol))
  }
}
