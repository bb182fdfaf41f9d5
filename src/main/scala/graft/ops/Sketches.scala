package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms
  * 2005) — the fixed-size frequency summary a 100 TB pipeline keeps when
  * the key domain is too large for an exact count table: d×w counters
  * (d ≈ ln 1/δ rows, w ≈ e/ε columns) answer point frequency queries
  * with one-sided error — est ≥ true always, est ≤ true + εN with
  * probability 1−δ. Counters are ADDITIVE, so the sketch is mergeable:
  * the sketch of a union is the cell-wise sum of the parts' sketches,
  * which is exactly what a map-side-combined `groupBy(row, pos).sum`
  * computes — partial aggregation IS the merge, no special-case code.
  *
  * Built relationally, same convention as [[Bloom]]: positions are
  * md5-derived (`hash60(key || '#' || j) mod w`, reproducible in any
  * engine with md5), the sketch is a (row_j, pos, cnt) table of at most
  * d·w rows — broadcastable by construction — and the probe is a
  * broadcast left join + `min` over the d cells (a missing cell means
  * count 0). Complements [[Heavy.heavyHitters]] (exact two-pass
  * Misra-Gries) on the approximate side: CMS answers ANY point query
  * from constant state, not just the >φN survivors.
  */
object Sketches {

  private def cell(key: Column, j: Int, width: Int): Column =
    struct(lit(j).as("row_j"),
      pmod(TextOps.hash60(concat(key.cast("string"), lit("#"), lit(j))),
        lit(width.toLong)).as("pos"))

  /** Build the (row_j, pos, cnt) sketch over `keyCol`: each input ROW
    * increments one counter per sketch row. Output ≤ depth·width rows.
    * Additive counters → safe under AQE retries' re-aggregation and
    * mergeable across partial builds by cell-wise sum. */
  def cmsBuild(df: DataFrame, keyCol: String, depth: Int,
      width: Int): DataFrame = {
    require(depth > 0 && width > 0, "depth and width must be > 0")
    val cells = (0 until depth).map(j => cell(col(keyCol), j, width))
    df.select(explode(array(cells: _*)).as("_c"))
      .groupBy(col("_c.row_j").as("row_j"), col("_c.pos").as("pos"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query every row of `probe`: append `est` = min over the d
    * cells the key hashes to (missing cell → 0). The sketch joins
    * broadcast — the probe side never shuffles. One-sided by
    * construction: every occurrence of the key incremented all d of its
    * cells, so no cell can undercount it. */
  def cmsEstimate(probe: DataFrame, keyCol: String, sketch: DataFrame,
      depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, "depth and width must be > 0")
    val cells = (0 until depth).map(j => cell(col(keyCol), j, width))
    val est = probe
      .select(col(keyCol), explode(array(cells: _*)).as("_c"))
      .select(col(keyCol), col("_c.row_j").as("row_j"),
        col("_c.pos").as("pos"))
      .join(broadcast(sketch), Seq("row_j", "pos"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
    probe.join(est, Seq(keyCol))
  }
}
