package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bitmap-index distinct counting — the roaring-bitmap trick in its
  * relational form. When the id domain is dense and bounded (user ids,
  * device ids, dictionary-encoded keys), an EXACT distinct count never
  * needs a distinct at all: pack ids into 64-bit words
  * (word = id / 64, bit = id mod 64), `bit_or` the words per group, and
  * sum the popcounts.
  *
  * Why this matters at 100 TB: `count(DISTINCT id)` either plans an
  * Expand (2× rows through the shuffle) or a two-phase distinct whose
  * exchange carries every distinct (group, id) pair. The bitmap agg's
  * exchange carries at most |groups| × ⌈domain/64⌉ WORDS — independent
  * of row count — and both aggregations are plain map-side-combinable
  * `bit_or`/`sum` (bit_or is idempotent, so re-aggregation under AQE
  * retries/spills is safe). This is exact, unlike HLL (q20), and
  * narrower than distinct whenever rows ≫ domain — the fact-table
  * regime. All codegen builtins: shiftleft / bit_or / bit_count.
  */
object Bitmaps {

  /** (key, n_distinct): exact distinct `idCol` per `keyCol` via 64-bit
    * word packing. Ids must be non-negative integers. */
  def bitmapDistinct(df: DataFrame, keyCol: String,
      idCol: String): DataFrame = {
    df.select(col(keyCol),
        expr(s"CAST($idCol AS LONG) div 64").as("_w"),
        expr(s"shiftleft(1L, CAST($idCol % 64 AS INT))").as("_b"))
      .groupBy(col(keyCol), col("_w"))
      .agg(expr("bit_or(_b)").as("_bits"))
      .groupBy(col(keyCol))
      .agg(sum(bit_count(col("_bits"))).cast("long").as("n_distinct"))
  }
}
