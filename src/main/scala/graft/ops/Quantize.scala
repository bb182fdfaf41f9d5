package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization for vector-store compaction: symmetric
  * per-vector int8 quantization (scale = max|x|/127) with reconstruction
  * diagnostics — the 4× storage cut every large ANN deployment takes
  * before the index build, and the natural companion to the ANN surface
  * ([[Similarity]], [[EmbeddingLsh]]).
  *
  * All higher-order-function compositions over the array column
  * (`transform` / `aggregate` / `zip_with`) — per-row, shuffle-free,
  * codegen'd; no explode (the 64-wide vector never becomes 64 rows).
  *
  * Quantization uses `floor(x/scale + 0.5)` rather than `round()` on
  * purpose: round-half semantics differ across engines (HALF_UP vs
  * banker's), while floor(+0.5) is bit-deterministic everywhere — the
  * kind of cross-engine reproducibility a dataset-versioned pipeline
  * needs from its quantizer.
  */
object Quantize {

  private def fold(arr: Column, zero: Column,
      f: (Column, Column) => Column): Column =
    aggregate(arr, zero, f)

  /** Per-vector int8 quantization diagnostics: dimension, scale, the
    * max absolute reconstruction error, and the cosine between the
    * original and reconstructed vector (1.0 for the degenerate all-zero
    * vector). Floats are widened to double BEFORE any arithmetic so the
    * oracle's FLOAT[]→DOUBLE path computes identical values. */
  def int8Diagnostics(df: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val dv = transform(col(vecCol), x => x.cast("double"))
    val scale = fold(dv, lit(0.0), (acc, x) => greatest(acc, abs(x))) / 127.0
    val out = df
      .withColumn("dim", size(col(vecCol)).cast("long"))
      .withColumn("_scale", scale)
      .withColumn("_recon",
        when(col("_scale") === 0.0,
          transform(dv, _ => lit(0.0)))
          .otherwise(transform(dv,
            x => floor(x / col("_scale") + 0.5) * col("_scale"))))
    val v = transform(col(vecCol), x => x.cast("double"))
    val err = fold(zip_with(v, col("_recon"), (a, b) => abs(a - b)),
      lit(0.0), (acc, x) => greatest(acc, x))
    val dot = fold(zip_with(v, col("_recon"), (a, b) => a * b),
      lit(0.0), _ + _)
    val n1 = sqrt(fold(transform(v, x => x * x), lit(0.0), _ + _))
    val n2 = sqrt(fold(transform(col("_recon"), x => x * x),
      lit(0.0), _ + _))
    out
      .withColumn("max_abs_err", round(err, 9))
      .withColumn("cos_recon",
        when(col("_scale") === 0.0, lit(1.0))
          .otherwise(round(dot / (n1 * n2), 9)))
      .select(col(idCol), col("dim"), round(col("_scale"), 9).as("scale"),
        col("max_abs_err"), col("cos_recon"))
  }
}
