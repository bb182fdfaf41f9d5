package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** (id, sp, sv): each vector split into `m` subvectors of `ds` dims,
    * floats widened to double first — the shared decomposition of
    * [[pqEncode]] (codebook + corpus sides) and [[adcTopK]] (codebook +
    * query sides). */
  private def subspaces(in: DataFrame, vecCol: String, id: Column,
      outId: String, m: Int, ds: Int): DataFrame =
    in.select(id.as(outId),
        transform(col(vecCol), x => x.cast("double")).as("_v"))
      .select(col(outId), explode(expr(
        s"transform(sequence(0, ${m - 1}), " +
          s"sp -> struct(sp AS sp, slice(_v, sp * $ds + 1, $ds) AS sv))"))
        .as("_s"))
      .select(col(outId), col("_s.sp").as("sp"), col("_s.sv").as("sv"))

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

  /** Product quantization (PQ) encoding — the codebook compression every
    * billion-vector ANN index runs: split each `dim`-wide vector into `m`
    * subspaces of dim/m, assign each subvector to its nearest codeword
    * (squared L2, ties → lowest code id), and emit the m-byte code plus
    * the total quantization distortion. `centroids` supplies the
    * codebook (one codeword per (centroid row, subspace) — in production
    * the output of per-subspace k-means, here any deterministic seed
    * set; [[graft.ops.Similarity.centroidUpdate]] is the training step).
    *
    * Scale shape: the corpus explodes ×m (bounded, m≈4–16), the codebook
    * is broadcast (m × |codebook| rows), assignment is one
    * broadcast-join + per-(vector, subspace) rank, and the code assembly
    * is one hash-agg back to |corpus| rows. Nothing is pairwise in the
    * corpus. Distances are left-fold sums of exact float→double terms —
    * bit-identical across engines, so the argmin (and therefore the
    * CODE, the part that must never drift) is exact; only the reported
    * distortion is rounded. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centIdCol: String, m: Int,
      dim: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val ds = dim / m
    val corpus = subspaces(df, vecCol, col(idCol), idCol, m, ds)
    val book = broadcast(
      subspaces(centroids, vecCol, col(centIdCol), "cid", m, ds)
        .withColumnRenamed("sv", "cv"))
    val d2 = aggregate(
      zip_with(col("sv"), col("cv"), (a, b) => (a - b) * (a - b)),
      lit(0.0), _ + _)
    val w = Window.partitionBy(col(idCol), col("sp"))
      .orderBy(col("_d2").asc, col("cid").asc)
    corpus.join(book, "sp")
      .withColumn("_d2", d2)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("sp"), col("cid"))).as("_sc"),
        sum(col("_d2")).as("_tot"))
      .select(col(idCol),
        array_join(expr(
          "transform(sort_array(_sc), e -> CAST(e.cid AS STRING))"), ",")
          .as("code"),
        round(sqrt(col("_tot")), 6).as("qerr_r"))
  }

  /** Asymmetric-distance (ADC) top-k search over PQ codes — the SERVE
    * path that makes [[pqEncode]]'s compression useful (Jégou et al.,
    * "Product Quantization for Nearest Neighbor Search", TPAMI 2011):
    * approx L2²(query, doc) = Σ_sp lut(sp, code[sp]) where the lookup
    * table holds the exact distance from the query's sp-th subvector to
    * every codeword. The corpus's full vectors are never touched — only
    * the m-byte codes — which is the whole point at billion-vector
    * scale.
    *
    * Scale shape: the LUT is m × |codebook| rows (a few KB) built from
    * the single-row query frame and broadcast; the corpus side explodes
    * codes ×m (id, sp, cid — narrow ints, no vectors), hash-joins the
    * broadcast LUT, one hash-agg back to |corpus| rows, then a
    * TakeOrdered top-k. No shuffle carries a vector; nothing is
    * pairwise. Ranking ties break by id; distances are per-subspace
    * deterministic left-folds (same contract as [[pqEncode]]), with
    * rounding only on the reported value. */
  def adcTopK(codes: DataFrame, idCol: String, codeCol: String,
      query: DataFrame, centroids: DataFrame, centIdCol: String,
      vecCol: String, m: Int, dim: Int, k: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    require(k > 0, "k must be > 0")
    val ds = dim / m
    val qsub = subspaces(query, vecCol, lit(0L), "_qid", m, ds)
      .select(col("sp"), col("sv").as("qv"))
    val book = subspaces(centroids, vecCol, col(centIdCol), "cid", m, ds)
      .withColumnRenamed("sv", "cv")
    val d2 = fold(zip_with(col("cv"), col("qv"), (a, b) => (a - b) * (a - b)),
      lit(0.0), _ + _)
    val lut = book.join(broadcast(qsub), "sp")
      .select(col("sp"), col("cid"), d2.as("_d2"))
    val exploded = codes
      .select(col(idCol), posexplode(split(col(codeCol), ",")))
      .select(col(idCol), col("pos").as("sp"),
        col("col").cast("long").as("cid"))
    val topk = exploded.join(broadcast(lut), Seq("sp", "cid"))
      .groupBy(col(idCol)).agg(sum(col("_d2")).as("_ad"))
      .orderBy(col("_ad").asc, col(idCol).asc)
      .limit(k)
    // rank window runs over the k surviving rows only (post-TakeOrdered)
    topk
      .withColumn("rank", row_number().over(
        Window.orderBy(col("_ad").asc, col(idCol).asc)).cast("long"))
      .select(col("rank"), col(idCol), round(col("_ad"), 6).as("adist_r"))
      // explicit global sort on the k-row frame: the Verify dump order
      // contract (multi-row ⇒ top-level Sort) must be plan-visible, not
      // an accident of the rank window's internal ordering
      .orderBy(col("rank"))
  }
}
