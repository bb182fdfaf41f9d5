package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sample packing for LLM training shards: assign documents, in a stable
  * global order, to fixed token-budget shards by cumulative offset — the
  * concatenate-and-slice layout (each document's shard is where its
  * START offset lands). Semantically a global exclusive prefix sum.
  *
  * Scale posture (100 TB): a naive `Window.orderBy(id)` with no
  * partition key is a single-task sort — the canonical scale-killer. This
  * implements the textbook two-level distributed prefix sum instead:
  * rows group into coarse id-range buckets; per-bucket totals (one small
  * agg) get exclusive bucket offsets via a window over the TINY bucket
  * table (|buckets| = n / bucketSize rows — executor-side, bounded, and
  * broadcast back); the intra-bucket running sum is a window partitioned
  * BY BUCKET, so every task sorts only its own bucket. Choose
  * `bucketSize` so |buckets| stays broadcastable (1e6 rows/bucket → 1e8
  * buckets only at 10^14 docs; recurse the same trick if you ever get
  * there).
  */
object Pack {

  /** Pack rows into shards of `budget` total weight. `idCol` must be a
    * numeric, unique, stable ordering key; `weightCol` integral. Emits
    * the input columns + start_offset (exclusive prefix sum of weight in
    * id order) + shard_id (= start_offset div budget).
    */
  def packByBudget(df: DataFrame, idCol: String, weightCol: String,
      budget: Long, bucketSize: Long = 1L << 20): DataFrame = {
    require(budget > 0 && bucketSize > 0, "budget and bucketSize must be > 0")
    val withBucket = df.withColumn("_bucket",
      floor(col(idCol) / bucketSize).cast("long"))
    // level 1: per-bucket totals → exclusive bucket offsets. The window
    // runs over the bucket TABLE (tiny), not the data.
    val bucketTotals = withBucket.groupBy("_bucket")
      .agg(sum(col(weightCol)).as("_bw"))
    val wB = Window.orderBy("_bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bucketOffsets = bucketTotals
      .withColumn("_boff", sum(col("_bw")).over(wB) - col("_bw"))
      .drop("_bw")
    // level 2: intra-bucket exclusive running sum, tasks sort only their
    // own bucket; bucket offsets come in broadcast.
    val wIn = Window.partitionBy("_bucket").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withBucket
      .join(broadcast(bucketOffsets), Seq("_bucket"))
      .withColumn("start_offset",
        col("_boff") + sum(col(weightCol)).over(wIn) - col(weightCol))
      .withColumn("shard_id",
        floor(col("start_offset") / budget).cast("long"))
      .drop("_bucket", "_boff")
  }

  /** Length-bucketed fixed-size batch construction — the padding-
    * efficiency layout for PADDED training/inference batching (the
    * complement of [[packByBudget]]'s concatenate-and-slice): rows are
    * banded by weight (`bucket` = weight div bucketWidth) so one batch
    * holds near-equal lengths, then cut into batches of `batchSize` in
    * id order within each band. Per batch it reports the padding waste,
    * n_docs·max − Σweight — the number the layout exists to minimize
    * (batching random lengths pads every row to the global max).
    *
    * Scale shape: the global per-bucket row numbering uses the same
    * two-level trick as [[packByBudget]] — counts per (bucket, id-range)
    * give exclusive range offsets via a window over the tiny
    * (bucket × range) table, broadcast back; the per-row row_number
    * window partitions by (bucket, range), so no task ever sorts more
    * than one id-range of one bucket — a skewed length distribution
    * (most docs in one band) cannot produce a giant sort task. */
  def lengthBucketBatches(df: DataFrame, idCol: String, weightCol: String,
      bucketWidth: Long, batchSize: Int,
      rangeSize: Long = 1L << 20): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0 && rangeSize > 0,
      "bucketWidth, batchSize and rangeSize must be > 0")
    val withB = df.select(col(idCol), col(weightCol))
      .withColumn("bucket",
        floor(col(weightCol) / bucketWidth).cast("long"))
      .withColumn("_rng", floor(col(idCol) / rangeSize).cast("long"))
    val wR = Window.partitionBy("bucket").orderBy("_rng")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = withB.groupBy("bucket", "_rng")
      .agg(count(lit(1)).as("_rc"))
      .withColumn("_off", sum(col("_rc")).over(wR) - col("_rc"))
      .drop("_rc")
    val wL = Window.partitionBy("bucket", "_rng").orderBy(idCol)
    withB
      .join(broadcast(offsets), Seq("bucket", "_rng"))
      .withColumn("_rn", col("_off") + row_number().over(wL) - 1)
      .withColumn("batch_idx", floor(col("_rn") / batchSize).cast("long"))
      .groupBy(col("bucket"), col("batch_idx"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(weightCol)).cast("long").as("sum_tokens"),
        max(col(weightCol)).cast("long").as("max_tokens"))
      .withColumn("padding",
        (col("n_docs") * col("max_tokens") - col("sum_tokens"))
          .cast("long"))
  }

  /** Weighted rendezvous (highest-random-weight) shard assignment
    * (Thaler & Ravishankar, "Using Name-Based Mappings to Increase Hit
    * Rates", IEEE/ACM ToN 6(1), 1998): each row goes to the shard whose
    * hash it scores highest, integer weights expressed as virtual nodes
    * (shard s with weight w contributes w candidate hashes). The point
    * vs `hash(id) % n`: adding or removing ONE shard only moves the rows
    * that land on (or must leave) that shard — every other row keeps its
    * placement, because its winning (shard, vnode) hash is unchanged.
    * That minimal-disruption property is what makes resharding a 100 TB
    * corpus an incremental copy instead of a full rewrite.
    *
    * Purely md5-deterministic (same hash family as [[graft.ops.Curation]]
    * sampling): reproducible across engines, runs, and retries. Ties
    * (≈2^-60) break by the max (shard, vnode) pair, still deterministic.
    *
    * Scale shape: the virtual-node table (Σ weights rows) enters by
    * broadcast; scoring is a codegen'd projection and the argmax is one
    * groupBy(id).max(struct) with map-side partials — no shuffle wider
    * than the id agg, no window. */
  def rendezvousAssign(df: DataFrame, idCol: String,
      shards: Seq[(String, Int)]): DataFrame = {
    require(shards.nonEmpty && shards.forall(_._2 > 0),
      "need at least one shard, all weights > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val vnodes = shards.flatMap { case (s, w) => (0 until w).map(s -> _) }
      .toDF("shard", "v")
    df.crossJoin(broadcast(vnodes))
      .withColumn("_h", conv(substring(md5(concat_ws("#",
        col(idCol).cast("string"), col("shard"), col("v").cast("string"))),
        1, 15), 16, 10).cast("long"))
      .groupBy(col(idCol))
      .agg(max(struct(col("_h"), col("shard"), col("v"))).as("_m"))
      .select(col(idCol), col("_m.shard").as("shard"))
  }
}
