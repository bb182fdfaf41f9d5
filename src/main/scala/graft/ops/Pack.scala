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
}
