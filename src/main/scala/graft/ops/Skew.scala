package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join utilities (SURVEY.md §4 engine posture).
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) handles most runtime skew; this manual salting form is for the
  * planned-skew case — a known hot key joined against a replicable side —
  * where it guarantees fan-out regardless of runtime statistics:
  *
  *  - the BIG side gets a deterministic salt in [0, salts) derived from a
  *    hash of the whole row (uniform, reproducible — no rand(), which
  *    would break retry/replay semantics of recomputed tasks);
  *  - the SMALL side is replicated `salts` times;
  *  - the join key becomes (key, salt), splitting each hot key's rows
  *    across `salts` reducers.
  *
  * Result is row-identical to the plain equi-join.
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0)
    val bigSalted = big.withColumn("_salt",
      pmod(hash(struct(big.columns.toIndexedSeq.map(col): _*)), lit(salts)))
    val smallExploded = small.withColumn("_salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    bigSalted.join(smallExploded, Seq(key, "_salt")).drop("_salt")
  }

  /** Join-cardinality audit WITHOUT executing the join: per key,
    * |A⋈B| contributes n_a·n_b rows, so aggregating both sides to
    * per-key counts and multiplying predicts the exact output size and
    * exposes the hot keys that would dominate it — the pre-flight check
    * that decides between a plain shuffle join, [[saltedJoin]], and an
    * AQE skew split BEFORE burning a cluster on a join that explodes.
    * Emits the top-k keys by contribution with their share of the total.
    *
    * Shape: two hash-aggs (each side reduced to |keys| rows), one
    * co-partitioned key join of those count tables, and windows (rank +
    * total) over the |keys|-row result — corpus-size work is exactly
    * two scans. */
  def joinCardinalityAudit(a: DataFrame, b: DataFrame, keyCol: String,
      topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ca = a.groupBy(col(keyCol)).agg(count(lit(1)).as("n_a"))
    val cb = b.groupBy(col(keyCol)).agg(count(lit(1)).as("n_b"))
    val contrib = ca.join(cb, Seq(keyCol))
      .withColumn("contrib", col("n_a") * col("n_b"))
    val wAll = Window.partitionBy()
    val wRank = Window.orderBy(col("contrib").desc, col(keyCol))
    contrib
      .withColumn("_tot", sum(col("contrib")).over(wAll))
      .withColumn("rank", row_number().over(wRank))
      .where(col("rank") <= topK)
      .select(col("rank"), col(keyCol), col("n_a"), col("n_b"),
        col("contrib"), round(col("contrib") / col("_tot"), 6).as("share_r"))
  }
}
