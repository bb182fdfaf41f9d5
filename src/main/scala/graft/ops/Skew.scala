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

  /** Lorenz decile table: rank keys by their value total (the banded
    * two-level rank — never a corpus-sized window), split into exact
    * SQL-ntile deciles, and report each decile's share and cumulative
    * share of the grand total — the curve behind a scalar Gini
    * (q162/q286's readout made distributional). All integers until
    * the two final share divisions. Returns 10 rows: decile, n_keys,
    * total, share_r, cum_share_r. */
  def lorenzDeciles(df: DataFrame, keyCol: String, valueCol: String,
      bandWidth: Double = 100000.0): DataFrame = {
    val keyed = df.groupBy(col(keyCol).as("_k"))
      .agg(sum(col(valueCol)).as("_v"))
    val ranked = Ranks.bandedRank(keyed.withColumn("_g", lit(0)),
      "_g", "_v", "_k", bandWidth)
    val n = ranked.agg(count(lit(1)).as("_n"))
    val dec = ranked.crossJoin(broadcast(n))
      .withColumn("decile",
        Ranks.ntileFromRank(col("rnk").cast("double"),
          col("_n").cast("double"), 10))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_keys"), sum(col("_v")).as("total"))
    val g = dec.agg(sum(col("total")).as("_gt"))
    // literal Window.orderBy form — the WindowGrainSpec pin scans
    // per-line (the r11 convention); the 10-row decile grid is bounded
    val wCum = org.apache.spark.sql.expressions.Window.orderBy(
      col("decile")).rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    dec.crossJoin(broadcast(g))
      .withColumn("_cum", sum(col("total")).over(wCum))
      .select(col("decile"), col("n_keys"), col("total"),
        round(col("total").cast("double") / col("_gt").cast("double"),
          6).as("share_r"),
        round(col("_cum").cast("double") / col("_gt").cast("double"),
          6).as("cum_share_r"))
      .orderBy("decile")
  }

  /** Lorenz asymmetry coefficient (Damgaard & Weiner 2000):
    * S = F(mu) + L(mu), where F(mu) = share of units strictly below
    * the mean and L(mu) = share of total mass they hold -- WHERE on
    * the Lorenz curve the slope-1 point sits. S < 1: inequality is
    * driven by many small units; S > 1: by a few giants -- the
    * directional reading [[lorenzDeciles]]' Gini (a magnitude)
    * cannot give. Amounts enter as exact integer cents; below-mean is
    * the EXACT integer predicate n*x < total (no float mean), and the
    * boundary convention (ties at the mean count as below neither
    * share) is documented rather than interpolated. Returns one row:
    * n, n_below, f_mu_r, l_mu_r, s_r. */
  def lorenzAsymmetry(df: DataFrame, amountCol: String): DataFrame = {
    val cents = df
      .select(expr(s"cast(round($amountCol * 100) as bigint)").as("_c"))
      .filter(col("_c") > 0)
      .localCheckpoint()
    val tot = cents.agg(count(lit(1)).as("n"),
      sum(col("_c")).as("_tot"))
    cents.crossJoin(broadcast(tot))
      .groupBy(col("n"), col("_tot"))
      .agg(sum(when(col("_c") * col("n") < col("_tot"), 1L)
          .otherwise(0L)).as("n_below"),
        coalesce(sum(when(col("_c") * col("n") < col("_tot"),
          col("_c"))), lit(0L)).as("_below_mass"))
      .select(col("n"), col("n_below"),
        round(col("n_below").cast("double") / col("n").cast("double"),
          6).as("f_mu_r"),
        round(col("_below_mass").cast("double")
          / col("_tot").cast("double"), 6).as("l_mu_r"),
        round(col("n_below").cast("double") / col("n").cast("double")
          + col("_below_mass").cast("double")
            / col("_tot").cast("double"), 6).as("s_r"))
  }
}
