package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise-preference models: turn observed head-to-head outcomes into
  * per-item strengths (builder extension; the reference's per-entity
  * aggregations rank items by raw totals — fetch_youtube_data.py:149-198
  * sorts channels by view counts — while a paired model controls for WHO
  * an item was compared against).
  */
object Choice {

  /** Bradley–Terry strengths by minorization–maximization (Hunter 2004):
    * given duel outcomes (winner, loser) rows, iterate
    *   p_i ← W_i / Σ_{j≠i} n_ij / (p_i + p_j),
    * then rescale to Σ p = 1, `iters` times from the uniform start —
    * the maximum-likelihood "skill" under P(i beats j) = p_i/(p_i+p_j).
    * Unlike a raw win count, a win over a strong opponent moves p more
    * than a win over a weak one.
    *
    * Shape: one hash-agg builds the duel matrix; each MM step is a join
    * on the (items² bounded) pair frame against the items-row strength
    * frame, localCheckpointed per step (the fixed-step recursion
    * posture). Determinism: each denominator term n_ij/(p_i+p_j) and
    * each rescale term is 12-dp-rounded onto DECIMAL(28,12) before its
    * order-independent sum, so both engines walk the same trajectory.
    * Items that never win converge to p = 0 (their W_i = 0); an item
    * with no losses at all drives its p toward 1 — both are the true
    * (boundary) MLE direction and stay finite under the rescale.
    * Returns one row per item: item, w (total wins), p_r (6 dp),
    * rnk (by p desc, item asc). */
  def bradleyTerry(duels: DataFrame, winnerCol: String, loserCol: String,
      iters: Int = 10): DataFrame = {
    require(iters >= 1, "need at least one MM iteration")
    def t12(c: org.apache.spark.sql.Column) =
      round(c, 12).cast("decimal(28,12)")
    val w = duels
      .groupBy(col(winnerCol).as("_i"), col(loserCol).as("_j"))
      .agg(count(lit(1)).as("_w"))
      .localCheckpoint() // n matrix + wins + item universe derive from it
    // symmetric game counts n_ij = w_ij + w_ji
    val n = w.select(col("_i"), col("_j"), col("_w"))
      .unionByName(w.select(col("_j").as("_i"), col("_i").as("_j"),
        lit(0L).as("_w")))
      .groupBy(col("_i"), col("_j"))
      .agg(sum(col("_w")).as("_wij"))
    val games = n.select(col("_i"), col("_j"), col("_wij"))
      .join(n.select(col("_j").as("_i"), col("_i").as("_j"),
        col("_wij").as("_wji")), Seq("_i", "_j"))
      .select(col("_i"), col("_j"),
        (col("_wij") + col("_wji")).as("_n"))
      .localCheckpoint() // consumed once per iteration
    val wi = n.groupBy(col("_i")).agg(sum(col("_wij")).as("_wi"))
      .localCheckpoint() // per-iteration numerator + final output
    var p = wi.select(col("_i"), lit(1.0).as("_p"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val denom = games
        .join(broadcast(p.select(col("_i"), col("_p"))), Seq("_i"))
        .join(broadcast(p.select(col("_i").as("_j"),
          col("_p").as("_pj"))), Seq("_j"))
        .groupBy(col("_i"))
        .agg(sum(t12(col("_n").cast("double")
          / (col("_p") + col("_pj")))).cast("double").as("_den"))
      val raw = wi.join(denom, Seq("_i"))
        .select(col("_i"), (col("_wi").cast("double")
          / nullif(col("_den"), lit(0.0))).as("_praw"))
        .select(col("_i"), coalesce(col("_praw"), lit(0.0)).as("_praw"))
      val s = raw.agg(sum(t12(col("_praw"))).cast("double").as("_s"))
      p = raw.crossJoin(broadcast(s))
        .select(col("_i"), (col("_praw") / col("_s")).as("_p"))
        .localCheckpoint() // items rows; next step reads it twice
    }
    p.join(wi, Seq("_i"))
      .select(col("_i").as("item"), col("_wi").as("w"),
        round(col("_p"), 6).as("p_r"))
      .withColumn("rnk", row_number().over(org.apache.spark.sql
        .expressions.Window.orderBy(col("p_r").desc, col("item"))))
  }
}
