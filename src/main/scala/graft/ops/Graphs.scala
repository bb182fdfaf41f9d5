package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational graph analytics: co-occurrence edge extraction and triangle
  * counting, expressed as plain joins so Catalyst owns the distribution.
  * Complements [[Dedup.nearDupComponents]] (connected components) on the
  * graph side of the engine.
  *
  * Scale posture (100 TB): the edge list is oriented (src < dst), so each
  * undirected edge exists once and every triangle is enumerated exactly
  * once as (a<b<c) — no post-hoc dedup of 6 permutations. Triangle
  * counting is the standard two-join plan: wedges = E ⋈ E on the shared
  * middle vertex, closed by a semi-check against E. Cost is
  * Σ deg(v)² for the wedge build — the support threshold in
  * [[coOccurrenceEdges]] is the knob that keeps hub degrees (and the
  * wedge blow-up) bounded; production graphs additionally orient by
  * degree (compact-forward) which this representation permits without a
  * plan change.
  */
object Graphs {

  /** Undirected co-occurrence edges: items sharing a group, oriented
    * src < dst, keeping edges seen in at least `minSupport` groups. One
    * self-join co-partitioned on the group key + one edge rollup. */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    val items = df.select(col(groupCol).as("_g"), col(itemCol).as("_i"))
      .distinct()
    val a = items.alias("a")
    val b = items.alias("b")
    a.join(b, col("a._g") === col("b._g") && col("a._i") < col("b._i"))
      .groupBy(col("a._i").as("src"), col("b._i").as("dst"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
  }

  /** Per-vertex triangle counts over an oriented edge list (src < dst).
    * Returns (vertex, n_triangles) for vertices in ≥1 triangle. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e1 = edges.select(col("src").as("a"), col("dst").as("b"))
    val e2 = edges.select(col("src").as("b2"), col("dst").as("c"))
    val e3 = edges.select(col("src").as("a3"), col("dst").as("c3"))
    // wedges a<b<c with edges (a,b),(b,c); closed iff (a,c) is an edge
    val triangles = e1
      .join(e2, col("b") === col("b2"))
      .join(e3, col("a") === col("a3") && col("c") === col("c3"), "left_semi")
      .select(col("a"), col("b"), col("c"))
    triangles
      .select(explode(array(col("a"), col("b"), col("c"))).as("vertex"))
      .groupBy("vertex")
      .agg(count(lit(1)).as("n_triangles"))
  }
}
