package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Round-12 clustering-structure batch: grid-density clustering (the
  * DBSCAN shape that scales — density on a bounded cell grid, then
  * connected components over adjacent dense cells) and the
  * Calinski–Harabasz cluster-validity index.
  *
  * Scale shape: the data-sized stage is ONE hash agg to the cell /
  * label grid; everything after runs on the bounded grid. Components
  * reuse [[Dedup.nearDupComponents]] (union-find, distributed
  * fixpoint fallback). */
object Cluster {

  private def t12(c: Column) = round(c, 12).cast("decimal(28,12)")

  /** DBSCAN-lite on two embedding dims: cells of side `h`, dense =
    * ≥ `minPts` points, clusters = connected components of
    * 8-adjacent dense cells. Cell ids are (cx+500)·100000 + (cy+500)
    * (callers keep |coord/h| < 500). Returns one row per cluster
    * ordered by label: (cluster_label, n_cells, n_points). */
  def gridDensityClusters(points: DataFrame, xCol: String, yCol: String,
      h: Double, minPts: Long): DataFrame = {
    require(h > 0 && minPts >= 1)
    val s = points.sparkSession
    val cells = points.select(
        floor(col(xCol).cast("double") / h).cast("long").as("_cx"),
        floor(col(yCol).cast("double") / h).cast("long").as("_cy"))
      .groupBy(col("_cx"), col("_cy")).agg(count(lit(1)).as("_n"))
    val dense = cells.where(col("_n") >= minPts)
      .withColumn("_cell",
        (col("_cx") + 500L) * 100000L + (col("_cy") + 500L))
      .localCheckpoint()
    import s.implicits._
    val offs = (for (dx <- -1 to 1; dy <- -1 to 1
      if dx != 0 || dy != 0) yield (dx.toLong, dy.toLong))
      .toDF("_dx", "_dy")
    val nb = dense.crossJoin(broadcast(offs))
      .select((col("_cx") + col("_dx")).as("_cx"),
        (col("_cy") + col("_dy")).as("_cy"),
        col("_cell").as("_cellA"))
    val pairs = nb.join(dense.select(col("_cx"), col("_cy"),
        col("_cell").as("_cellB")), Seq("_cx", "_cy"))
      .where(col("_cellA") < col("_cellB"))
      .select(col("_cellA").as("doc_a"), col("_cellB").as("doc_b"))
    val comps = Dedup.nearDupComponents(pairs)
    // singleton dense cells (no dense neighbor) label themselves
    val labeled = dense.join(comps.withColumnRenamed("node", "_cell"),
        Seq("_cell"), "left")
      .select(col("_cell"), col("_n"),
        coalesce(col("label"), col("_cell")).as("_lab"))
    labeled.groupBy(col("_lab").as("cluster_label"))
      .agg(count(lit(1)).as("n_cells"), sum(col("_n")).as("n_points"))
      .orderBy(col("cluster_label"))
  }

  /** Calinski–Harabasz index on two dims with given integer labels:
    * CH = (B/(k−1)) / (W/(n−k)) with W the pooled within-cluster and
    * B the between-cluster sum of squares, both from one pass of
    * 12-dp-gridded per-label moment sums (coordinates are O(1)
    * embedding values). Returns one row:
    * (n, k_clusters, w_r, b_r, ch_r). */
  def calinskiHarabasz(points: DataFrame, labelCol: String,
      xCol: String, yCol: String): DataFrame = {
    val g = points.select(col(labelCol).as("_l"),
      col(xCol).cast("double").as("_x"),
      col(yCol).cast("double").as("_y"))
    val per = g.groupBy(col("_l")).agg(count(lit(1)).as("_n"),
      sum(t12(col("_x"))).cast("double").as("_sx"),
      sum(t12(col("_y"))).cast("double").as("_sy"),
      sum(t12(col("_x") * col("_x"))).cast("double").as("_sxx"),
      sum(t12(col("_y") * col("_y"))).cast("double").as("_syy"))
    val tot = per.agg(sum(col("_n")).cast("double").as("_nn"),
      count(lit(1)).cast("double").as("_k"),
      sum(t12(col("_sx"))).cast("double").as("_tx"),
      sum(t12(col("_sy"))).cast("double").as("_ty"))
    val nD = col("_n").cast("double")
    val w = per.agg(
      sum(t12((col("_sxx") - col("_sx") * col("_sx") / nD)
        + (col("_syy") - col("_sy") * col("_sy") / nD)))
        .cast("double").as("_w"))
    val b = per.crossJoin(broadcast(tot))
      .agg(sum(t12(nD
        * ((col("_sx") / nD - col("_tx") / col("_nn"))
          * (col("_sx") / nD - col("_tx") / col("_nn"))
        + (col("_sy") / nD - col("_ty") / col("_nn"))
          * (col("_sy") / nD - col("_ty") / col("_nn")))))
        .cast("double").as("_b"),
        first(col("_nn")).as("_nn"), first(col("_k")).as("_k"))
    b.crossJoin(broadcast(w)).select(
      col("_nn").cast("long").as("n"),
      col("_k").cast("long").as("k_clusters"),
      round(col("_w"), 6).as("w_r"), round(col("_b"), 6).as("b_r"),
      round((col("_b") / nullif(col("_k") - lit(1.0), lit(0.0)))
        / nullif(col("_w") / nullif(col("_nn") - col("_k"), lit(0.0)),
          lit(0.0)), 6).as("ch_r"))
  }
}
