package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial autocorrelation over a 2-D cell lattice — the classic
  * geostatistics battery (Moran's I, Geary's C, join counts, the
  * Getis–Ord General G, local Moran LISA) applied to an embedding
  * projection: bin two embedding dims into cells of side `h`
  * ([[Cluster.gridDensityCells]]'s binning), zero-fill the bounding
  * box into a complete lattice, and measure whether cell COUNTS
  * cluster in space — "is this corpus's embedding mass spatially
  * clumped beyond chance" is the density-drift audit a curation
  * pipeline runs next to q456's density clusters (which find WHERE the
  * clumps are; these score HOW clumped the field is overall).
  *
  * Scale posture: ONE data-sized hash-agg to occupied cells; the
  * lattice is coordinate-bounded (|coord| ≤ 1 for normalized
  * embeddings ⇒ ≤ (2/h)² cells at ANY corpus size), so everything
  * after the first agg is grid arithmetic on a bounded frame — the
  * [[Contingency]] posture. Rook adjacency comes from a 4-offset
  * broadcast self-join of the lattice, never a pair scan.
  *
  * Determinism: every statistic is EXACT INTEGERS to the end — with
  * d_i = n·x_i − S (n lattice cells, S total count), all numerators
  * and denominators are integer sums of integer products, and the one
  * float op per query is the final division (shared verbatim with the
  * oracle). No transcendentals anywhere.
  */
object Spatial {

  /** The shared trunk: the zero-filled bounding-box lattice of cell
    * counts. Returns (_cx, _cy, _x) with one row per lattice cell. */
  private[ops] def lattice(points: DataFrame, xCol: String, yCol: String,
      h: Double): DataFrame = {
    require(h > 0)
    val occ = points.select(
        floor(col(xCol).cast("double") / h).cast("long").as("_cx"),
        floor(col(yCol).cast("double") / h).cast("long").as("_cy"))
      .groupBy(col("_cx"), col("_cy")).agg(count(lit(1)).as("_m"))
    val b = occ.agg(min(col("_cx")).as("_x0"), max(col("_cx")).as("_x1"),
      min(col("_cy")).as("_y0"), max(col("_cy")).as("_y1"))
    val grid = broadcast(b)
      .select(explode(sequence(col("_x0"), col("_x1"))).as("_cx"),
        col("_y0"), col("_y1"))
      .select(col("_cx"),
        explode(sequence(col("_y0"), col("_y1"))).as("_cy"))
    grid.join(occ, Seq("_cx", "_cy"), "left")
      .select(col("_cx"), col("_cy"),
        coalesce(col("_m"), lit(0L)).as("_x"))
  }

  /** Lattice + totals: (_cx, _cy, _x, _n cells, _s total count, _q2
    * Σx², _d = n·x − S as decimal). */
  private def latticeD(points: DataFrame, xCol: String, yCol: String,
      h: Double): DataFrame = {
    val lat = lattice(points, xCol, yCol, h).localCheckpoint()
    val tot = lat.agg(count(lit(1)).as("_n"), sum(col("_x")).as("_s"),
      sum(col("_x") * col("_x")).as("_q2"))
    lat.crossJoin(broadcast(tot))
      .withColumn("_d", (col("_n") * col("_x") - col("_s"))
        .cast("decimal(38,0)"))
  }

  /** Directed rook-adjacent pairs of lattice cells: each unordered
    * neighbor pair appears TWICE (once per direction), the convention
    * under which Σ_ij w_ij f(i,j) is a plain sum over these rows.
    * Emits (_x, _d) for cell i and (_xb, _db) for its neighbor j. */
  private def rookPairs(cells: DataFrame): DataFrame = {
    val s = cells.sparkSession
    import s.implicits._
    val offs = Seq((-1L, 0L), (1L, 0L), (0L, -1L), (0L, 1L))
      .toDF("_dx", "_dy")
    val shifted = cells.crossJoin(broadcast(offs))
      .select((col("_cx") + col("_dx")).as("_cx"),
        (col("_cy") + col("_dy")).as("_cy"),
        col("_x").as("_xa"), col("_d").as("_da"))
    shifted.join(cells.select(col("_cx"), col("_cy"),
        col("_x").as("_xb"), col("_d").as("_db")), Seq("_cx", "_cy"))
  }

  private def d38(c: Column) = c.cast("decimal(38,0)")

  /** Moran's I of the cell-count field under rook weights:
    * I = (n/W)·Σ_ij w_ij d_i d_j / Σ d_i² with d_i = n·x_i − S (the
    * n-scaled deviations, so every term is an exact integer; the n²
    * factors cancel). E[I] = −1/(n−1) under the randomization null —
    * I > E[I] = positive spatial autocorrelation (clumping). Returns
    * one row: n_cells, n_occupied, w, moran_num, sum_d2, i_r, e_i_r. */
  def moranI(points: DataFrame, xCol: String, yCol: String, h: Double)
      : DataFrame = {
    val cells = latticeD(points, xCol, yCol, h)
    val adj = rookPairs(cells)
      .agg(count(lit(1)).as("w"),
        coalesce(sum(d38(col("_da")) * col("_db")),
          lit(0).cast("decimal(38,0)")).as("moran_num"))
    val tot = cells.agg(first(col("_n")).as("n_cells"),
      sum(when(col("_x") > 0, 1L).otherwise(0L)).as("n_occupied"),
      sum(d38(col("_d")) * col("_d")).as("sum_d2"))
    broadcast(tot).crossJoin(broadcast(adj))
      .select(col("n_cells"), col("n_occupied"), col("w"),
        col("moran_num").cast("decimal(38,0)").as("moran_num"),
        col("sum_d2").cast("decimal(38,0)").as("sum_d2"),
        ((col("n_cells").cast("double") * col("moran_num").cast("double"))
          / (col("w").cast("double") * col("sum_d2").cast("double")))
          .as("i_r"),
        (lit(-1.0) / (col("n_cells").cast("double") - lit(1.0)))
          .as("e_i_r"))
  }

  /** Geary's C under the same weights:
    * C = (n−1)·Σ_ij w_ij (x_i−x_j)² / (2W·Σ(x_i−x̄)²)
    *   = (n−1)·n²·Σ_ij w_ij (x_i−x_j)² / (2W·Σd_i²) — exact integers,
    * one division. C < 1 = positive autocorrelation (Geary weights
    * local differences where Moran weights cross-products, so C is the
    * more local of the pair). Returns one row: n_cells, w, geary_num,
    * sum_d2, c_r. */
  def gearyC(points: DataFrame, xCol: String, yCol: String, h: Double)
      : DataFrame = {
    val cells = latticeD(points, xCol, yCol, h)
    val adj = rookPairs(cells)
      .agg(count(lit(1)).as("w"),
        coalesce(sum(d38(col("_xa") - col("_xb"))
          * (col("_xa") - col("_xb"))), lit(0).cast("decimal(38,0)"))
          .as("geary_num"))
    val tot = cells.agg(first(col("_n")).as("n_cells"),
      sum(d38(col("_d")) * col("_d")).as("sum_d2"))
    broadcast(tot).crossJoin(broadcast(adj))
      .select(col("n_cells"), col("w"),
        col("geary_num").cast("decimal(38,0)").as("geary_num"),
        col("sum_d2").cast("decimal(38,0)").as("sum_d2"),
        (((col("n_cells").cast("double") - lit(1.0))
            * col("n_cells").cast("double")
            * col("n_cells").cast("double")
            * col("geary_num").cast("double"))
          / (lit(2.0) * col("w").cast("double")
            * col("sum_d2").cast("double"))).as("c_r"))
  }

  /** Join-count statistics of cell OCCUPANCY (black = x > 0): BB, WW
    * and BW joins over the rook adjacency (undirected counts =
    * directed/2), with free-sampling expectations
    * E[BB] = (W/2)·p², E[WW] = (W/2)·q², E[BW] = W·p·q for
    * p = n_occ/n — the binary-field autocorrelation test (too many BB
    * joins = occupied cells clump). Returns one row: n_cells, n_occ,
    * w, bb, ww, bw, e_bb_r, e_ww_r, e_bw_r. */
  def joinCounts(points: DataFrame, xCol: String, yCol: String,
      h: Double): DataFrame = {
    val cells = latticeD(points, xCol, yCol, h)
    val adj = rookPairs(cells)
      .agg(count(lit(1)).as("w"),
        (coalesce(sum(when(col("_xa") > 0 && col("_xb") > 0, 1L)
          .otherwise(0L)), lit(0L)) / 2).cast("long").as("bb"),
        (coalesce(sum(when(col("_xa") === 0 && col("_xb") === 0, 1L)
          .otherwise(0L)), lit(0L)) / 2).cast("long").as("ww"),
        (coalesce(sum(when((col("_xa") > 0) =!= (col("_xb") > 0), 1L)
          .otherwise(0L)), lit(0L)) / 2).cast("long").as("bw"))
    val tot = cells.agg(first(col("_n")).as("n_cells"),
      sum(when(col("_x") > 0, 1L).otherwise(0L)).as("n_occ"))
    val nD = col("n_cells").cast("double")
    val p = col("n_occ").cast("double") / nD
    val q = lit(1.0) - (col("n_occ").cast("double") / nD)
    broadcast(tot).crossJoin(broadcast(adj))
      .select(col("n_cells"), col("n_occ"), col("w"), col("bb"),
        col("ww"), col("bw"),
        (col("w").cast("double") / lit(2.0) * p * p).as("e_bb_r"),
        (col("w").cast("double") / lit(2.0) * q * q).as("e_ww_r"),
        (col("w").cast("double") * p * q).as("e_bw_r"))
  }

  /** Getis–Ord General G of the count field:
    * G = Σ_ij w_ij x_i x_j / Σ_{i≠j} x_i x_j (denominator = S² − Σx²)
    * — unlike Moran it is NOT mean-centered, so it separates hot-spot
    * clustering (high values together ⇒ G > E[G] = W/(n(n−1))) from
    * cold-spot clustering Moran conflates with it. Exact integers, one
    * division each. Returns one row: n_cells, w, g_num, g_den, g_r,
    * e_g_r. */
  def getisG(points: DataFrame, xCol: String, yCol: String, h: Double)
      : DataFrame = {
    val cells = latticeD(points, xCol, yCol, h)
    val adj = rookPairs(cells)
      .agg(count(lit(1)).as("w"),
        coalesce(sum(d38(col("_xa")) * col("_xb")),
          lit(0).cast("decimal(38,0)")).as("g_num"))
    val tot = cells.agg(first(col("_n")).as("n_cells"),
      first(col("_s")).as("_s"), first(col("_q2")).as("_q2"))
    broadcast(tot).crossJoin(broadcast(adj))
      .select(col("n_cells"), col("w"),
        col("g_num").cast("decimal(38,0)").as("g_num"),
        (d38(col("_s")) * col("_s") - col("_q2"))
          .cast("decimal(38,0)").as("g_den"),
        (col("g_num").cast("double")
          / (d38(col("_s")) * col("_s") - col("_q2")).cast("double"))
          .as("g_r"),
        (col("w").cast("double") / (col("n_cells").cast("double")
          * (col("n_cells").cast("double") - lit(1.0)))).as("e_g_r"))
  }

  /** Local Moran (LISA, Anselin 1995) top-k: per cell
    * I_i ∝ d_i·Σ_j w_ij d_j — the exact integer local product `li`
    * (reported raw for auditability) and its normalized form
    * li_r = n·li/Σd². Positive = the cell sits in a like-valued
    * neighborhood (hot–hot or cold–cold core); negative = a spatial
    * outlier. Top `k` by |li| with (cx, cy) tiebreak. Returns k rows:
    * cx, cy, x, li, li_r. */
  def localMoran(points: DataFrame, xCol: String, yCol: String,
      h: Double, k: Int): DataFrame = {
    val cells = latticeD(points, xCol, yCol, h)
    // rookPairs keys rows by the NEIGHBOR's coords (_cx,_cy = j) with
    // (_da) the origin cell i — grouping by j and summing d_i over its
    // adjacent i IS j's spatial lag (rook adjacency is symmetric)
    val lag = rookPairs(cells)
      .groupBy(col("_cx"), col("_cy"))
      .agg(sum(col("_da")).as("_lag"))
    val tot = cells.agg(sum(d38(col("_d")) * col("_d")).as("_sd2"),
      first(col("_n")).as("_nc"))
    cells.join(lag, Seq("_cx", "_cy"), "left")
      .crossJoin(broadcast(tot))
      .select(col("_cx").as("cx"), col("_cy").as("cy"), col("_x").as("x"),
        (d38(col("_d")) * coalesce(col("_lag"), lit(0L)))
          .cast("decimal(38,0)").as("li"),
        ((col("_nc").cast("double") * (d38(col("_d"))
            * coalesce(col("_lag"), lit(0L))).cast("double"))
          / col("_sd2").cast("double")).as("li_r"))
      .orderBy(abs(col("li")).desc, col("cx"), col("cy"))
      .limit(k)
      .orderBy(abs(col("li")).desc, col("cx"), col("cy"))
  }
}
