package graft.queries

import org.apache.spark.sql.functions.{col, element_at}

import graft.ops.Spatial
import graft.util.Tables._

/** Round-14 spatial-autocorrelation batch over the embedding
  * projection: Moran's I, Geary's C, occupancy join counts, Getis–Ord
  * General G, and local Moran (LISA) top cells — the geostatistics
  * battery q456's density clustering lacks (it finds WHERE clumps
  * are; these score HOW clumped the field is, and whether beyond
  * chance). One shared trunk: embedding dims 1–2 binned to
  * [[graft.ops.Cluster.gridDensityCells]]'s 0.05 cells, zero-filled
  * over the bounding box (coordinate-bounded lattice — never
  * data-sized), rook adjacency from a 4-offset broadcast self-join.
  * Every statistic is exact integers (d_i = n·x_i − S) until one
  * final double division shared verbatim with the oracle.
  */
object SpatialQueries {

  private val H = 0.05
  private val LisaK = 20

  /** Shared lattice/adjacency CTE chain (mirrors Spatial.latticeD +
    * rookPairs cell for cell: adj rows are DIRECTED neighbor pairs —
    * each unordered pair twice). */
  private val latticeCte =
    s"""occ AS MATERIALIZED (
       |  SELECT floor(embedding[1]::DOUBLE / $H)::BIGINT AS cx,
       |    floor(embedding[2]::DOUBLE / $H)::BIGINT AS cy,
       |    count(*)::BIGINT AS m
       |  FROM embeddings GROUP BY 1, 2),
       |b AS (SELECT min(cx) AS x0, max(cx) AS x1,
       |  min(cy) AS y0, max(cy) AS y1 FROM occ),
       |grid AS (SELECT gx.cx AS cx, gy.cy AS cy
       |  FROM b, unnest(generate_series(b.x0, b.x1)) gx(cx),
       |    unnest(generate_series(b.y0, b.y1)) gy(cy)),
       |cells AS MATERIALIZED (
       |  SELECT g.cx, g.cy, coalesce(o.m, 0)::BIGINT AS x
       |  FROM grid g LEFT JOIN occ o ON o.cx = g.cx AND o.cy = g.cy),
       |tot AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS s,
       |  sum(x * x)::BIGINT AS q2 FROM cells),
       |dv AS MATERIALIZED (SELECT c.cx, c.cy, c.x,
       |  (t.n * c.x - t.s)::HUGEINT AS dd FROM cells c, tot t),
       |adj AS MATERIALIZED (
       |  SELECT a.x AS xa, a.dd AS da, nb.cx AS bcx, nb.cy AS bcy,
       |    nb.x AS xb, nb.dd AS db
       |  FROM dv a
       |  CROSS JOIN (VALUES (-1, 0), (1, 0), (0, -1), (0, 1)) o(dx, dy)
       |  JOIN dv nb ON nb.cx = a.cx + o.dx AND nb.cy = a.cy + o.dy)"""
      .stripMargin

  val all: Seq[Q] = Seq(

    // Moran's I of the cell-count field: the global "is embedding mass
    // spatially clumped" number, exact-integer numerator/denominator
    // (n-scaled deviations) with E[I] = −1/(n−1) alongside.
    Q("q517_moran_i",
      Some(s"""WITH $latticeCte,
              |ag AS (SELECT count(*)::BIGINT AS w,
              |  coalesce(sum(da * db), 0)::DECIMAL(38,0) AS moran_num
              |  FROM adj),
              |tt AS (SELECT any_value(t.n) AS n_cells,
              |  sum(CASE WHEN x > 0 THEN 1 ELSE 0 END)::BIGINT
              |    AS n_occupied,
              |  sum(dd * dd)::DECIMAL(38,0) AS sum_d2
              |  FROM dv, tot t)
              |SELECT n_cells, n_occupied, w, moran_num, sum_d2,
              |  (n_cells::DOUBLE * moran_num::DOUBLE)
              |    / (w::DOUBLE * sum_d2::DOUBLE) AS i_r,
              |  -1.0 / (n_cells::DOUBLE - 1.0) AS e_i_r
              |FROM tt, ag""".stripMargin),
      (s, d) => Spatial.moranI(
        embeddings(s, d).select(
          element_at(col("embedding"), 1).as("e1"),
          element_at(col("embedding"), 2).as("e2")),
        "e1", "e2", H)),

    // Geary's C — the local-difference complement of Moran (C < 1 =
    // positive autocorrelation); same trunk, exact integers.
    Q("q518_geary_c",
      Some(s"""WITH $latticeCte,
              |ag AS (SELECT count(*)::BIGINT AS w,
              |  coalesce(sum((xa - xb)::HUGEINT * (xa - xb)), 0)
              |    ::DECIMAL(38,0) AS geary_num
              |  FROM adj),
              |tt AS (SELECT any_value(t.n) AS n_cells,
              |  sum(dd * dd)::DECIMAL(38,0) AS sum_d2 FROM dv, tot t)
              |SELECT n_cells, w, geary_num, sum_d2,
              |  ((n_cells::DOUBLE - 1.0) * n_cells::DOUBLE
              |    * n_cells::DOUBLE * geary_num::DOUBLE)
              |    / (2.0 * w::DOUBLE * sum_d2::DOUBLE) AS c_r
              |FROM tt, ag""".stripMargin),
      (s, d) => Spatial.gearyC(
        embeddings(s, d).select(
          element_at(col("embedding"), 1).as("e1"),
          element_at(col("embedding"), 2).as("e2")),
        "e1", "e2", H)),

    // Join counts of cell occupancy: BB/WW/BW joins vs free-sampling
    // expectations — the binary-field clumping test.
    Q("q519_join_counts",
      Some(s"""WITH $latticeCte,
              |ag AS (SELECT count(*)::BIGINT AS w,
              |  (coalesce(sum(CASE WHEN xa > 0 AND xb > 0 THEN 1
              |    ELSE 0 END), 0) / 2)::BIGINT AS bb,
              |  (coalesce(sum(CASE WHEN xa = 0 AND xb = 0 THEN 1
              |    ELSE 0 END), 0) / 2)::BIGINT AS ww,
              |  (coalesce(sum(CASE WHEN (xa > 0) <> (xb > 0) THEN 1
              |    ELSE 0 END), 0) / 2)::BIGINT AS bw
              |  FROM adj),
              |tt AS (SELECT any_value(t.n) AS n_cells,
              |  sum(CASE WHEN x > 0 THEN 1 ELSE 0 END)::BIGINT AS n_occ
              |  FROM dv, tot t)
              |SELECT n_cells, n_occ, w, bb, ww, bw,
              |  w::DOUBLE / 2.0 * (n_occ::DOUBLE / n_cells::DOUBLE)
              |    * (n_occ::DOUBLE / n_cells::DOUBLE) AS e_bb_r,
              |  w::DOUBLE / 2.0
              |    * (1.0 - n_occ::DOUBLE / n_cells::DOUBLE)
              |    * (1.0 - n_occ::DOUBLE / n_cells::DOUBLE) AS e_ww_r,
              |  w::DOUBLE * (n_occ::DOUBLE / n_cells::DOUBLE)
              |    * (1.0 - n_occ::DOUBLE / n_cells::DOUBLE) AS e_bw_r
              |FROM tt, ag""".stripMargin),
      (s, d) => Spatial.joinCounts(
        embeddings(s, d).select(
          element_at(col("embedding"), 1).as("e1"),
          element_at(col("embedding"), 2).as("e2")),
        "e1", "e2", H)),

    // Getis–Ord General G: hot-spot vs cold-spot clustering (not
    // mean-centered, unlike Moran) — exact integers, one division.
    Q("q520_getis_g",
      Some(s"""WITH $latticeCte,
              |ag AS (SELECT count(*)::BIGINT AS w,
              |  coalesce(sum(xa::HUGEINT * xb), 0)::DECIMAL(38,0)
              |    AS g_num
              |  FROM adj),
              |tt AS (SELECT any_value(t.n) AS n_cells,
              |  (any_value(t.s)::HUGEINT * any_value(t.s)
              |    - any_value(t.q2))::DECIMAL(38,0) AS g_den
              |  FROM dv, tot t)
              |SELECT n_cells, w, g_num, g_den,
              |  g_num::DOUBLE / g_den::DOUBLE AS g_r,
              |  w::DOUBLE / (n_cells::DOUBLE
              |    * (n_cells::DOUBLE - 1.0)) AS e_g_r
              |FROM tt, ag""".stripMargin),
      (s, d) => Spatial.getisG(
        embeddings(s, d).select(
          element_at(col("embedding"), 1).as("e1"),
          element_at(col("embedding"), 2).as("e2")),
        "e1", "e2", H)),

    // Local Moran (LISA) top-20 cells by |d_i·lag_i|: hot–hot/cold–
    // cold cores (positive) and spatial outliers (negative), the raw
    // integer product reported for auditability.
    Q("q521_local_moran",
      Some(s"""WITH $latticeCte,
              |lg AS (SELECT bcx AS cx, bcy AS cy,
              |  sum(da)::HUGEINT AS lag FROM adj GROUP BY 1, 2),
              |tt AS (SELECT sum(dd * dd)::DECIMAL(38,0) AS sd2,
              |  any_value(t.n) AS n FROM dv, tot t)
              |SELECT v.cx, v.cy, v.x,
              |  (v.dd * coalesce(l.lag, 0))::DECIMAL(38,0) AS li,
              |  (t.n::DOUBLE
              |    * (v.dd * coalesce(l.lag, 0))::DECIMAL(38,0)::DOUBLE)
              |    / t.sd2::DOUBLE AS li_r
              |FROM dv v LEFT JOIN lg l ON l.cx = v.cx AND l.cy = v.cy
              |  CROSS JOIN tt t
              |ORDER BY abs((v.dd * coalesce(l.lag, 0))
              |  ::DECIMAL(38,0)) DESC, v.cx, v.cy
              |LIMIT $LisaK""".stripMargin),
      (s, d) => Spatial.localMoran(
        embeddings(s, d).select(
          element_at(col("embedding"), 1).as("e1"),
          element_at(col("embedding"), 2).as("e2")),
        "e1", "e2", H, LisaK))
  )
}
