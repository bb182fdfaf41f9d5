package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Graphs, Sketches}
import graft.util.Tables._

/** Round-6 widening batch: the approximate/summary and graph-
  * neighborhood side of the engine — Count-Min point-frequency
  * estimation, bounded k-hop reachability. Oracle constants are
  * interpolated from the same Scala values the ops receive, so the
  * twins cannot drift (same convention as DepthQueries).
  */
object WideQueries {

  // Count-Min geometry: 4×256 counters over ~1.5k distinct customer
  // keys at sf0.01 — deliberately narrow so collisions (and therefore
  // visible overestimates) actually occur; ε = e/256 ≈ 1.1%.
  private val CmsDepth = 4
  private val CmsWidth = 256

  // BFS depth for k-hop reach (kept ≤ the co-occurrence graph's mixing
  // depth — see Graphs.kHopReach's quadratic-ball caveat)
  private val KHop = 3

  private def hash60Sql(e: String) =
    s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  val all: Seq[Q] = Seq(

    // Count-Min frequency estimates vs true counts for every customer
    // appearing in orders. The paired (cnt, est) output pins the
    // one-sided contract IN the oracle: est < cnt anywhere means the
    // engines' hash/counter arithmetic diverged, and the driver's
    // cell-compare goes red. The sketch is the mergeable fixed-size
    // summary (d·w counters, additive cells) a 100 TB stream keeps
    // instead of a per-key count table.
    Q("q139_cms_frequency",
      Some(s"""WITH sk AS (
              |  SELECT j AS row_j,
              |    ${hash60Sql(s"o_custkey::VARCHAR || '#' || j::VARCHAR")}
              |      % $CmsWidth AS pos,
              |    count(*)::BIGINT AS cnt
              |  FROM orders, unnest(generate_series(0, ${CmsDepth - 1}))
              |    AS t(j)
              |  GROUP BY 1, 2),
              |tc AS (
              |  SELECT o_custkey, count(*)::BIGINT AS cnt
              |  FROM orders GROUP BY 1),
              |est AS (
              |  SELECT q.o_custkey, min(coalesce(s.cnt, 0))::BIGINT AS est
              |  FROM (
              |    SELECT o_custkey, j AS row_j,
              |      ${hash60Sql(s"o_custkey::VARCHAR || '#' || j::VARCHAR")}
              |        % $CmsWidth AS pos
              |    FROM tc, unnest(generate_series(0, ${CmsDepth - 1}))
              |      AS t(j)) q
              |  LEFT JOIN sk s USING (row_j, pos)
              |  GROUP BY 1)
              |SELECT t.o_custkey, t.cnt, e.est
              |FROM tc t JOIN est e USING (o_custkey)
              |ORDER BY o_custkey""".stripMargin),
      (s, d) => {
        val keys = orders(s, d).select(col("o_custkey"))
        val sketch = Sketches.cmsBuild(keys, "o_custkey", CmsDepth, CmsWidth)
        val tc = keys.groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
        Sketches.cmsEstimate(tc, "o_custkey", sketch, CmsDepth, CmsWidth)
          .select("o_custkey", "cnt", "est")
          .orderBy("o_custkey")
      }),

    // Per-vertex ≤3-hop neighborhood size on the q89/q103 supplier
    // co-occurrence graph. The oracle unrolls the BFS rounds as
    // DISTINCT-union CTEs — the same monotone closure the engine's
    // frontier iteration computes, so any drift in symmetrization,
    // dedup, or round count shows up as a cell mismatch.
    Q("q140_khop_reach",
      Some {
        val rounds = (1 to KHop).map { i =>
          s"""f$i AS (
             |  SELECT DISTINCT origin, v FROM (
             |    SELECT origin, v FROM f${i - 1}
             |    UNION ALL
             |    SELECT f.origin, s.dst AS v
             |    FROM f${i - 1} f JOIN sym s ON f.v = s.src))""".stripMargin
        }.mkString(",\n")
        s"""${DepthQueries.edgesCte},
           |f0 AS (SELECT src AS origin, src AS v FROM deg),
           |$rounds
           |SELECT origin AS vertex, count(*)::BIGINT AS n_reach
           |FROM f$KHop GROUP BY 1 ORDER BY 1""".stripMargin
      },
      (s, d) => Graphs.kHopReach(
          Graphs.coOccurrenceEdges(lineitem(s, d), "l_orderkey",
            "l_suppkey", 5L),
          KHop)
        .orderBy("vertex"))
  )
}
