package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Graphs
import graft.util.Tables._

/** Round-11 data-fabric batch: the persisted BUCKETED edge-table
  * layout (the storage answer to the graph family's shared edge-build
  * floor — build once, every src-keyed self-join reads exchange-free)
  * plus preference/structure analytics that ride it or the embedding
  * tables. Reference scope: the reference's pandas transforms have no
  * graph/layout surface; these generalize the engine's own q213/q214/
  * q224/q363 family the way a production deployment would store it.
  */
object FabricQueries {

  /** The supplier co-occurrence edge oracle (q363's CTE, shared). */
  private val suppEdgesMat =
    """WITH items AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey AS g, l_suppkey AS i FROM lineitem),
      |e0 AS MATERIALIZED (
      |  SELECT a.i AS src, b.i AS dst
      |  FROM items a JOIN items b ON a.g = b.g AND a.i < b.i
      |  GROUP BY 1, 2 HAVING count(*) >= 5)""".stripMargin

  val all: Seq[Q] = Seq(

    // Per-vertex triangle counts read from the PERSISTED bucketed
    // edge table (build-if-absent, keyed by sf dir, mtime-guarded):
    // the compact-forward wedge self-join on src runs exchange-free on
    // both sides over the bucketed layout — the 100 TB shape where the
    // edge build is paid once, not per query (PlanSpec pins the plan;
    // BASELINE.md records the delta vs the rebuild-per-query path).
    Q("q367_bucketed_triangles",
      Some(s"""$suppEdgesMat,
              |tri AS MATERIALIZED (
              |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
              |  FROM e0 e1 JOIN e0 e2
              |    ON e1.src = e2.src AND e1.dst < e2.dst
              |  WHERE EXISTS (SELECT 1 FROM e0 e3
              |    WHERE e3.src = e1.dst AND e3.dst = e2.dst)),
              |v AS (
              |  SELECT a AS vertex FROM tri
              |  UNION ALL SELECT b FROM tri
              |  UNION ALL SELECT c FROM tri)
              |SELECT vertex, count(*)::BIGINT AS n_triangles
              |FROM v GROUP BY 1 ORDER BY vertex""".stripMargin),
      (s, d) => {
        val tbl = suppEdgeTable(s, d)
        // subset-key co-partitioning lets the src-bucket layout drive
        // the closing semi join too (the e3 scan stays exchange-free);
        // scoped + eager so the conf is live at EXECUTION, restored
        // after — the checkpointed result is the tiny vertex grain
        // re-sorted after the checkpoint: see q388's dump-order note
        withSubsetCoPartition(s)(
          Graphs.triangleCountsForward(tbl).orderBy("vertex")
            .localCheckpoint())
          .orderBy("vertex")
      }),

    // Second consumer of the SAME persisted bucketed layout: per-edge
    // triangle support (the k-truss support stage) from the identical
    // exchange-free forward wedge join — each triangle credits all
    // three edges, so the count is the edge's FULL participation. The
    // layout is paid once; the whole src-keyed family reads it free.
    Q("q388_bucketed_edge_support",
      Some(s"""$suppEdgesMat,
              |tri AS MATERIALIZED (
              |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
              |  FROM e0 e1 JOIN e0 e2
              |    ON e1.src = e2.src AND e1.dst < e2.dst
              |  WHERE EXISTS (SELECT 1 FROM e0 e3
              |    WHERE e3.src = e1.dst AND e3.dst = e2.dst)),
              |pe AS (
              |  SELECT a AS src, b AS dst FROM tri
              |  UNION ALL SELECT a, c FROM tri
              |  UNION ALL SELECT b, c FROM tri),
              |sup AS (
              |  SELECT src, dst, count(*)::BIGINT AS support
              |  FROM pe GROUP BY 1, 2)
              |SELECT src, dst, support FROM (
              |  SELECT src, dst, support, row_number() OVER (
              |    ORDER BY support DESC, src, dst) AS rn
              |  FROM sup) t
              |WHERE rn <= 20 ORDER BY support DESC, src, dst"""
        .stripMargin),
      (s, d) => {
        val tbl = suppEdgeTable(s, d)
        // re-assert the order on the checkpointed 20-row frame: the
        // LogicalRDD drops the plan-visible Sort the Verify dump-order
        // contract pins (the data is already in this order — free)
        withSubsetCoPartition(s)(
          Graphs.edgeSupportForward(tbl)
            .orderBy(col("support").desc, col("src"), col("dst"))
            .limit(20)
            .localCheckpoint())
          .orderBy(col("support").desc, col("src"), col("dst"))
      })
  )
}
