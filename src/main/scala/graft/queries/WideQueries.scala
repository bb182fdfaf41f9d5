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

  // BFS depth for k-hop reach. The graph is PART co-occurrence at
  // support 2 — NOT the q89/q103 supplier graph, whose ≤100 vertices
  // all co-occur at any support the two scales share (its 2-ball is
  // already complete, so k = 3 degenerates to V² pairs: measured 10.4 s
  // at sf0.1 for a closure the valve is meant to forbid). The part
  // graph is naturally sparse at BOTH scales (~3.5k edges; 3-ball
  // 132k pairs at sf0.01, 17k at sf0.1), so the BFS rounds do real
  // frontier work within Graphs.kHopReach's documented k ≤ mixing-depth
  // guidance.
  private val KHop = 3
  private val KHopSupport = 2L

  private val partEdgesCte =
    s"""WITH items AS (
       |  SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
       |e0 AS (
       |  SELECT a.i AS src, b.i AS dst
       |  FROM items a JOIN items b ON a.g = b.g AND a.i < b.i
       |  GROUP BY 1, 2 HAVING count(*) >= $KHopSupport),
       |sym AS (SELECT src, dst FROM e0
       |        UNION ALL SELECT dst, src FROM e0),
       |verts AS (SELECT DISTINCT src FROM sym)""".stripMargin

  // HLL geometry: p = 8 → 256 registers, σ ≈ 1.04/√256 = 6.5%. The
  // register width is 60 − p = 52 bits; ρ ∈ [1, 53].
  private val HllP = 8
  private val HllM = 1 << HllP
  private val HllWidth1 = 60 - HllP + 1
  private val HllAlphaMM = Sketches.hllAlpha(HllM) * HllM * HllM
  private val HllLcThreshold = 2.5 * HllM

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

    // Per-vertex ≤3-hop neighborhood size on the sparse part
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
        s"""$partEdgesCte,
           |f0 AS (SELECT src AS origin, src AS v FROM verts),
           |$rounds
           |SELECT origin AS vertex, count(*)::BIGINT AS n_reach
           |FROM f$KHop GROUP BY 1 ORDER BY 1""".stripMargin
      },
      (s, d) => Graphs.kHopReach(
          partEdgeTable(s, d), // support = KHopSupport, persisted bucketed
          KHop)
        .orderBy("vertex")),

    // The HLL register table itself, cell by cell — the state q20's
    // opaque HLL++ sketch can't expose. Integer-exact in both engines
    // (rank via binary-string length, no float log2), so ANY drift in
    // hash, bucketing, or max-fold turns a register red.
    Q("q142_hll_registers",
      Some(s"""WITH h AS (
              |  SELECT ${hash60Sql("o_custkey::VARCHAR")} AS h
              |  FROM orders),
              |b AS (SELECT h % $HllM AS idx, h // $HllM AS w FROM h)
              |SELECT idx,
              |  max(CASE WHEN w = 0 THEN $HllWidth1
              |      ELSE $HllWidth1 - length(bin(w)) END)::BIGINT AS reg
              |FROM b GROUP BY idx ORDER BY idx""".stripMargin),
      (s, d) => Sketches.hllRegisters(
          orders(s, d).select(col("o_custkey")), "o_custkey", HllP)
        .orderBy("idx")),

    // The estimate those registers imply, next to the true distinct —
    // the constant-state answer a 100 TB stream keeps instead of a
    // distinct-key table. α·m² and the 2.5m linear-counting threshold
    // are interpolated from the engine's own constants.
    Q("q143_hll_estimate",
      Some(s"""WITH h AS (
              |  SELECT ${hash60Sql("o_custkey::VARCHAR")} AS h
              |  FROM orders),
              |b AS (SELECT h % $HllM AS idx, h // $HllM AS w FROM h),
              |regs AS (
              |  SELECT idx,
              |    max(CASE WHEN w = 0 THEN $HllWidth1
              |        ELSE $HllWidth1 - length(bin(w)) END) AS reg
              |  FROM b GROUP BY idx),
              |grid AS (
              |  SELECT g AS idx
              |  FROM unnest(generate_series(0, ${HllM - 1})) AS t(g)),
              |filled AS (
              |  SELECT coalesce(r.reg, 0) AS reg
              |  FROM grid LEFT JOIN regs r USING (idx)),
              |agg AS (
              |  SELECT sum(pow(2.0, -reg)) AS z,
              |    sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END)::BIGINT
              |      AS v_zero
              |  FROM filled),
              |tc AS (
              |  SELECT count(DISTINCT o_custkey)::BIGINT AS n_true
              |  FROM orders)
              |SELECT v_zero, n_true,
              |  round(CASE WHEN v_zero > 0
              |      AND $HllAlphaMM / z <= $HllLcThreshold
              |    THEN ${HllM.toDouble} * ln(${HllM.toDouble} / v_zero)
              |    ELSE $HllAlphaMM / z END, 6) AS est
              |FROM agg CROSS JOIN tc""".stripMargin),
      (s, d) => {
        val keys = orders(s, d).select(col("o_custkey"))
        val est = Sketches.hllEstimate(
          Sketches.hllRegisters(keys, "o_custkey", HllP), HllP)
        val tc = keys.agg(countDistinct(col("o_custkey")).as("n_true"))
        est.crossJoin(tc).select("v_zero", "n_true", "est")
      })
  )
}
