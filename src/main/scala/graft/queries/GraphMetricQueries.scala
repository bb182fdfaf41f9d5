package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Graphs
import graft.util.Tables._

/** Graph-shape metrics over the co-occurrence graphs the iterative
  * queries (q89/q103/q128/q140) run on: degree histogram +
  * assortativity, local clustering coefficients, and HITS
  * hubs/authorities — the structural pre-flight numbers that tell you
  * whether a graph algorithm's cost model (hot vertices? clique-y
  * blocks?) holds before you budget the iterations.
  */
object GraphMetricQueries {

  /** PART co-occurrence graph (support ≥ 2) — q140's sparse fixture. */
  private val partEdges =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
      |e0 AS (
      |  SELECT a.i AS src, b.i AS dst
      |  FROM items a JOIN items b ON a.g = b.g AND a.i < b.i
      |  GROUP BY 1, 2 HAVING count(*) >= 2)""".stripMargin

  /** SUPPLIER co-occurrence graph (support ≥ 5) — q89's dense fixture. */
  private val suppEdges =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS g, l_suppkey AS i FROM lineitem),
      |edges AS (
      |  SELECT a.i AS src, b.i AS dst
      |  FROM items a JOIN items b ON a.g = b.g AND a.i < b.i
      |  GROUP BY 1, 2 HAVING count(*) >= 5)""".stripMargin

  val all: Seq[Q] = Seq(

    // Degree histogram + assortativity of the PART graph: integer
    // moments over the degree-annotated symmetrized edges, Pearson r in
    // one shared parenthesization.
    Q("q213_degree_assortativity",
      Some(s"""$partEdges,
              |sym AS (SELECT src, dst FROM e0
              |        UNION ALL SELECT dst, src FROM e0),
              |deg AS (
              |  SELECT src, count(*)::BIGINT AS deg FROM sym GROUP BY 1),
              |hist AS (
              |  SELECT deg AS degree, count(*)::BIGINT AS n_nodes
              |  FROM deg GROUP BY 1),
              |p AS (
              |  SELECT d1.deg AS du, d2.deg AS dv
              |  FROM sym JOIN deg d1 ON sym.src = d1.src
              |  JOIN deg d2 ON sym.dst = d2.src),
              |m AS (
              |  SELECT count(*)::DOUBLE AS m, sum(du)::DOUBLE AS sx,
              |    sum(du * dv)::DOUBLE AS sxy, sum(du * du)::DOUBLE AS sxx
              |  FROM p)
              |SELECT degree, n_nodes,
              |  CASE WHEN m * sxx - sx * sx > 0
              |    THEN round((m * sxy - sx * sx) / (m * sxx - sx * sx), 6)
              |    END AS assort_r
              |FROM hist CROSS JOIN m ORDER BY degree""".stripMargin),
      (s, d) => Graphs.degreeAssortativity(
          partEdgeTable(s, d).cache())
        .orderBy("degree")),

    // Local clustering + transitivity of the SUPPLIER graph: per-vertex
    // C(v) from exact triangle/degree integers; the average sums the
    // ROUNDED C(v) as DECIMAL (order-independent).
    Q("q214_local_clustering",
      Some(s"""$suppEdges,
              |sym AS (SELECT src, dst FROM edges
              |        UNION ALL SELECT dst, src FROM edges),
              |deg AS (
              |  SELECT src AS vertex, count(*)::BIGINT AS deg
              |  FROM sym GROUP BY 1),
              |tri AS (
              |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
              |  FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
              |  WHERE EXISTS (SELECT 1 FROM edges e3
              |                WHERE e3.src = e1.src AND e3.dst = e2.dst)),
              |verts AS (
              |  SELECT a AS vertex FROM tri
              |  UNION ALL SELECT b FROM tri
              |  UNION ALL SELECT c FROM tri),
              |tcnt AS (
              |  SELECT vertex, count(*)::BIGINT AS n_tri
              |  FROM verts GROUP BY 1),
              |base AS (
              |  SELECT deg.vertex, deg.deg,
              |    coalesce(tcnt.n_tri, 0)::BIGINT AS n_tri,
              |    CASE WHEN deg.deg >= 2
              |      THEN round(2.0 * coalesce(tcnt.n_tri, 0)
              |        / (deg.deg * (deg.deg - 1)), 6) END AS c_r
              |  FROM deg LEFT JOIN tcnt USING (vertex)),
              |g AS (
              |  SELECT sum(n_tri)::BIGINT AS t3,
              |    sum((deg * (deg - 1)) // 2)::BIGINT AS w,
              |    sum(c_r::DECIMAL(18,6))::DOUBLE AS cs,
              |    sum(CASE WHEN c_r IS NOT NULL THEN 1 ELSE 0 END)
              |      ::BIGINT AS cn
              |  FROM base)
              |SELECT vertex, deg, n_tri, c_r,
              |  CASE WHEN w > 0 THEN round(t3 / w, 6) END
              |    AS transitivity_r,
              |  CASE WHEN cn > 0 THEN round(cs / cn, 6) END
              |    AS avg_clustering_r
              |FROM base CROSS JOIN g ORDER BY vertex""".stripMargin),
      (s, d) => Graphs.localClustering(
          suppEdgeTable(s, d).cache())
        .orderBy("vertex")),

    // HITS on the customer→supplier bipartite graph, 2 unnormalized
    // integer iterations + one final max-normalization (see Graphs.hits
    // scaladoc for why this beats per-iteration normalization here).
    Q("q215_hits",
      Some("""WITH e AS (
             |  SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |a1 AS (SELECT dst, count(*)::BIGINT AS s FROM e GROUP BY dst),
             |h1 AS (SELECT src, sum(a1.s)::BIGINT AS s
             |  FROM e JOIN a1 USING (dst) GROUP BY src),
             |a2 AS (SELECT dst, sum(h1.s)::BIGINT AS s
             |  FROM e JOIN h1 USING (src) GROUP BY dst),
             |h2 AS (SELECT src, sum(a2.s)::BIGINT AS s
             |  FROM e JOIN a2 USING (dst) GROUP BY src),
             |am AS (SELECT max(s)::DOUBLE AS m FROM a2),
             |hm AS (SELECT max(s)::DOUBLE AS m FROM h2)
             |SELECT 'auth' AS side, dst AS v, round(s / m, 6) AS score_r
             |FROM a2 CROSS JOIN am
             |UNION ALL
             |SELECT 'hub' AS side, src AS v, round(s / m, 6) AS score_r
             |FROM h2 CROSS JOIN hm
             |ORDER BY side, v""".stripMargin),
      (s, d) => Graphs.hits(
          orders(s, d).select(col("o_orderkey"), col("o_custkey"))
            .join(lineitem(s, d).select(col("l_orderkey"),
              col("l_suppkey")),
              col("o_orderkey") === col("l_orderkey"))
            .select(col("o_custkey").as("src"),
              col("l_suppkey").as("dst")),
          iters = 2)
        .orderBy("side", "v")))
}
