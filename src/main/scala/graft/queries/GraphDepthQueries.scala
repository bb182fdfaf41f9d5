package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Graphs
import graft.util.Tables._

/** Graph-depth batch: k-core extraction and Adamic–Adar link
  * prediction over the PART co-occurrence graph — the "dense region"
  * and "missing edge" readouts that complement the shape metrics
  * (q213–q215) and the iterative algorithms (q89/q103/q128/q140).
  */
object GraphDepthQueries {

  /** q281: landmark count and BFS depth cap, shared verbatim with the
    * oracle SQL. 32 landmarks because the sf0.1 part graph is highly
    * FRAGMENTED (support ≥ 2 thins as the part domain outgrows repeat
    * pairs), so a small seed set lands in a few tiny components; more
    * seeds = more components audited. */
  private val Landmarks = 32
  private val MaxHops = 3

  /** q284: hubs removed in the percolation audit. */
  private val HubK = 10

  /** PART co-occurrence graph (support ≥ 2) — q140/q213's sparse
    * fixture. */
  private val partEdges =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
      |e0 AS (
      |  SELECT a.i AS src, b.i AS dst
      |  FROM items a JOIN items b ON a.g = b.g AND a.i < b.i
      |  GROUP BY 1, 2 HAVING count(*) >= 2)""".stripMargin

  /** One unrolled peel round: degrees of the live subgraph, the
    * surviving vertex set, the reduced edge list. */
  private def peel(r: Int, prev: String, k: Int): String =
    s"""d$r AS (SELECT src, count(*)::BIGINT AS deg FROM $prev GROUP BY 1),
       |v$r AS (SELECT src AS v FROM d$r WHERE deg >= $k),
       |s$r AS (SELECT e.src, e.dst FROM $prev e
       |  JOIN v$r x ON e.src = x.v JOIN v$r y ON e.dst = y.v)""".stripMargin

  val all: Seq[Q] = Seq(

    // 3-core of the PART graph after 4 fixed peel rounds (GraphsSpec
    // asserts 4 rounds reach the fixpoint on both sf fixtures, so this
    // IS the exact 3-core): survivors with their in-core degree.
    Q("q224_kcore",
      Some(s"""$partEdges,
              |sym AS (SELECT src, dst FROM e0
              |        UNION ALL SELECT dst, src FROM e0),
              |${peel(1, "sym", 3)},
              |${peel(2, "s1", 3)},
              |${peel(3, "s2", 3)},
              |${peel(4, "s3", 3)}
              |SELECT src AS vertex, count(*)::BIGINT AS core_deg
              |FROM s4 GROUP BY 1 HAVING count(*) >= 3
              |ORDER BY vertex""".stripMargin),
      (s, d) => Graphs.kCore(
          partEdgeTable(s, d).cache(),
          k = 3, rounds = 4)
        .orderBy("vertex")),

    // Adamic–Adar link prediction on the PART graph: non-adjacent
    // pairs with ≥2 common neighbors, scored by Σ 1/ln(deg w) — each
    // term 9-dp-rounded and summed as DECIMAL so the float sum is
    // order-independent across engines.
    Q("q225_adamic_adar",
      Some(s"""$partEdges,
              |sym AS (SELECT src, dst FROM e0
              |        UNION ALL SELECT dst, src FROM e0),
              |deg AS (SELECT src AS w, count(*)::BIGINT AS deg
              |        FROM sym GROUP BY 1),
              |wedge AS (
              |  SELECT a.dst AS u, b.dst AS v,
              |    round(1.0 / ln(deg.deg), 9)::DECIMAL(18,9) AS aa
              |  FROM sym a JOIN sym b
              |    ON a.src = b.src AND a.dst < b.dst
              |  JOIN deg ON deg.w = a.src)
              |SELECT u, v, count(*)::BIGINT AS common_neighbors,
              |  round(sum(aa)::DOUBLE, 6) AS aa_score_r
              |FROM wedge
              |WHERE NOT EXISTS (SELECT 1 FROM e0
              |                  WHERE e0.src = wedge.u AND e0.dst = wedge.v)
              |GROUP BY 1, 2 HAVING count(*) >= 2
              |ORDER BY u, v""".stripMargin),
      (s, d) => Graphs.adamicAdar(
          partEdgeTable(s, d).cache(),
          minCommon = 2L)
        .orderBy("u", "v")),

    // Landmark harmonic centrality (Graphs.landmarkHarmonic): BFS from
    // the `Landmarks` (32) smallest-md5 seed vertices, distances capped,
    // H(v) = Σ 1/d over reached landmarks — the sampled form of
    // closeness that replaces the O(V·E) all-pairs BFS at scale. Each
    // 1/d term 9-dp DECIMAL so the sum is order-independent.
    Q("q281_landmark_harmonic",
      Some(s"""$partEdges,
              |sym AS (SELECT src, dst FROM e0
              |        UNION ALL SELECT dst, src FROM e0),
              |seeds AS (
              |  SELECT l FROM (SELECT DISTINCT src AS l FROM sym) t
              |  ORDER BY ('0x' || substr(md5(l::VARCHAR), 1, 15))
              |    ::BIGINT, l LIMIT $Landmarks),
              |rec AS (
              |  SELECT l, l AS v, 0 AS d FROM seeds
              |  UNION
              |  SELECT r.l, s.dst AS v, r.d + 1 AS d
              |  FROM rec r JOIN sym s ON r.v = s.src
              |  WHERE r.d < $MaxHops),
              |dist AS (SELECT l, v, min(d) AS d FROM rec GROUP BY 1, 2)
              |SELECT v AS vertex, count(*)::BIGINT AS n_landmarks,
              |  round(sum(round(1.0 / d, 9)::DECIMAL(18,9))::DOUBLE, 6)
              |    AS harmonic_r
              |FROM dist WHERE d > 0 GROUP BY 1
              |ORDER BY vertex""".stripMargin
        .replaceFirst("WITH ", "WITH RECURSIVE ")),
      (s, d) => Graphs.landmarkHarmonic(
          partEdgeTable(s, d).cache(),
          landmarks = Landmarks, maxHops = MaxHops)
        .orderBy("vertex")),

    // Sampled pairwise-distance distribution + effective diameter at
    // 90% (the HyperANF readout, by landmark BFS): per hop count d ≤ 3,
    // how many sampled (landmark, vertex) pairs sit at exactly d, the
    // cumulative fraction, and the INTEGER-EXACT "first d covering 90%
    // of reached pairs" flag (cum·10 ≥ tot·9 and the previous cum
    // wasn't) — no float threshold at the boundary.
    Q("q283_distance_distribution",
      Some(s"""$partEdges,
              |sym AS (SELECT src, dst FROM e0
              |        UNION ALL SELECT dst, src FROM e0),
              |seeds AS (
              |  SELECT l FROM (SELECT DISTINCT src AS l FROM sym) t
              |  ORDER BY ('0x' || substr(md5(l::VARCHAR), 1, 15))
              |    ::BIGINT, l LIMIT $Landmarks),
              |rec AS (
              |  SELECT l, l AS v, 0 AS d FROM seeds
              |  UNION
              |  SELECT r.l, s.dst AS v, r.d + 1 AS d
              |  FROM rec r JOIN sym s ON r.v = s.src
              |  WHERE r.d < $MaxHops),
              |dist AS (
              |  SELECT l, v, min(d) AS d FROM rec GROUP BY 1, 2
              |  HAVING min(d) > 0),
              |byd AS (
              |  SELECT d::BIGINT AS d, count(*)::BIGINT AS n_pairs
              |  FROM dist GROUP BY 1),
              |c AS (
              |  SELECT d, n_pairs,
              |    sum(n_pairs) OVER (ORDER BY d)::BIGINT AS cum_pairs
              |  FROM byd),
              |tot AS (SELECT count(*)::BIGINT AS t FROM dist)
              |SELECT d, n_pairs, cum_pairs,
              |  round(cum_pairs / t, 6) AS reached_frac_r,
              |  (cum_pairs * 10 >= t * 9
              |    AND (cum_pairs - n_pairs) * 10 < t * 9) AS is_eff_d90
              |FROM c CROSS JOIN tot ORDER BY d""".stripMargin
        .replaceFirst("WITH ", "WITH RECURSIVE ")),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // the BFS has exactly ONE consumer (the byD hash-agg): cum and
        // total both derive from the ≤MaxHops-row byD frame via
        // spec-frame windows. A second branch off `dist` (e.g. a
        // broadcast total) would race the cache from the broadcast
        // thread and execute the whole BFS lineage twice — measured
        // 7.0 → 3.8 s when removed.
        val dist = Graphs.landmarkDistances(
            partEdgeTable(s, d).cache(),
            landmarks = Landmarks, maxHops = MaxHops)
          .where(col("d") > 0)
        val byD = dist.groupBy(col("d").cast("bigint").as("d"))
          .agg(count(lit(1)).as("n_pairs"))
        val w = Window.orderBy("d")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        byD.withColumn("cum_pairs", sum(col("n_pairs")).over(w))
          .withColumn("_t", sum(col("n_pairs")).over(wAll))
          .select(col("d"), col("n_pairs"), col("cum_pairs"),
            round(col("cum_pairs").cast("double")
              / nullif(col("_t").cast("double"), lit(0.0)), 6)
              .as("reached_frac_r"),
            (col("cum_pairs") * 10 >= col("_t") * 9 &&
              (col("cum_pairs") - col("n_pairs")) * 10 < col("_t") * 9)
              .as("is_eff_d90"))
          .orderBy("d")
      }),

    // Percolation / hub-robustness audit (Albert-Jeong-Barabási,
    // Nature 2000): component profile of the part graph BEFORE and
    // AFTER removing the top-10 degree hubs (ties by id —
    // deterministic). The "does the corpus graph shatter without its
    // hubs" readout; also exercises the dedup components trunk
    // (union-find fast path / distributed fixpoint) on a second graph
    // family. Vertices = endpoints of surviving edges in both phases.
    Q("q284_hub_percolation",
      Some(s"""$partEdges,
              |sym AS (SELECT src, dst FROM e0
              |        UNION ALL SELECT dst, src FROM e0),
              |deg AS (SELECT src AS v, count(*)::BIGINT AS deg
              |        FROM sym GROUP BY 1),
              |hubs AS (SELECT v FROM deg ORDER BY deg DESC, v
              |         LIMIT $HubK),
              |e1 AS (
              |  SELECT src, dst FROM e0
              |  WHERE src NOT IN (SELECT v FROM hubs)
              |    AND dst NOT IN (SELECT v FROM hubs)),
              |sym1 AS (SELECT src, dst FROM e1
              |         UNION ALL SELECT dst, src FROM e1),
              |r0 AS (
              |  SELECT src AS r, src AS node FROM sym
              |  UNION
              |  SELECT r0.r, s.dst FROM r0 JOIN sym s
              |    ON r0.node = s.src),
              |c0 AS (SELECT node, min(r) AS label FROM r0 GROUP BY 1),
              |r1 AS (
              |  SELECT src AS r, src AS node FROM sym1
              |  UNION
              |  SELECT r1.r, s.dst FROM r1 JOIN sym1 s
              |    ON r1.node = s.src),
              |c1 AS (SELECT node, min(r) AS label FROM r1 GROUP BY 1)
              |SELECT 'after' AS phase,
              |  (SELECT count(*) FROM c1)::BIGINT AS n_vertices,
              |  (SELECT count(*) FROM e1)::BIGINT AS n_edges,
              |  (SELECT count(DISTINCT label) FROM c1)::BIGINT
              |    AS n_components,
              |  (SELECT max(n) FROM (SELECT count(*) AS n FROM c1
              |     GROUP BY label) t)::BIGINT AS largest_comp
              |UNION ALL
              |SELECT 'before',
              |  (SELECT count(*) FROM c0)::BIGINT,
              |  (SELECT count(*) FROM e0)::BIGINT,
              |  (SELECT count(DISTINCT label) FROM c0)::BIGINT,
              |  (SELECT max(n) FROM (SELECT count(*) AS n FROM c0
              |     GROUP BY label) t)::BIGINT
              |ORDER BY phase""".stripMargin
        .replaceFirst("WITH ", "WITH RECURSIVE ")),
      (s, d) => {
        val e0 = partEdgeTable(s, d).cache()
        val sym = e0.select(col("src"), col("dst"))
          .union(e0.select(col("dst").as("src"), col("src").as("dst")))
        val hubs = sym.groupBy(col("src").as("v"))
          .agg(count(lit(1)).as("deg"))
          .orderBy(col("deg").desc, col("v")).limit(HubK)
          .select("v")
        val e1 = e0
          .join(hubs.select(col("v").as("src")), Seq("src"), "left_anti")
          .join(hubs.select(col("v").as("dst")), Seq("dst"), "left_anti")
          .select("src", "dst").cache()
        def profile(edges: org.apache.spark.sql.DataFrame,
            phase: String) = {
          val comp = graft.ops.Dedup.nearDupComponents(
            edges.select(col("src").as("doc_a"), col("dst").as("doc_b")))
          // comp has ONE consumer (the sizes agg): vertices = Σ sizes,
          // components = |sizes|, largest = max — no second branch to
          // race the components computation (the q283 lesson)
          val sizes = comp.groupBy(col("label"))
            .agg(count(lit(1)).as("_n"))
          sizes.agg(sum(col("_n")).as("n_vertices"),
              count(lit(1)).as("n_components"),
              max(col("_n")).as("largest_comp"))
            .crossJoin(broadcast(edges.agg(count(lit(1)).as("n_edges"))))
            .select(lit(phase).as("phase"), col("n_vertices"),
              col("n_edges"), col("n_components"), col("largest_comp"))
        }
        profile(e1, "after").unionAll(profile(e0, "before"))
          .orderBy("phase")
      }))
}
