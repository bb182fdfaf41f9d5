package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.util.Tables._

/** Round-12 embedding-geometry batch: kNN-graph reciprocity, local
  * intrinsic dimensionality, the second eigenpair by deflated power
  * iteration, and the anisotropy-direction audit — the geometry
  * pre-flight numbers an ANN/retrieval deployment reads before sizing
  * its index. All iterative oracles are unrolled CTE chains on the
  * 12-dp grid (the q373 spectral machinery).
  */
object GeometryQueries {

  private val KnnK = 10
  private val EigIters = 8
  private val AnisThreshold = 0.5

  /** The q377 kNN CTE chain, keeping rank and 9-dp sim. */
  private val knnCte =
    s"""WITH sims AS MATERIALIZED (
       |  SELECT q.vec_id AS q_id, e.vec_id AS neighbor_id,
       |    list_cosine_similarity(e.embedding::DOUBLE[],
       |      q.embedding::DOUBLE[]) AS sim
       |  FROM embeddings e, embeddings q
       |  WHERE e.vec_id <> q.vec_id),
       |knn AS MATERIALIZED (
       |  SELECT q_id, rn, neighbor_id, round(sim, 9) AS sim_r FROM (
       |    SELECT q_id, neighbor_id, sim, row_number() OVER (
       |      PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS rn
       |    FROM sims WHERE sim IS NOT NULL) t
       |  WHERE rn <= $KnnK)""".stripMargin

  /** The q373 second-moment CTE chain (ee/ex/me + dims). */
  private val momentCte =
    """WITH ee AS MATERIALIZED (
      |  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
      |ex AS MATERIALIZED (
      |  SELECT e.vec_id, g.i - 1 AS j, e.emb[g.i]::DOUBLE AS x
      |  FROM ee e, unnest(generate_series(1, len(e.emb))) AS g(i)),
      |me AS MATERIALIZED (
      |  SELECT a.j, b.j AS k,
      |    sum(round(a.x * b.x, 12)::DECIMAL(28,12))::DOUBLE AS m
      |  FROM ex a JOIN ex b ON a.vec_id = b.vec_id GROUP BY 1, 2),
      |dims AS MATERIALIZED (SELECT DISTINCT j FROM me)""".stripMargin

  /** Unrolled power iteration over matrix CTE `mat`, vectors named
    * `<pfx>0..<pfx>iters`, ending with `<pfx>lam`. */
  private def powerSql(mat: String, pfx: String): String = {
    val steps = (1 to EigIters).map { i =>
      s"""${pfx}u$i AS MATERIALIZED (
         |  SELECT m.j, sum(round(m.m * v.v, 12)::DECIMAL(28,12))::DOUBLE
         |    AS u
         |  FROM $mat m JOIN $pfx${i - 1} v ON m.k = v.j GROUP BY 1),
         |${pfx}n$i AS MATERIALIZED (
         |  SELECT sqrt(sum(round(u.u * u.u, 12)::DECIMAL(28,12))
         |    ::DOUBLE) AS nrm FROM ${pfx}u$i u),
         |$pfx$i AS MATERIALIZED (
         |  SELECT u.j, u.u / n.nrm AS v FROM ${pfx}u$i u, ${pfx}n$i n)"""
        .stripMargin
    }.mkString(",\n")
    s"""${pfx}0 AS MATERIALIZED (
       |  SELECT j, 1.0 / sqrt((SELECT count(*) FROM dims)::DOUBLE) AS v
       |  FROM dims),
       |$steps,
       |${pfx}uf AS MATERIALIZED (
       |  SELECT m.j, sum(round(m.m * v.v, 12)::DECIMAL(28,12))::DOUBLE
       |    AS u
       |  FROM $mat m JOIN $pfx$EigIters v ON m.k = v.j GROUP BY 1),
       |${pfx}lam AS MATERIALIZED (
       |  SELECT sum(round(v.v * u.u, 12)::DECIMAL(28,12))::DOUBLE AS lam
       |  FROM $pfx$EigIters v JOIN ${pfx}uf u USING (j))""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // kNN-graph reciprocity: mutual-edge rate of the cosine k=10
    // graph — the edge-level hubness readout next to q377.
    Q("q418_knn_reciprocity",
      Some(s"""$knnCte,
              |m AS (
              |  SELECT count(*)::BIGINT AS n_mutual FROM knn a
              |  WHERE EXISTS (SELECT 1 FROM knn b
              |    WHERE b.q_id = a.neighbor_id
              |      AND b.neighbor_id = a.q_id))
              |SELECT (SELECT count(*) FROM knn)::BIGINT AS n_edges,
              |  n_mutual,
              |  round(n_mutual::DOUBLE
              |    / (SELECT count(*) FROM knn)::DOUBLE, 6)
              |    AS reciprocity_r
              |FROM m""".stripMargin),
      (s, d) => {
        val emb = embeddings(s, d)
        Similarity.knnReciprocity(
          Similarity.cosineTopK(emb, emb, KnnK))
      }),

    // Local intrinsic dimensionality (MLE over kNN distance ratios),
    // summarized over the corpus — the effective-dimension number
    // that predicts ANN index behavior better than the ambient d.
    Q("q419_lid_mle",
      Some(s"""$knnCte,
              |dd AS MATERIALIZED (
              |  SELECT q_id, greatest(1.0 - sim_r, 1e-12) AS d
              |  FROM knn),
              |per AS MATERIALIZED (
              |  SELECT q_id, count(*)::DOUBLE AS kq, max(d) AS dk,
              |    sum(round(ln(d), 12)::DECIMAL(28,12))::DOUBLE AS sl
              |  FROM dd GROUP BY 1),
              |lids AS MATERIALIZED (
              |  SELECT q_id,
              |    CASE WHEN sl - kq * round(ln(dk), 12) < 0
              |      THEN -kq / (sl - kq * round(ln(dk), 12)) END AS lid
              |  FROM per)
              |SELECT count(*)::BIGINT AS n_queries,
              |  sum(CASE WHEN lid IS NULL THEN 1 ELSE 0 END)::BIGINT
              |    AS n_degenerate,
              |  round(sum(round(lid, 12)::DECIMAL(28,12))::DOUBLE
              |    / sum(CASE WHEN lid IS NOT NULL THEN 1 ELSE 0 END),
              |    6) AS mean_lid_r,
              |  min(round(lid, 6)) AS min_lid_r,
              |  max(round(lid, 6)) AS max_lid_r
              |FROM lids""".stripMargin),
      (s, d) => {
        val emb = embeddings(s, d)
        Similarity.lidMle(Similarity.cosineTopK(emb, emb, KnnK))
      }),

    // Second eigenpair by DEFLATED power iteration: q373's axis plus
    // the next one — the 2-D principal plane, with the v1·v2
    // orthogonality audit riding the output.
    Q("q420_eigen2_deflation",
      Some(s"""$momentCte,
              |${powerSql("me", "v")},
              |me2 AS MATERIALIZED (
              |  SELECT m.j, m.k,
              |    m.m - lam.lam * vj.v * vk.v AS m
              |  FROM me m
              |  JOIN v$EigIters vj ON m.j = vj.j
              |  JOIN v$EigIters vk ON m.k = vk.j, vlam lam),
              |${powerSql("me2", "w")},
              |dot AS (
              |  SELECT sum(round(a.v * b.v, 12)::DECIMAL(28,12))::DOUBLE
              |    AS dot
              |  FROM v$EigIters a JOIN w$EigIters b USING (j))
              |SELECT a.j, round(a.v, 6) AS loading1_r,
              |  round(b.v, 6) AS loading2_r,
              |  round(vlam.lam, 6) AS lambda1_r,
              |  round(wlam.lam, 6) AS lambda2_r,
              |  round(dot.dot, 6) AS dot12_r
              |FROM v$EigIters a JOIN w$EigIters b USING (j),
              |  vlam, wlam, dot
              |ORDER BY a.j""".stripMargin),
      (s, d) => Similarity.topTwoEigen(embeddings(s, d), EigIters)
        .orderBy("j")),

    // Anisotropy direction: the distribution of cos(x, v1) over the
    // corpus — cone-shaped embedding spaces (mean |cos| high) degrade
    // every similarity-based op upstream of this audit.
    Q("q421_anisotropy_direction",
      Some(s"""$momentCte,
              |${powerSql("me", "v")},
              |per AS MATERIALIZED (
              |  SELECT e.vec_id,
              |    round(sum(round(e.x * v.v, 12)::DECIMAL(28,12))
              |        ::DOUBLE
              |      / nullif(sqrt(sum(round(e.x * e.x, 12)
              |        ::DECIMAL(28,12))::DOUBLE), 0.0), 12) AS c
              |  FROM ex e JOIN v$EigIters v USING (j)
              |  GROUP BY 1)
              |SELECT count(*)::BIGINT AS n,
              |  round(sum(round(c, 12)::DECIMAL(28,12))::DOUBLE
              |    / count(*), 6) AS mean_cos_r,
              |  round(sum(round(abs(c), 12)::DECIMAL(28,12))::DOUBLE
              |    / count(*), 6) AS mean_abs_cos_r,
              |  round(sum(CASE WHEN abs(c) > $AnisThreshold
              |      THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
              |    AS frac_abs_gt_r
              |FROM per""".stripMargin),
      (s, d) => Similarity.anisotropyDirection(embeddings(s, d),
        EigIters, AnisThreshold))
  )
}
