package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.util.Tables._

/** Similarity-search queries over `embeddings` (vec_id, array<float> x64,
  * label). Cosine values are computed in double in both engines; DuckDB's
  * list_cosine_similarity differs from a sequential loop by ~1e-17 ulps, so
  * displayed sims are rounded to 9 decimals and every rank is tie-broken by
  * neighbor id (a rank flip would need two sims within 1e-17 — not
  * observable with random float vectors).
  */
object VectorQueries {

  private val QLim = 5 // query vectors: vec_id < 5

  val all: Seq[Q] = Seq(

    // Brute-force exact cosine top-10 (the correctness baseline).
    Q("q32_cosine_topk",
      Some(s"""WITH q AS (
              |  SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe
              |  FROM embeddings WHERE vec_id < $QLim),
              |sims AS (
              |  SELECT q.q_id, e.vec_id AS neighbor_id,
              |    list_cosine_similarity(e.embedding::DOUBLE[], q.qe) AS sim
              |  FROM embeddings e, q WHERE e.vec_id <> q.q_id),
              |ranked AS (
              |  SELECT q_id, neighbor_id, round(sim, 9) AS sim_r,
              |    row_number() OVER (PARTITION BY q_id
              |      ORDER BY sim DESC, neighbor_id) AS rn
              |  FROM sims WHERE sim IS NOT NULL)
              |SELECT q_id, rn, neighbor_id, sim_r FROM ranked
              |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin),
      (s, d) => {
        val emb = embeddings(s, d)
        Similarity.cosineTopK(emb, emb.filter(col("vec_id") < QLim), 10)
          .orderBy("q_id", "rn")
      }),

    // IVF-style ANN: centroids = vec_id % 50 == 0, nprobe 2, top-5.
    Q("q33_ann_ivf",
      Some(s"""WITH cent AS (
              |  SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
              |  FROM embeddings WHERE vec_id % 50 = 0),
              |assign AS (
              |  SELECT vec_id, cid, embedding FROM (
              |    SELECT e.vec_id, c.cid, e.embedding,
              |      row_number() OVER (PARTITION BY e.vec_id
              |        ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.ce)
              |          DESC, c.cid) AS crn
              |    FROM embeddings e, cent c
              |    WHERE list_cosine_similarity(e.embedding::DOUBLE[], c.ce)
              |      IS NOT NULL) t
              |  WHERE crn = 1),
              |probes AS (
              |  SELECT q_id, qe, cid FROM (
              |    SELECT e.vec_id AS q_id, e.embedding::DOUBLE[] AS qe, c.cid,
              |      row_number() OVER (PARTITION BY e.vec_id
              |        ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.ce)
              |          DESC, c.cid) AS qcrn
              |    FROM embeddings e, cent c
              |    WHERE e.vec_id < $QLim
              |      AND list_cosine_similarity(e.embedding::DOUBLE[], c.ce)
              |        IS NOT NULL) t
              |  WHERE qcrn <= 2),
              |ranked AS (
              |  SELECT p.q_id, a.vec_id AS neighbor_id,
              |    round(list_cosine_similarity(a.embedding::DOUBLE[], p.qe), 9)
              |      AS sim_r,
              |    row_number() OVER (PARTITION BY p.q_id
              |      ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], p.qe)
              |        DESC, a.vec_id) AS rn
              |  FROM assign a JOIN probes p ON a.cid = p.cid
              |  WHERE a.vec_id <> p.q_id
              |    AND list_cosine_similarity(a.embedding::DOUBLE[], p.qe)
              |      IS NOT NULL)
              |SELECT q_id, rn, neighbor_id, sim_r FROM ranked
              |WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin),
      (s, d) => {
        val emb = embeddings(s, d)
        Similarity.ivfTopK(
          emb,
          emb.filter(col("vec_id") % 50 === 0),
          emb.filter(col("vec_id") < QLim),
          k = 5, nprobe = 2)
          .orderBy("q_id", "rn")
      }),

    // Mean pairwise cosine within each label via the normalized-sum
    // identity (Σ_{i<j} cos = (‖Σv̂‖² − n)/2) — one O(n·d) hash-agg, no
    // join; see Similarity.labelCohesion. The oracle computes the same
    // closed form with the same left-associated norm folds.
    Q("q34_label_cohesion", {
      val dim = 64
      val sums = (0 until dim).map(i => s"sum(v[${i + 1}]) AS s$i")
        .mkString(",\n             |    ")
      val sumSq = (0 until dim).map(i => s"s$i * s$i").mkString(" + ")
      Some(s"""WITH pre AS (
              |  SELECT label, embedding::DOUBLE[] AS e,
              |    sqrt(list_reduce(list_transform(embedding::DOUBLE[],
              |      y -> y * y), (a, b) -> a + b)) AS nrm
              |  FROM embeddings),
              |nv AS (
              |  SELECT label, list_transform(e, x -> x / nrm) AS v
              |  FROM pre WHERE nrm > 0),
              |g AS (
              |  SELECT label, count(*) AS n,
              |    $sums
              |  FROM nv GROUP BY label)
              |SELECT label, CAST(n * (n - 1) / 2 AS BIGINT) AS n_pairs,
              |  CASE WHEN n > 1
              |       THEN round(($sumSq - n) / (n * (n - 1)), 6)
              |  END AS mean_sim
              |FROM g ORDER BY label""".stripMargin)
    },
      (s, d) => graft.ops.Similarity
        .labelCohesion(embeddings(s, d), "label", "embedding", 64)
        .orderBy("label")),

    // One k-means step (IVF centroid training): E-step assignment to the
    // nearest of the q33 seed centroids, M-step per-(cell, dim) means in
    // long form. Assignment ranking reuses the q33-proven cosine order;
    // the mean is round(6)-absorbed like labelCohesion.
    Q("q69_kmeans_step",
      Some("""WITH cent AS (
             |  SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
             |  FROM embeddings WHERE vec_id % 50 = 0),
             |assign AS (
             |  SELECT cid, embedding FROM (
             |    SELECT e.vec_id, c.cid, e.embedding,
             |      row_number() OVER (PARTITION BY e.vec_id
             |        ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.ce)
             |          DESC, c.cid) AS crn
             |    FROM embeddings e, cent c
             |    WHERE list_cosine_similarity(e.embedding::DOUBLE[], c.ce)
             |      IS NOT NULL) t
             |  WHERE crn = 1),
             |ex AS (
             |  SELECT cid, g.i - 1 AS dim, e[g.i] AS x
             |  FROM (SELECT cid, embedding::DOUBLE[] AS e FROM assign) a,
             |   unnest(generate_series(1, 64)) AS g(i))
             |SELECT cid, dim, count(*) AS n, round(avg(x), 6) AS c
             |FROM ex GROUP BY cid, dim ORDER BY cid, dim""".stripMargin),
      (s, d) => {
        val emb = embeddings(s, d)
        Similarity.centroidUpdate(emb, emb.filter(col("vec_id") % 50 === 0))
          .orderBy("cid", "dim")
      }),

    // ANN honesty audit — the vector twin of q262/q279: recall@5 of
    // the IVF path (q33's centroids/nprobe) against the brute-force
    // exact top-5 (q32's baseline) per query vector. The number an ANN
    // index must publish before anyone trusts "approximate": how much
    // of the true neighborhood does nprobe=2 actually see. Both sides
    // rank with the same (sim DESC, neighbor_id) total order, so the
    // set intersection is engine-stable.
    Q("q282_ann_recall",
      Some(s"""WITH q AS (
              |  SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe
              |  FROM embeddings WHERE vec_id < $QLim),
              |sims AS (
              |  SELECT q.q_id, e.vec_id AS neighbor_id,
              |    list_cosine_similarity(e.embedding::DOUBLE[], q.qe) AS sim
              |  FROM embeddings e, q WHERE e.vec_id <> q.q_id),
              |exact AS (
              |  SELECT q_id, neighbor_id FROM (
              |    SELECT q_id, neighbor_id,
              |      row_number() OVER (PARTITION BY q_id
              |        ORDER BY sim DESC, neighbor_id) AS rn
              |    FROM sims WHERE sim IS NOT NULL) t
              |  WHERE rn <= 5),
              |cent AS (
              |  SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
              |  FROM embeddings WHERE vec_id % 50 = 0),
              |assign AS (
              |  SELECT vec_id, cid, embedding FROM (
              |    SELECT e.vec_id, c.cid, e.embedding,
              |      row_number() OVER (PARTITION BY e.vec_id
              |        ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.ce)
              |          DESC, c.cid) AS crn
              |    FROM embeddings e, cent c
              |    WHERE list_cosine_similarity(e.embedding::DOUBLE[], c.ce)
              |      IS NOT NULL) t
              |  WHERE crn = 1),
              |probes AS (
              |  SELECT q_id, qe, cid FROM (
              |    SELECT e.vec_id AS q_id, e.embedding::DOUBLE[] AS qe, c.cid,
              |      row_number() OVER (PARTITION BY e.vec_id
              |        ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.ce)
              |          DESC, c.cid) AS qcrn
              |    FROM embeddings e, cent c
              |    WHERE e.vec_id < $QLim
              |      AND list_cosine_similarity(e.embedding::DOUBLE[], c.ce)
              |        IS NOT NULL) t
              |  WHERE qcrn <= 2),
              |ivf AS (
              |  SELECT q_id, neighbor_id FROM (
              |    SELECT p.q_id, a.vec_id AS neighbor_id,
              |      row_number() OVER (PARTITION BY p.q_id
              |        ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], p.qe)
              |          DESC, a.vec_id) AS rn
              |    FROM assign a JOIN probes p ON a.cid = p.cid
              |    WHERE a.vec_id <> p.q_id
              |      AND list_cosine_similarity(a.embedding::DOUBLE[], p.qe)
              |        IS NOT NULL) t
              |  WHERE rn <= 5)
              |SELECT e.q_id, count(*)::BIGINT AS n_exact,
              |  sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0
              |    END)::BIGINT AS n_found,
              |  round(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1
              |    ELSE 0 END) / count(*), 6) AS recall_r
              |FROM exact e LEFT JOIN ivf i
              |  ON e.q_id = i.q_id AND e.neighbor_id = i.neighbor_id
              |GROUP BY 1 ORDER BY e.q_id""".stripMargin),
      (s, d) => {
        val emb = embeddings(s, d)
        val qs = emb.filter(col("vec_id") < QLim)
        val exact = Similarity.cosineTopK(emb, qs, 5)
          .select(col("q_id"), col("neighbor_id"))
        val ivf = Similarity.ivfTopK(
            emb, emb.filter(col("vec_id") % 50 === 0), qs,
            k = 5, nprobe = 2)
          .select(col("q_id"), col("neighbor_id"))
        exact
          .join(ivf.withColumn("_hit", lit(1)),
            Seq("q_id", "neighbor_id"), "left")
          .groupBy(col("q_id"))
          .agg(count(lit(1)).as("n_exact"),
            sum(when(col("_hit").isNotNull, 1L).otherwise(0L))
              .as("n_found"))
          .select(col("q_id"), col("n_exact"), col("n_found"),
            round(col("n_found").cast("double")
              / nullif(col("n_exact").cast("double"), lit(0.0)), 6)
              .as("recall_r"))
          .orderBy("q_id")
      })
  )
}
