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

    // Pairwise label-blocked similarity stats: mean cosine within each
    // label (sums are order-sensitive at 1e-16 → round aggressively after
    // stable per-pair rounding).
    Q("q34_label_cohesion",
      Some("""WITH pairs AS (
             |  SELECT a.label,
             |    round(list_cosine_similarity(a.embedding::DOUBLE[],
             |      b.embedding::DOUBLE[]), 9) AS sim
             |  FROM embeddings a JOIN embeddings b
             |    ON a.label = b.label AND a.vec_id < b.vec_id)
             |SELECT label, count(*) AS n_pairs, round(avg(sim), 6) AS mean_sim
             |FROM pairs WHERE sim IS NOT NULL
             |GROUP BY label ORDER BY label""".stripMargin),
      (s, d) => {
        import graft.expr.VectorKernels.cosine_sim
        val a = embeddings(s, d)
          .select(col("vec_id").as("ida"), col("label"), col("embedding").as("ea"))
        val b = embeddings(s, d)
          .select(col("vec_id").as("idb"), col("label").as("label_b"),
            col("embedding").as("eb"))
        a.join(b, col("label") === col("label_b") && col("ida") < col("idb"))
          .withColumn("sim", round(cosine_sim(col("ea"), col("eb")), 9))
          .filter(col("sim").isNotNull)
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_pairs"), round(avg(col("sim")), 6).as("mean_sim"))
          .orderBy("label")
      })
  )
}
