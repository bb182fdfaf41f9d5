package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Curation, Dedup, Pack, Similarity, TextOps}
import graft.streaming.StreamQuota
import graft.util.Tables._

/** Round-6 continuation batch — the corpus-placement / selection surface:
  * segment-level exact dedup (the repeated-passage remover), DSIR-style
  * hashed importance weights (target-likeness scoring), weighted
  * rendezvous sharding with its minimal-disruption proof, cluster-quota
  * balanced sampling, n-gram novelty, and the streaming per-key
  * admission cap. Oracle constants are interpolated from the same Scala
  * values the ops receive.
  */
object PipelineQueries {

  private val normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

  // q150: 8-token non-overlapping segments
  private val SegTokens = 8

  // q151: 1024 hashed-unigram buckets; target exemplars = lang 'en'
  private val DsirBuckets = 1024

  // q152: integer-weighted shards; the reduced assignment drops the
  // heaviest shard to exhibit the minimal-disruption property
  private val Shards = Seq("s0" -> 1, "s1" -> 1, "s2" -> 2, "s3" -> 4)
  private val DroppedShard = "s3"

  // q153: IVF cells from every 50th vector (q33's centroid rule), 10
  // kept per cell in md5 order
  private val QuotaK = 10

  // q154: word trigrams
  private val NovN = 3

  // q155: first 150 events admitted per event_type — binds at sf0.001
  // (~200/type) and sf0.01 (~2000/type) alike
  private val AdmitCap = 150L

  val all: Seq[Q] = Seq(

    // Segment-level exact dedup: 8-token segments, keep-first by
    // (doc_id, seg_idx); per-doc survival accounting. The oracle's
    // row_number-over-segment-text is the semantics; the op computes the
    // same first-occurrence with a partial-aggregated min(struct) so a
    // boilerplate-hot segment never lands on one sort task.
    Q("q150_segment_dedup",
      Some(s"""WITH t AS (
              |  SELECT doc_id, string_split($normSql, ' ') AS toks
              |  FROM documents),
              |s AS (
              |  SELECT doc_id, toks,
              |    unnest(generate_series(0, len(toks) - 1, $SegTokens))
              |      AS start
              |  FROM t),
              |seg AS (
              |  SELECT doc_id, (start // $SegTokens)::BIGINT AS seg_idx,
              |    len(toks[start+1 : start+$SegTokens])::BIGINT AS n_toks,
              |    array_to_string(toks[start+1 : start+$SegTokens], ' ')
              |      AS seg_text
              |  FROM s),
              |r AS (
              |  SELECT *, row_number() OVER (PARTITION BY seg_text
              |    ORDER BY doc_id, seg_idx) AS rn
              |  FROM seg)
              |SELECT doc_id, count(*)::BIGINT AS n_segs,
              |  sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup,
              |  sum(CASE WHEN rn = 1 THEN n_toks ELSE 0 END)::BIGINT
              |    AS kept_tokens,
              |  sum(n_toks)::BIGINT AS total_tokens,
              |  round(sum(CASE WHEN rn = 1 THEN n_toks ELSE 0 END) * 1.0
              |    / sum(n_toks), 6) AS kept_r
              |FROM r GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => Dedup.segmentDedup(documents(s, d), "doc_id", "text",
          SegTokens)
        .orderBy("doc_id")),

    // DSIR hashed importance weights: add-half-smoothed
    // log p_target − log p_raw per md5 token bucket, doc score = mean
    // over token instances. All-double work rounds only at the final
    // emit (6 dp), the established float posture.
    Q("q151_dsir_weights",
      Some(s"""WITH tok AS (
              |  SELECT doc_id, lang = 'en' AS tgt,
              |    unnest(string_split($normSql, ' ')) AS w
              |  FROM documents),
              |b AS (
              |  SELECT doc_id, tgt,
              |    ('0x' || substr(md5(w), 1, 15))::BIGINT % $DsirBuckets
              |      AS bk
              |  FROM tok),
              |ct AS (
              |  SELECT bk, (count(*) FILTER (WHERE tgt))::BIGINT AS c_t,
              |    count(*)::BIGINT AS c_r
              |  FROM b GROUP BY 1),
              |tot AS (SELECT sum(c_t)::BIGINT AS t_t,
              |               sum(c_r)::BIGINT AS t_r FROM ct),
              |lw AS (
              |  SELECT bk,
              |    ln((c_t::DOUBLE + 0.5) / (t_t::DOUBLE
              |        + 0.5 * $DsirBuckets))
              |    - ln((c_r::DOUBLE + 0.5) / (t_r::DOUBLE
              |        + 0.5 * $DsirBuckets)) AS lw
              |  FROM ct, tot)
              |SELECT doc_id, count(*)::BIGINT AS n_tokens,
              |  round(avg(lw), 6) AS logw_r
              |FROM b JOIN lw USING (bk)
              |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => Curation.importanceWeights(
          documents(s, d).withColumn("is_tgt", col("lang") === "en"),
          "doc_id", "text", "is_tgt", DsirBuckets)
        .orderBy("doc_id")),

    // Weighted rendezvous sharding, assignment stability as DATA: the
    // transition matrix full-set → without-s3. Minimal disruption means
    // every off-diagonal row has shard_full = 's3'; any other movement
    // would be a hash-arithmetic divergence, so the oracle doubles as an
    // exactness gate (same posture as q138's one-sided-error matrix).
    Q("q152_rendezvous_shards", {
      val values = Shards.map { case (s, w) => s"('$s', $w)" }
        .mkString(", ")
      Some(s"""WITH sh AS (
              |  SELECT * FROM (VALUES $values) AS t(shard, w)),
              |vn AS (
              |  SELECT shard, unnest(generate_series(0, w - 1)) AS v
              |  FROM sh),
              |h AS (
              |  SELECT d.doc_id, vn.shard, vn.v,
              |    ('0x' || substr(md5(d.doc_id::VARCHAR || '#' ||
              |      vn.shard || '#' || vn.v::VARCHAR), 1, 15))::BIGINT
              |      AS hv
              |  FROM documents d, vn),
              |fa AS (
              |  SELECT doc_id, shard FROM (
              |    SELECT doc_id, shard, row_number() OVER (
              |      PARTITION BY doc_id
              |      ORDER BY hv DESC, shard DESC, v DESC) AS rn
              |    FROM h) t WHERE rn = 1),
              |ra AS (
              |  SELECT doc_id, shard FROM (
              |    SELECT doc_id, shard, row_number() OVER (
              |      PARTITION BY doc_id
              |      ORDER BY hv DESC, shard DESC, v DESC) AS rn
              |    FROM h WHERE shard <> '$DroppedShard') t WHERE rn = 1)
              |SELECT fa.shard AS shard_full, ra.shard AS shard_reduced,
              |  count(*)::BIGINT AS n
              |FROM fa JOIN ra USING (doc_id)
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
      },
      (s, d) => {
        val ids = documents(s, d).select(col("doc_id"))
        val full = Pack.rendezvousAssign(ids, "doc_id", Shards)
          .withColumnRenamed("shard", "shard_full")
        val reduced = Pack.rendezvousAssign(ids, "doc_id",
            Shards.filterNot(_._1 == DroppedShard))
          .withColumnRenamed("shard", "shard_reduced")
        full.join(reduced, Seq("doc_id"))
          .groupBy(col("shard_full"), col("shard_reduced"))
          .agg(count(lit(1)).as("n"))
          .orderBy("shard_full", "shard_reduced")
      }),

    // Cluster-quota balanced sampling: q33's cosine cell assignment
    // (broadcast centroids) composed with capPerKey in md5 order — the
    // "no cell dominates the sample" curation step. Pure composition of
    // existing ops; no new machinery.
    Q("q153_cluster_quota",
      Some(s"""WITH cent AS (
              |  SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
              |  FROM embeddings WHERE vec_id % 50 = 0),
              |assign AS (
              |  SELECT vec_id, cid FROM (
              |    SELECT e.vec_id, c.cid,
              |      row_number() OVER (PARTITION BY e.vec_id
              |        ORDER BY list_cosine_similarity(
              |          e.embedding::DOUBLE[], c.ce) DESC, c.cid) AS crn
              |    FROM embeddings e, cent c
              |    WHERE list_cosine_similarity(e.embedding::DOUBLE[],
              |      c.ce) IS NOT NULL) t
              |  WHERE crn = 1),
              |r AS (
              |  SELECT cid, vec_id, row_number() OVER (PARTITION BY cid
              |    ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))
              |      ::BIGINT, vec_id) AS rn
              |  FROM assign)
              |SELECT cid, vec_id FROM r WHERE rn <= $QuotaK
              |ORDER BY cid, vec_id""".stripMargin),
      (s, d) => {
        val emb = embeddings(s, d)
        val assigned = Similarity.assignCells(emb,
            emb.filter(col("vec_id") % 50 === 0))
          .select(col("vec_id"), col("cid"))
        Curation.capPerKey(assigned, "cid", QuotaK,
            TextOps.hash60(col("vec_id").cast("string")), col("vec_id"))
          .select(col("cid"), col("vec_id"))
          .orderBy("cid", "vec_id")
      }),

    // N-gram novelty: fraction of a doc's distinct trigrams that occur
    // in no other doc (per-gram doc counts reuse q110's gram CTE shape).
    Q("q154_ngram_novelty",
      Some(s"""WITH t AS (
              |  SELECT doc_id, string_split($normSql, ' ') AS toks
              |  FROM documents),
              |g AS (
              |  SELECT DISTINCT doc_id,
              |    array_to_string(toks[i : i + ${NovN - 1}], ' ') AS gram
              |  FROM t, unnest(generate_series(1, len(toks)
              |    - ${NovN - 1})) AS s(i)
              |  WHERE len(toks) >= $NovN),
              |gd AS (SELECT gram, count(*)::BIGINT AS nd
              |       FROM g GROUP BY 1)
              |SELECT doc_id, count(*)::BIGINT AS n_grams,
              |  sum(CASE WHEN nd = 1 THEN 1 ELSE 0 END)::BIGINT
              |    AS n_novel,
              |  round(sum(CASE WHEN nd = 1 THEN 1 ELSE 0 END) * 1.0
              |    / count(*), 6) AS novel_r
              |FROM g JOIN gd USING (gram)
              |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => TextOps.ngramNovelty(documents(s, d), "doc_id", "text",
          NovN)
        .orderBy("doc_id")),

    // Streaming per-key admission cap through the real streaming engine
    // (AvailableNow): first 150 events per type in (ts, id) order, each
    // stamped with its admission index; constant 8-byte state per key.
    Q("q155_stream_quota",
      Some(s"""WITH r AS (
              |  SELECT event_type, event_id,
              |    row_number() OVER (PARTITION BY event_type
              |      ORDER BY ts, event_id) AS rn
              |  FROM events)
              |SELECT event_type, rn::BIGINT AS admit_idx, event_id
              |FROM r WHERE rn <= $AdmitCap
              |ORDER BY 1, 2""".stripMargin),
      (s, d) => StreamQuota.admitted(s, d, AdmitCap)
        .orderBy("event_type", "admit_idx"))
  )
}
