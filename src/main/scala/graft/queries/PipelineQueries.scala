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

  // q157: budget = 80% of corpus tokens — the mixed regime (some langs
  // saturated, some capped) at sf0.001/0.01/0.1 alike
  private val WfFrac = 0.8

  // q158: α = 0.5 temperature, 250-doc target
  private val TempAlpha = 0.5
  private val TempTarget = 250L

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
        .orderBy("event_type", "admit_idx")),

    // Shingle CONTAINMENT on the LSH candidates — the asymmetric
    // complement of q30's Jaccard: c(A→B) = |S_A ∩ S_B| / |S_A| flags a
    // small doc quoted inside a big one, which symmetric Jaccard
    // dilutes. Pure composition: jaccardForPairs already carries
    // n_inter/n_a/n_b; this projects the two ratios. Recall caveat
    // (documented): candidates come from minhash-LSH, which targets
    // Jaccard — a containment-first pipeline would band on the smaller
    // doc's shingles instead.
    Q("q156_containment_pairs",
      Some(s"""${TextQueries.bandsCte},
              |counts AS (SELECT doc_id, count(*) AS n FROM hashed
              |           GROUP BY doc_id),
              |inter AS (
              |  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
              |  FROM cand c
              |  JOIN hashed ha ON ha.doc_id = c.doc_a
              |  JOIN hashed hb ON hb.doc_id = c.doc_b AND hb.h = ha.h
              |  GROUP BY c.doc_a, c.doc_b)
              |SELECT i.doc_a, i.doc_b, n_inter::BIGINT AS n_inter,
              |  ca.n::BIGINT AS n_a, cb.n::BIGINT AS n_b,
              |  round(n_inter::DOUBLE / ca.n, 6) AS c_ab_r,
              |  round(n_inter::DOUBLE / cb.n, 6) AS c_ba_r
              |FROM inter i
              | JOIN counts ca ON ca.doc_id = i.doc_a
              | JOIN counts cb ON cb.doc_id = i.doc_b
              |ORDER BY doc_a, doc_b""".stripMargin),
      (s, d) => {
        // both trunks come from the persisted bucketed layouts (the
        // round-12 LSH migration): candidates from the band index,
        // the containment verify from the shingle table — nothing is
        // re-shingled or re-minhashed per run
        val shingles = docShingleTable(s, d)
        val pairs = Dedup.bandJoin(docBandTable(s, d), "doc_id",
          "doc_a", "doc_b").cache()
        Dedup.jaccardForPairs(shingles, pairs, "doc_id")
          .select(col("doc_a"), col("doc_b"), col("n_inter"),
            col("n_a"), col("n_b"),
            round(col("n_inter") / col("n_a"), 6).as("c_ab_r"),
            round(col("n_inter") / col("n_b"), 6).as("c_ba_r"))
          .orderBy("doc_a", "doc_b")
      }),

    // Water-filling token-budget allocation across languages: budget =
    // 80% of corpus tokens; small languages keep everything, the rest
    // split the remainder at the water level. 0.8 sits in the mixed
    // regime (some saturated, some capped) at sf0.001/0.01/0.1 alike.
    Q("q157_water_filling",
      Some(s"""WITH n AS (
              |  SELECT lang,
              |    sum(ceil(n_chars / 4)::BIGINT)::DOUBLE AS nt
              |  FROM documents GROUP BY 1),
              |scal AS (SELECT count(*)::DOUBLE AS s, sum(nt) AS total
              |         FROM n),
              |r AS (
              |  SELECT lang, nt,
              |    (row_number() OVER (ORDER BY nt, lang))::DOUBLE AS i,
              |    sum(nt) OVER (ORDER BY nt, lang ROWS BETWEEN
              |      UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              |  FROM n),
              |cand AS (
              |  SELECT i, ($WfFrac::DOUBLE * total - cum) / (s - i)
              |      AS lvl
              |  FROM r, scal
              |  WHERE i < s AND nt <= ($WfFrac::DOUBLE * total - cum)
              |    / (s - i)),
              |lvl AS (
              |  SELECT coalesce(
              |    (SELECT lvl FROM cand ORDER BY i DESC LIMIT 1),
              |    (SELECT $WfFrac::DOUBLE * total / s FROM scal))
              |    AS level)
              |SELECT lang, nt::BIGINT AS n_tokens,
              |  round(least(nt, level), 6) AS alloc_r,
              |  nt <= level AS saturated
              |FROM n, lvl ORDER BY lang""".stripMargin),
      (s, d) => Curation.waterFillAlloc(
          documents(s, d).select(col("lang"),
            ceil(col("n_chars") / 4).cast("long").as("toks")),
          "lang", "toks", WfFrac)
        .orderBy("lang")),

    // Temperature-scaled mixture sampling: per-source keep fractions
    // ∝ n^α / n (α = 0.5 up-weights tail sources), md5-deterministic
    // row keeps, reported as per-source kept counts. The one
    // cross-engine float (pow(n, 0.5)) can only flip a row on a
    // sub-ulp u-vs-frac tie — measure-zero, the q111 posture.
    Q("q158_temperature_mix",
      Some(s"""WITH c AS (
              |  SELECT source, count(*)::DOUBLE AS n FROM documents
              |  GROUP BY 1),
              |w AS (SELECT source, n, pow(n, $TempAlpha) AS w FROM c),
              |tw AS (SELECT sum(w) AS tw FROM w),
              |f AS (
              |  SELECT source, n,
              |    least(1.0::DOUBLE, $TempTarget::DOUBLE * w / tw / n)
              |      AS frac
              |  FROM w, tw),
              |k AS (
              |  SELECT d.source, count(*) AS nk
              |  FROM documents d JOIN f USING (source)
              |  WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))
              |      ::BIGINT::DOUBLE / 1152921504606846976.0 < frac
              |  GROUP BY 1)
              |SELECT f.source, f.n::BIGINT AS n_docs,
              |  coalesce(k.nk, 0)::BIGINT AS n_kept
              |FROM f LEFT JOIN k USING (source)
              |ORDER BY source""".stripMargin),
      (s, d) => {
        val docs = documents(s, d)
        val kept = Curation.temperatureResample(docs, "doc_id", "source",
            TempAlpha, TempTarget)
          .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
        docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
          .join(kept, Seq("source"), "left")
          .select(col("source"), col("n_docs"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"))
          .orderBy("source")
      })
  )
}
