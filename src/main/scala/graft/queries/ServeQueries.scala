package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Bloom, Pack, Quantize, TextOps}
import graft.util.Tables._

/** Round-6 serving/layout batch: the PQ asymmetric-distance search that
  * makes q120's codes useful (the ANN serve path), padding-efficiency
  * length-bucketed batching (the padded-batch complement of q96's
  * concatenate-and-slice packing), and overlapping token-window chunking
  * (RAG / context-window preparation). Oracle constants are interpolated
  * from the same Scala values the ops receive.
  */
object ServeQueries {

  // PQ geometry shared with q120 (ScaleQueries): 4 subspaces × 16 dims,
  // codebook = the 8 lowest-id vectors
  private val PqM = 4
  private val PqDs = 16
  private val PqCells = 8
  // ADC query vector + result size
  private val AdcQueryId = 17
  private val AdcK = 10

  // length-bucket batching: 64-token bands, batches of 16, id-range 128
  // (forces the multi-range two-level path even at sf0.01)
  private val LbWidth = 64
  private val LbBatch = 16
  private val LbRange = 128

  // chunking: 24-token windows starting every 16 tokens (overlap 8)
  private val ChTokens = 24
  private val ChOverlap = 8
  private def chStep = ChTokens - ChOverlap

  // Bloom pre-filter: ~2 bits per sink key at sf0.01 (small on purpose
  // so false positives occur), 3 probes
  private val BloomBits = 2048
  private val BloomK = 3

  // RRF hybrid fusion: k = 60 (the SIGIR'09 constant), depth-50 input
  // lists (lexical BM25 + cosine neighbors of one query vec), top-20 out
  private val RrfK = 60
  private val RrfDepth = 50
  private val RrfTopN = 20
  private val RrfQueryVec = 0

  private val normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

  // the q120 assignment CTEs (sub/cent/a), shared by the ADC oracle so
  // the code side of the search twin cannot drift from the encode twin
  private val pqAssignSql =
    s"""sub AS (
       |  SELECT vec_id, sp.sp AS sp,
       |    (embedding::DOUBLE[])[sp.sp*$PqDs+1 : sp.sp*$PqDs+$PqDs] AS sv
       |  FROM embeddings, unnest(generate_series(0, ${PqM - 1})) AS sp(sp)),
       |cent AS (
       |  SELECT vec_id AS cid, sp, sv AS cv FROM sub
       |  WHERE vec_id < $PqCells),
       |a AS (
       |  SELECT vec_id, sp, cid FROM (
       |    SELECT s.vec_id, s.sp, c.cid,
       |      row_number() OVER (PARTITION BY s.vec_id, s.sp
       |        ORDER BY list_reduce(list_transform(
       |            generate_series(1, $PqDs),
       |            i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i])),
       |            (x, y) -> x + y) ASC, c.cid ASC) AS rn
       |    FROM sub s JOIN cent c USING (sp)) t
       |  WHERE rn = 1)""".stripMargin

  val all: Seq[Q] = Seq(

    // PQ ADC top-k: approximate nearest neighbors of vec 17 computed
    // from the m-byte codes alone — corpus vectors untouched, the LUT
    // (m × |codebook| exact query↔codeword distances) broadcast. The
    // oracle rebuilds the same codes (q120's CTEs) and the same LUT, so
    // encode and search twins stay glued.
    Q("q135_adc_topk",
      Some(s"""WITH $pqAssignSql,
              |q AS (SELECT sp, sv AS qv FROM sub
              |      WHERE vec_id = $AdcQueryId),
              |lut AS (
              |  SELECT c.sp, c.cid,
              |    list_reduce(list_transform(generate_series(1, $PqDs),
              |      i -> (c.cv[i] - q.qv[i]) * (c.cv[i] - q.qv[i])),
              |      (x, y) -> x + y) AS d2
              |  FROM cent c JOIN q USING (sp)),
              |ad AS (
              |  SELECT a.vec_id, sum(l.d2) AS ad
              |  FROM a JOIN lut l ON a.sp = l.sp AND a.cid = l.cid
              |  GROUP BY 1)
              |SELECT CAST(row_number() OVER (ORDER BY ad, vec_id)
              |    AS BIGINT) AS rank,
              |  vec_id, round(ad, 6) AS adist_r
              |FROM ad ORDER BY ad, vec_id LIMIT $AdcK""".stripMargin),
      (s, d) => {
        val emb = embeddings(s, d)
        val codes = Quantize.pqEncode(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < PqCells), "vec_id",
          m = PqM, dim = PqM * PqDs)
        Quantize.adcTopK(codes, "vec_id", "code",
          emb.filter(col("vec_id") === AdcQueryId),
          emb.filter(col("vec_id") < PqCells), "vec_id", "embedding",
          m = PqM, dim = PqM * PqDs, k = AdcK)
      }),

    // Length-bucketed batches: 64-token bands cut into batches of 16 in
    // id order, reporting per-batch padding waste. The oracle's flat
    // per-bucket row_number is exactly what the op's two-level
    // (bucket × id-range) numbering must reproduce.
    Q("q136_length_batches",
      Some(s"""WITH w AS (
              |  SELECT doc_id, ceil(n_chars / 4)::BIGINT AS n_tokens
              |  FROM documents),
              |b AS (
              |  SELECT doc_id, n_tokens,
              |    (n_tokens // $LbWidth)::BIGINT AS bucket
              |  FROM w),
              |r AS (
              |  SELECT *, row_number() OVER (PARTITION BY bucket
              |    ORDER BY doc_id) - 1 AS rn
              |  FROM b),
              |g AS (
              |  SELECT bucket, (rn // $LbBatch)::BIGINT AS batch_idx,
              |    count(*)::BIGINT AS n_docs,
              |    sum(n_tokens)::BIGINT AS sum_tokens,
              |    max(n_tokens)::BIGINT AS max_tokens
              |  FROM r GROUP BY 1, 2)
              |SELECT bucket, batch_idx, n_docs, sum_tokens, max_tokens,
              |  (n_docs * max_tokens - sum_tokens)::BIGINT AS padding
              |FROM g ORDER BY bucket, batch_idx""".stripMargin),
      (s, d) => Pack.lengthBucketBatches(
          documents(s, d).select(col("doc_id"),
            ceil(col("n_chars") / 4).cast("long").as("n_tokens")),
          "doc_id", "n_tokens", bucketWidth = LbWidth,
          batchSize = LbBatch, rangeSize = LbRange)
        .orderBy("bucket", "batch_idx")),

    // Overlapping token-window chunks: 24-token windows every 16 tokens;
    // per-row sequence/slice, corpus explodes only ×⌈n/16⌉.
    Q("q137_chunk_windows",
      Some(s"""WITH t AS (
              |  SELECT doc_id, string_split($normSql, ' ') AS toks
              |  FROM documents),
              |s AS (
              |  SELECT doc_id, toks,
              |    unnest(generate_series(0, len(toks) - 1, $chStep))
              |      AS start
              |  FROM t)
              |SELECT doc_id, (start // $chStep)::BIGINT AS chunk_idx,
              |  start::BIGINT AS start_tok,
              |  len(toks[start+1 : start+$ChTokens])::BIGINT AS n_tokens,
              |  array_to_string(toks[start+1 : start+$ChTokens], ' ')
              |    AS chunk_text
              |FROM s ORDER BY doc_id, chunk_idx""".stripMargin),
      (s, d) => TextOps.chunkWindows(documents(s, d), "doc_id", "text",
          chunkTokens = ChTokens, overlap = ChOverlap)
        .orderBy("doc_id", "chunk_idx")),

    // Bloom pre-filter confusion matrix over the incremental-ETL seam:
    // the filter is built from customers with urgent 1998+ orders (a
    // ~2/3 subset, so true negatives exist and false positives land in
    // the matrix) and probed with every customer. The rollup pins the
    // one-sided-error CONTRACT in the oracle itself: a
    // (maybe=false, actual=true) row can never exist — if the engines'
    // hash arithmetic drifted by one bit, this query would go red. m is
    // sized ~2 bits/key at sf0.01 (deliberately small so false
    // positives actually occur and land in the matrix). The oracle
    // models the filter SEMANTICALLY — bit p is set ⟺ p is in the
    // inserted-position set — because DuckDB raises on `1 << 63` where
    // Spark wraps; the (word, bits) packing itself is pinned against a
    // JVM bit model in BloomSpec.
    Q("q138_bloom_prefilter",
      Some(s"""WITH keys AS (
              |  SELECT DISTINCT o_custkey AS k FROM orders
              |  WHERE o_orderpriority = '1-URGENT'
              |    AND o_orderdate >= TIMESTAMP '1998-01-01'),
              |pos AS (
              |  SELECT DISTINCT ('0x' || substr(md5(k::VARCHAR || '#'
              |    || j::VARCHAR), 1, 15))::BIGINT % $BloomBits AS p
              |  FROM keys, unnest(generate_series(0, ${BloomK - 1}))
              |    AS t(j)),
              |probe AS (
              |  SELECT c_custkey,
              |    ('0x' || substr(md5(c_custkey::VARCHAR || '#'
              |      || j::VARCHAR), 1, 15))::BIGINT % $BloomBits AS p
              |  FROM customer, unnest(generate_series(0, ${BloomK - 1}))
              |    AS t(j)),
              |hit AS (
              |  SELECT c_custkey,
              |    bool_and(p IN (SELECT p FROM pos)) AS maybe
              |  FROM probe GROUP BY 1),
              |act AS (
              |  SELECT c_custkey,
              |    c_custkey IN (SELECT k FROM keys) AS actual
              |  FROM customer)
              |SELECT maybe, actual, count(*)::BIGINT AS n
              |FROM hit JOIN act USING (c_custkey)
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, d) => {
        val sink = orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
          .select(col("o_custkey")).distinct()
        val bloom = Bloom.build(sink, "o_custkey", BloomBits, BloomK)
        val cust = customer(s, d).select(col("c_custkey"))
        val probed = Bloom.mightContain(cust, "c_custkey", bloom,
          BloomBits, BloomK)
        probed
          .join(sink.withColumnRenamed("o_custkey", "c_custkey")
            .withColumn("actual", lit(true)),
            Seq("c_custkey"), "left")
          .select(col("maybe"),
            coalesce(col("actual"), lit(false)).as("actual"))
          .groupBy(col("maybe"), col("actual"))
          .agg(count(lit(1)).as("n"))
          .orderBy("maybe", "actual")
      }),

    // Hybrid-retrieval RRF fusion: the depth-50 lexical list (q100's
    // BM25, via the shared bm25Cte so the twins cannot drift) fused
    // with the depth-50 cosine neighbors of one query vector at
    // k = 60 — no score normalization across the two scales, rank-only.
    Q("q145_rrf_fusion",
      Some(s"""${DepthQueries.bm25Cte},
              |lex AS (
              |  SELECT doc_id,
              |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
              |  FROM (SELECT doc_id, bm25 FROM bm25s
              |        ORDER BY bm25 DESC, doc_id LIMIT $RrfDepth) t),
              |qv AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
              |       WHERE vec_id = $RrfQueryVec),
              |sims AS (
              |  SELECT e.vec_id AS doc_id,
              |    list_cosine_similarity(e.embedding::DOUBLE[], qv.qe)
              |      AS sim
              |  FROM embeddings e, qv WHERE e.vec_id <> $RrfQueryVec),
              |vecr AS (
              |  SELECT doc_id,
              |    row_number() OVER (ORDER BY sim DESC, doc_id) AS rank
              |  FROM sims WHERE sim IS NOT NULL
              |  ORDER BY sim DESC, doc_id LIMIT $RrfDepth),
              |fused AS (
              |  SELECT doc_id, count(*)::BIGINT AS n_lists,
              |    round(sum(1.0 / ($RrfK + rank)), 9) AS rrf
              |  FROM (SELECT * FROM lex UNION ALL SELECT * FROM vecr) u
              |  GROUP BY doc_id)
              |SELECT doc_id, n_lists, rrf FROM fused
              |ORDER BY rrf DESC, doc_id LIMIT $RrfTopN""".stripMargin),
      (s, d) => {
        val lex = graft.ops.Retrieval.bm25TopK(documents(s, d), "doc_id",
            "text", DepthQueries.Bm25Terms, RrfDepth,
            k1 = DepthQueries.Bm25K1, b = DepthQueries.Bm25B)
          // depth-50 list: a driver-scale global window, rank 1-based
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("bm25").desc, col("doc_id"))))
          .select(col("doc_id"), col("rank"))
        val emb = embeddings(s, d)
        val vec = graft.ops.Similarity.cosineTopK(emb,
            emb.filter(col("vec_id") === RrfQueryVec), RrfDepth)
          .select(col("neighbor_id").as("doc_id"), col("rn").as("rank"))
        graft.ops.Retrieval.rrfFuse(Seq(lex, vec), "doc_id", RrfK,
            RrfTopN)
          .orderBy(col("rrf").desc, col("doc_id"))
      })
  )
}
