package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Curation, Dedup, Layout, Profile, Similarity, TextOps}
import graft.util.Tables._

/** Round-5 scale batch: substring-level duplication (repeated n-grams),
  * weighted sampling without replacement, Z-order layout clustering,
  * hashed-linear-classifier quality scoring, per-dimension embedding
  * statistics, and SemDeDup-style cluster-partitioned semantic dedup.
  * Oracle constants are interpolated from the same Scala values the
  * engine ops receive, so the twins cannot drift.
  */
object ScaleQueries {

  // shared DuckDB fragments (same single-source convention as
  // TextQueries/DepthQueries)
  private val normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

  // duplicated-n-gram parameters
  private val NGramK = 8
  private val NGramMinDocs = 2

  // weighted-sample parameters
  private val WsK = 25

  // Z-order parameters: 10-bit dims (values are taken mod 2^10), 64
  // buckets = top 6 bits of the 20-bit key
  private val ZBits = 10
  private val ZBucketBits = 6
  private val ZMod = 1 << ZBits

  // SemDeDup parameters: centroids = the SemCells lowest vec_ids
  private val SemCells = 8
  private val SemT = 0.4

  // negative-sampling parameters
  private val NegK = 5
  private val NegBatch = 32

  // JL projection parameters: 64→16 dims (√16 = 4.0 exact), pairs among
  // the 20 lowest vec_ids
  private val JlOut = 16
  private val JlLim = 20

  // label-propagation iteration count (fixed → deterministic)
  private val LpaIters = 3

  // curation-pipeline quality gate (documents.n_chars lower bound)
  private val PipeMinChars = 200

  val all: Seq[Q] = Seq(

    // Cross-document duplicated 8-grams — the substring-level dup signal
    // (boilerplate repeated inside otherwise-distinct docs). Two stacked
    // hash-aggs on the gram; see Dedup.duplicatedNGrams for why not
    // countDistinct (Expand doubles the shuffle for no benefit).
    Q("q110_dup_ngrams",
      Some(s"""WITH toks AS (
              |  SELECT doc_id, string_split($normSql, ' ') AS t
              |  FROM documents),
              |grams AS (
              |  SELECT doc_id, array_to_string(t[i:i+${NGramK - 1}], ' ')
              |    AS gram
              |  FROM toks,
              |    unnest(generate_series(1, len(t) - ${NGramK - 1}))
              |      AS g(i))
              |SELECT gram, count(DISTINCT doc_id)::BIGINT AS n_docs,
              |  count(*)::BIGINT AS n_occurrences
              |FROM grams GROUP BY 1
              |HAVING count(DISTINCT doc_id) >= $NGramMinDocs
              |ORDER BY gram""".stripMargin),
      (s, d) => Dedup.duplicatedNGrams(documents(s, d), "doc_id", "text",
          NGramK, NGramMinDocs)
        .orderBy("gram")),

    // Weighted sampling without replacement (Efraimidis–Spirakis), top-25
    // docs per language weighted by n_chars. The A-ES key ln(u)/w is
    // computed in both engines from the shared md5-hash60 uniform but
    // never emitted — output is all-integer, so float parity can only
    // matter on a sub-ulp key tie (measure-zero; id tie-break pins it).
    Q("q111_weighted_sample",
      Some(s"""WITH w AS (
              |  SELECT lang, doc_id, n_chars,
              |    ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
              |        ::DOUBLE + 1) / 1152921504606846976.0)
              |      / n_chars::DOUBLE AS key
              |  FROM documents WHERE n_chars > 0),
              |r AS (
              |  SELECT lang, doc_id, n_chars,
              |    row_number() OVER (PARTITION BY lang
              |      ORDER BY key DESC, doc_id) AS rank
              |  FROM w)
              |SELECT lang, rank, doc_id, n_chars::BIGINT AS weight
              |FROM r WHERE rank <= $WsK
              |ORDER BY lang, rank""".stripMargin),
      (s, d) => Curation.weightedSampleTopK(documents(s, d), "doc_id",
          "n_chars", "lang", WsK)
        .orderBy("lang", "rank")),

    // Z-order layout effectiveness: Morton-interleave (l_partkey mod 1024,
    // l_suppkey mod 1024), bucket by the key's top 6 bits (one bucket ≈
    // one file of a clustered write), report per-bucket spans — the
    // min/max stats a scan on EITHER column would prune against.
    Q("q112_zorder_layout",
      Some(s"""WITH xy AS (
              |  SELECT l_partkey % $ZMod AS x, l_suppkey % $ZMod AS y
              |  FROM lineitem),
              |z AS (SELECT ${Layout.zOrderKeySql("x", "y", ZBits)} AS z,
              |        x, y FROM xy)
              |SELECT (z >> ${2 * ZBits - ZBucketBits}) AS bucket,
              |  count(*)::BIGINT AS n_rows,
              |  min(x) AS x_min, max(x) AS x_max,
              |  min(y) AS y_min, max(y) AS y_max
              |FROM z GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        val xy = lineitem(s, d).select(
          (col("l_partkey") % ZMod).as("x"),
          (col("l_suppkey") % ZMod).as("y"))
        Layout.zOrderBucketStats(xy, "x", "y", ZBits, ZBucketBits)
          .orderBy("bucket")
      }),

    // Hashed-feature linear classifier score per document — the
    // model-based quality-filter plumbing; integer weight accumulation
    // makes the keep decision bit-exact (see TextOps.hashedLinearScore).
    Q("q113_classifier_score",
      Some(s"""WITH t AS (
              |  SELECT doc_id, string_split($normSql, ' ') AS toks
              |  FROM documents),
              |s AS (
              |  SELECT doc_id, len(toks)::BIGINT AS n_terms,
              |    list_sum(list_transform(toks,
              |      t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 2001
              |        - 1000))::BIGINT AS wsum
              |  FROM t)
              |SELECT doc_id, n_terms,
              |  round(wsum / (n_terms * 1000.0), 9) AS score_r,
              |  round(1.0 / (1.0 + exp(-(wsum / (n_terms * 1000.0)))), 9)
              |    AS prob_r,
              |  wsum > 0 AS keep
              |FROM s ORDER BY doc_id""".stripMargin),
      (s, d) => TextOps.hashedLinearScore(documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // Per-dimension embedding statistics — the feature-scaling /
    // standardization constants (mean/std per dim, clipping bounds).
    // |dims| group keys regardless of corpus size: the shuffle is
    // partials only.
    Q("q114_embedding_dim_stats",
      Some("""WITH ex AS (
             |  SELECT g.i - 1 AS dim, e[g.i] AS x
             |  FROM (SELECT embedding::DOUBLE[] AS e FROM embeddings) t,
             |    unnest(generate_series(1, 64)) AS g(i))
             |SELECT dim, count(*)::BIGINT AS n,
             |  round(sum(x) / count(*), 6) AS mean_r,
             |  round(sqrt(sum(x * x) / count(*)
             |    - (sum(x) / count(*)) * (sum(x) / count(*))), 6) AS std_r,
             |  min(x) AS x_min, max(x) AS x_max
             |FROM ex GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => Profile.arrayDimStats(embeddings(s, d), "embedding")
        .orderBy("dim")),

    // SemDeDup-style semantic dedup: assign to nearest of the 8 lowest-id
    // centroid vectors (broadcast), then exact-cosine near-dup pairs
    // WITHIN each cell only — equi-join on the cell id, never all-pairs.
    // The oracle reuses the q33-proven assignment ranking.
    Q("q115_semantic_dedup",
      Some(s"""WITH cent AS (
              |  SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
              |  FROM embeddings WHERE vec_id < $SemCells),
              |assign AS (
              |  SELECT vec_id, cid, embedding::DOUBLE[] AS v FROM (
              |    SELECT e.vec_id, c.cid, e.embedding,
              |      row_number() OVER (PARTITION BY e.vec_id
              |        ORDER BY
              |          list_cosine_similarity(e.embedding::DOUBLE[], c.ce)
              |          DESC, c.cid) AS crn
              |    FROM embeddings e, cent c
              |    WHERE list_cosine_similarity(e.embedding::DOUBLE[], c.ce)
              |      IS NOT NULL) t
              |  WHERE crn = 1)
              |SELECT x.cid, x.vec_id AS vec_a, y.vec_id AS vec_b,
              |  round(list_cosine_similarity(x.v, y.v), 9) AS cos_sim
              |FROM assign x JOIN assign y
              |  ON x.cid = y.cid AND x.vec_id < y.vec_id
              |WHERE list_cosine_similarity(x.v, y.v) >= $SemT
              |ORDER BY x.cid, vec_a, vec_b""".stripMargin),
      (s, d) => {
        val emb = embeddings(s, d)
        Similarity.semanticNearDupPairs(emb,
            emb.filter(col("vec_id") < SemCells), SemT)
          .orderBy("cid", "vec_a", "vec_b")
      }),

    // Bucketed point-in-interval join: shipments-per-day landed inside
    // each order's [orderdate, orderdate + 1..7d) window. The dense side
    // is pre-aggregated to the bucket granularity (daily counts), then
    // the interval side explodes into its daily buckets and the join is
    // a plain equi-join on the bucket + residual containment filter —
    // never a nested-loop theta join. Left join keeps empty windows at 0.
    Q("q116_interval_point_join",
      Some("""WITH iv AS (
             |  SELECT o_orderkey, o_orderdate AS s,
             |    o_orderdate + (o_orderkey % 7 + 1)::INTEGER
             |      * INTERVAL 1 DAY AS e
             |  FROM orders),
             |daily AS (
             |  SELECT l_shipdate::DATE AS day, count(*)::BIGINT AS n
             |  FROM lineitem GROUP BY 1)
             |SELECT iv.o_orderkey, coalesce(sum(n), 0)::BIGINT AS n_shipped
             |FROM iv LEFT JOIN daily
             |  ON daily.day >= iv.s AND daily.day < iv.e
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        val iv = orders(s, d).select(col("o_orderkey"),
          col("o_orderdate").as("s"),
          expr("timestampadd(DAY, CAST(o_orderkey % 7 + 1 AS INT), " +
            "o_orderdate)").as("e"))
        val daily = lineitem(s, d)
          .groupBy(to_date(col("l_shipdate")).as("day"))
          .agg(count(lit(1)).as("n"))
          .select(col("day").cast("timestamp").as("day_ts"), col("n"))
        val matched = graft.ops.Intervals
          .bucketedPointJoin(iv, "s", "e", daily, "day_ts")
        orders(s, d).select("o_orderkey")
          .join(matched.groupBy("o_orderkey")
            .agg(sum(col("n")).as("n_shipped")), Seq("o_orderkey"), "left")
          .select(col("o_orderkey"),
            coalesce(col("n_shipped"), lit(0L)).as("n_shipped"))
          .orderBy("o_orderkey")
      }),

    // Per-document duplicated-8-gram coverage — the actionable substring
    // dedup signal: what fraction of each doc's tokens sit inside a
    // gram shared with another doc. Equi-joins only (gram membership,
    // then doc rollup); bounded k-explode per matched gram instance.
    Q("q117_dup_coverage",
      Some(s"""WITH toks AS (
              |  SELECT doc_id, string_split($normSql, ' ') AS t
              |  FROM documents),
              |grams AS (
              |  SELECT doc_id, i - 1 AS pos,
              |    array_to_string(t[i:i+${NGramK - 1}], ' ') AS gram
              |  FROM toks,
              |    unnest(generate_series(1, len(t) - ${NGramK - 1}))
              |      AS g(i)),
              |dup AS (
              |  SELECT gram FROM grams GROUP BY 1
              |  HAVING count(DISTINCT doc_id) >= $NGramMinDocs),
              |cov AS (
              |  SELECT DISTINCT g.doc_id, g.pos + o.o AS ti
              |  FROM grams g JOIN dup USING (gram),
              |    unnest(generate_series(0, ${NGramK - 1})) AS o(o)),
              |c AS (
              |  SELECT doc_id, count(*)::BIGINT AS n_covered
              |  FROM cov GROUP BY 1)
              |SELECT t.doc_id, len(t.t)::BIGINT AS n_tokens,
              |  coalesce(c.n_covered, 0)::BIGINT AS n_covered,
              |  round(coalesce(c.n_covered, 0) / len(t.t), 6) AS coverage_r
              |FROM toks t LEFT JOIN c USING (doc_id)
              |ORDER BY t.doc_id""".stripMargin),
      (s, d) => Dedup.dupNGramCoverage(documents(s, d), "doc_id", "text",
          NGramK, NGramMinDocs)
        .orderBy("doc_id")),

    // Bitmap-index EXACT distinct: users per event type via 64-bit word
    // packing + bit_or. The oracle is plain count(DISTINCT) — the bitmap
    // path must equal true distinct by construction; the engine side
    // never plans an Expand and its shuffle carries words, not ids.
    Q("q118_bitmap_distinct",
      Some("""SELECT event_type,
             |  count(DISTINCT user_id)::BIGINT AS n_distinct
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => graft.ops.Bitmaps
        .bitmapDistinct(events(s, d), "event_type", "user_id")
        .orderBy("event_type")),

    // Top-20 within-session event-type trigrams (6h gap sessions) — the
    // behavioral sequence-mining view; ordered collect + row-local
    // n-grams + one count agg + TakeOrdered.
    Q("q119_session_paths",
      Some("""WITH e AS (
             |  SELECT user_id, event_id, ts, event_type,
             |    epoch_us(ts) AS us
             |  FROM events),
             |g AS (
             |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
             |      OR us - lag(us) OVER w > 21600000000 THEN 1 ELSE 0
             |    END AS news
             |  FROM e WINDOW w AS (PARTITION BY user_id
             |    ORDER BY ts NULLS FIRST, event_id)),
             |s AS (
             |  SELECT *, CAST(sum(news) OVER (PARTITION BY user_id
             |    ORDER BY ts NULLS FIRST, event_id
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
             |  FROM g),
             |p AS (
             |  SELECT user_id, session_idx,
             |    list(event_type ORDER BY ts, event_id) AS seq
             |  FROM s GROUP BY 1, 2),
             |grams AS (
             |  SELECT array_to_string(seq[i:i+2], ' ') AS gram
             |  FROM p, unnest(generate_series(1, len(seq) - 2)) AS g(i))
             |SELECT gram, count(*)::BIGINT AS n
             |FROM grams GROUP BY 1
             |ORDER BY n DESC, gram LIMIT 20""".stripMargin),
      (s, d) => graft.ops.Sessionize.sessionPathNGrams(events(s, d),
        "user_id", "ts", "event_id", "event_type",
        gapSeconds = 21600L, n = 3, topK = 20)),

    // Product quantization: 4 subspaces × 16 dims, codebook = the 8
    // lowest-id vectors' subvectors; per-vector code + distortion. The
    // code (the part that must never drift) is decided on bit-identical
    // left-fold L2² values with a code-id tie-break.
    Q("q120_pq_encode",
      Some(s"""WITH sub AS (
              |  SELECT vec_id, sp.sp AS sp,
              |    (embedding::DOUBLE[])[sp.sp*16+1 : sp.sp*16+16] AS sv
              |  FROM embeddings, unnest(generate_series(0, 3)) AS sp(sp)),
              |cent AS (
              |  SELECT vec_id AS cid, sp, sv AS cv FROM sub
              |  WHERE vec_id < $SemCells),
              |a AS (
              |  SELECT vec_id, sp, cid, d2 FROM (
              |    SELECT s.vec_id, s.sp, c.cid,
              |      list_reduce(list_transform(generate_series(1, 16),
              |        i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i])),
              |        (x, y) -> x + y) AS d2,
              |      row_number() OVER (PARTITION BY s.vec_id, s.sp
              |        ORDER BY list_reduce(list_transform(
              |            generate_series(1, 16),
              |            i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i])),
              |            (x, y) -> x + y) ASC, c.cid ASC) AS rn
              |    FROM sub s JOIN cent c USING (sp)) t
              |  WHERE rn = 1)
              |SELECT vec_id,
              |  array_to_string(list(cid ORDER BY sp), ',') AS code,
              |  round(sqrt(sum(d2)), 6) AS qerr_r
              |FROM a GROUP BY 1 ORDER BY vec_id""".stripMargin),
      (s, d) => {
        val emb = embeddings(s, d)
        graft.ops.Quantize.pqEncode(emb, "vec_id", "embedding",
            emb.filter(col("vec_id") < SemCells), "vec_id", m = 4, dim = 64)
          .orderBy("vec_id")
      }),

    // Deterministic in-batch negative sampling (contrastive dataset
    // construction): hash-batches of ~32 docs, 5 negatives per anchor
    // ranked by a pair hash. Self-join is quadratic only within a batch.
    Q("q121_negative_sample",
      Some(s"""WITH n AS (
              |  SELECT greatest(1, CAST(ceil(count(*) / $NegBatch.0)
              |    AS BIGINT)) AS nb
              |  FROM documents),
              |wb AS (
              |  SELECT doc_id,
              |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
              |      % nb AS batch
              |  FROM documents, n),
              |p AS (
              |  SELECT a.doc_id AS anchor_id, b.doc_id AS neg_id,
              |    ('0x' || substr(md5(a.doc_id::VARCHAR || '#'
              |      || b.doc_id::VARCHAR), 1, 15))::BIGINT AS ph
              |  FROM wb a JOIN wb b
              |    ON a.batch = b.batch AND a.doc_id <> b.doc_id),
              |r AS (
              |  SELECT anchor_id, neg_id,
              |    row_number() OVER (PARTITION BY anchor_id
              |      ORDER BY ph, neg_id) AS neg_rank
              |  FROM p)
              |SELECT anchor_id, neg_rank, neg_id FROM r
              |WHERE neg_rank <= $NegK
              |ORDER BY anchor_id, neg_rank""".stripMargin),
      (s, d) => Curation.negativeSample(documents(s, d), "doc_id",
          NegK, NegBatch)
        .orderBy("anchor_id", "neg_rank")),

    // BPE merge-step pair counts: top-30 within-word adjacent character
    // pairs, weighted by word frequency — the tokenizer-training inner
    // loop as one corpus-scale count agg.
    Q("q122_bpe_pairs",
      Some(s"""WITH toks AS (
              |  SELECT string_split($normSql, ' ') AS t FROM documents),
              |w AS (
              |  SELECT u.w AS w FROM toks, unnest(t) AS u(w)
              |  WHERE len(u.w) >= 2),
              |p AS (
              |  SELECT substr(w, i, 2) AS pair
              |  FROM w, unnest(generate_series(1, len(w) - 1)) AS g(i))
              |SELECT pair, count(*)::BIGINT AS n FROM p GROUP BY 1
              |ORDER BY n DESC, pair LIMIT 30""".stripMargin),
      (s, d) => TextOps.bpePairCounts(documents(s, d), "text", 30)),

    // Johnson–Lindenstrauss projection quality: project 64→16 dims via
    // the shared Rademacher planes and report, for every pair among the
    // 20 lowest-id vectors, the original vs projected cosine and the
    // distortion. Projected components are bit-identical across engines
    // (left-fold dot chains ÷ the exact constant 4.0).
    Q("q123_jl_projection", {
      val dots = (0 until JlOut).map(j =>
        s"(${graft.ops.EmbeddingLsh.dotSql("v", j, 64, oneBased = true)})" +
          s" / 4.0").mkString(",\n              |    ")
      def fold(e: String) =
        s"list_reduce(list_transform(generate_series(1, $JlOut), $e), " +
          "(x, y) -> x + y)"
      Some(s"""WITH base AS (
              |  SELECT vec_id, embedding::DOUBLE[] AS v
              |  FROM embeddings WHERE vec_id < $JlLim),
              |pr AS (
              |  SELECT vec_id, v, [
              |    $dots] AS p
              |  FROM base),
              |j AS (
              |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              |    list_cosine_similarity(a.v, b.v) AS co,
              |    ${fold("i -> a.p[i] * b.p[i]")}
              |      / (sqrt(${fold("i -> a.p[i] * a.p[i]")})
              |        * sqrt(${fold("i -> b.p[i] * b.p[i]")})) AS cp
              |  FROM pr a JOIN pr b ON a.vec_id < b.vec_id)
              |SELECT vec_a, vec_b, round(co, 9) AS cos_orig_r,
              |  round(cp, 9) AS cos_proj_r,
              |  round(abs(co - cp), 6) AS err_r
              |FROM j ORDER BY vec_a, vec_b""".stripMargin)
    },
      (s, d) => {
        import graft.expr.VectorKernels.cosine_sim
        val base = embeddings(s, d).filter(col("vec_id") < JlLim)
        val proj = Similarity.randomProject(base, "vec_id", "embedding",
          64, JlOut)
        val joined = base.select(col("vec_id"), col("embedding"))
          .join(proj, "vec_id")
        val a = joined.select(col("vec_id").as("vec_a"),
          col("embedding").as("_va"), col("proj").as("_pa"))
        val b = joined.select(col("vec_id").as("vec_b"),
          col("embedding").as("_vb"), col("proj").as("_pb"))
        def fold(arr: String) =
          s"aggregate($arr, 0D, (acc, x) -> acc + x)"
        val cp = expr(
          s"${fold("zip_with(_pa, _pb, (x, y) -> x * y)")} / " +
            s"(sqrt(${fold("transform(_pa, x -> x * x)")}) * " +
            s"sqrt(${fold("transform(_pb, x -> x * x)")}))")
        a.join(b, col("vec_a") < col("vec_b"))
          .withColumn("_co", cosine_sim(col("_va"), col("_vb")))
          .withColumn("_cp", cp)
          .select(col("vec_a"), col("vec_b"),
            round(col("_co"), 9).as("cos_orig_r"),
            round(col("_cp"), 9).as("cos_proj_r"),
            round(abs(col("_co") - col("_cp")), 6).as("err_r"))
          .orderBy("vec_a", "vec_b")
      }),

    // Incremental aggregate-view maintenance: merge(agg(pre-1998),
    // agg(rest)) must equal agg(orders) — the oracle IS the full
    // recompute, so the identity the incremental path relies on is the
    // thing being checked. round(2) absorbs the re-association of the
    // two partial float sums (the exact sum has 2 decimals).
    Q("q125_incremental_agg",
      Some("""SELECT o_orderpriority, count(*)::BIGINT AS n,
             |  round(sum(o_totalprice), 2) AS sum_r
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        val o = orders(s, d)
        def agg(df: org.apache.spark.sql.DataFrame) = df
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("sum"))
        val cut = lit("1998-01-01").cast("timestamp")
        graft.ops.Cdc.mergeAggState(
            agg(o.filter(col("o_orderdate") < cut)),
            agg(o.filter(col("o_orderdate") >= cut)),
            "o_orderpriority")
          .select(col("o_orderpriority"), col("n"),
            round(col("sum"), 2).as("sum_r"))
          .orderBy("o_orderpriority")
      }),

    // PSI distribution drift of `value` per event type, first half of
    // January vs the rest — fixed 10-bin grid on [0, 500), add-half
    // smoothing. Two count-aggs; no quantile pass. Both sides sum over
    // the FULL type × bin grid (a bin empty in both slices still has a
    // nonzero smoothed term when the totals differ), so the oracle
    // cross-joins the observed types with range(10) exactly like the
    // operator's broadcast bins frame.
    Q("q126_psi_drift",
      Some("""WITH b AS (
             |  SELECT event_type,
             |    CAST(least(greatest(floor(value / 50.0), 0), 9) AS INT)
             |      AS bin,
             |    (ts < TIMESTAMP '2024-01-15') AS is_ref
             |  FROM events),
             |c0 AS (
             |  SELECT event_type, bin,
             |    count(*) FILTER (WHERE is_ref)::BIGINT AS n_ref,
             |    count(*) FILTER (WHERE NOT is_ref)::BIGINT AS n_cur
             |  FROM b GROUP BY 1, 2),
             |c AS (
             |  SELECT g.event_type, bins.bin,
             |    coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
             |  FROM (SELECT DISTINCT event_type FROM c0) g
             |  CROSS JOIN (SELECT range::INT AS bin FROM range(10)) bins
             |  LEFT JOIN c0 USING (event_type, bin)),
             |t AS (
             |  SELECT event_type, sum(n_ref) AS tr, sum(n_cur) AS tc
             |  FROM c GROUP BY 1)
             |SELECT c.event_type,
             |  round(sum(((n_cur + 0.5) / (tc + 5.0)
             |      - (n_ref + 0.5) / (tr + 5.0))
             |    * ln(((n_cur + 0.5) / (tc + 5.0))
             |      / ((n_ref + 0.5) / (tr + 5.0)))), 6) AS psi
             |FROM c JOIN t USING (event_type)
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        val ev = events(s, d)
        val cut = lit("2024-01-15").cast("timestamp")
        graft.ops.Profile.psiDrift(
            ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
            "event_type", "value", lo = 0.0, hi = 500.0, nBins = 10)
          .orderBy("event_type")
      }),

    // Per-group linear trend (regr_slope/regr_intercept of daily counts
    // over the day index) — closed-form distributed regression, one
    // rollup + one regression agg.
    Q("q127_daily_trend",
      Some("""WITH daily AS (
             |  SELECT event_type, date_trunc('day', ts)::DATE AS day,
             |    count(*)::BIGINT AS n
             |  FROM events GROUP BY 1, 2),
             |x AS (
             |  SELECT event_type,
             |    datediff('day', DATE '2024-01-01', day) AS xi, n
             |  FROM daily)
             |SELECT event_type, round(regr_slope(n, xi), 6) AS slope_r,
             |  round(regr_intercept(n, xi), 6) AS icpt_r,
             |  count(*)::BIGINT AS n_days
             |FROM x GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => events(s, d)
        .groupBy(col("event_type"),
          to_date(date_trunc("day", col("ts"))).as("day"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"),
          expr("datediff(day, DATE'2024-01-01')").as("xi"), col("n"))
        .groupBy(col("event_type"))
        .agg(round(expr("regr_slope(n, xi)"), 6).as("slope_r"),
          round(expr("regr_intercept(n, xi)"), 6).as("icpt_r"),
          count(lit(1)).as("n_days"))
        .orderBy("event_type")),

    // Synchronous label propagation (3 fixed iterations) over the q89
    // supplier co-occurrence graph — community detection with the same
    // determinism contract as PageRank (mode of neighbor labels, ties →
    // smallest). The oracle replays the identical update rule.
    Q("q128_label_propagation", {
      val iterCtes = (1 to LpaIters).map { i =>
        s"""l$i AS (
           |  SELECT vertex, label FROM (
           |    SELECT s.dst AS vertex, l.label, count(*) AS c,
           |      row_number() OVER (PARTITION BY s.dst
           |        ORDER BY count(*) DESC, l.label) AS rn
           |    FROM sym s JOIN l${i - 1} l ON s.src = l.vertex
           |    GROUP BY s.dst, l.label) t
           |  WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      Some(s"""${DepthQueries.edgesCte},
              |l0 AS (SELECT src AS vertex, src AS label FROM deg),
              |$iterCtes
              |SELECT vertex, label FROM l$LpaIters
              |ORDER BY vertex""".stripMargin)
    },
      (s, d) => graft.ops.Graphs.labelPropagation(
          suppEdgeTable(s, d),
          LpaIters)
        .orderBy("vertex")),

    // 2-D skyline / Pareto frontier per order priority: minimize
    // orderdate, maximize totalprice — per-x rollup + running max, no
    // NOT EXISTS self-join.
    Q("q129_pareto_frontier",
      Some("""WITH best AS (
             |  SELECT o_orderpriority, o_orderdate,
             |    max(o_totalprice) AS y
             |  FROM orders GROUP BY 1, 2),
             |r AS (
             |  SELECT o_orderpriority, o_orderdate, y,
             |    max(y) OVER (PARTITION BY o_orderpriority
             |      ORDER BY o_orderdate
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      AS pm
             |  FROM best)
             |SELECT o_orderpriority, o_orderdate, y AS o_totalprice
             |FROM r WHERE pm IS NULL OR y > pm
             |ORDER BY o_orderpriority, o_orderdate""".stripMargin),
      (s, d) => graft.ops.Skyline.frontier2D(orders(s, d),
          "o_orderpriority", "o_orderdate", "o_totalprice")
        .orderBy("o_orderpriority", "o_orderdate")),

    // Exact audience overlap between event types via bitmap ALGEBRA:
    // |A∩B| from word AND + popcount, |A∪B| = |A|+|B|−|A∩B| — the id
    // lists are never joined. Oracle: the plain distinct-pair join.
    Q("q130_bitmap_overlap",
      Some("""WITH d AS (
             |  SELECT DISTINCT event_type, user_id FROM events),
             |c AS (
             |  SELECT a.event_type AS key_a, b.event_type AS key_b,
             |    count(*)::BIGINT AS n_common
             |  FROM d a JOIN d b
             |    ON a.user_id = b.user_id AND a.event_type < b.event_type
             |  GROUP BY 1, 2),
             |s AS (
             |  SELECT event_type, count(*)::BIGINT AS n FROM d GROUP BY 1)
             |SELECT c.key_a, c.key_b, c.n_common,
             |  (sa.n + sb.n - c.n_common)::BIGINT AS n_union,
             |  round(c.n_common / (sa.n + sb.n - c.n_common), 6)
             |    AS jaccard_r
             |FROM c JOIN s sa ON sa.event_type = c.key_a
             |  JOIN s sb ON sb.event_type = c.key_b
             |WHERE c.n_common > 0
             |ORDER BY 1, 2""".stripMargin),
      (s, d) => graft.ops.Bitmaps
        .bitmapOverlap(events(s, d), "event_type", "user_id")
        .orderBy("key_a", "key_b")),

    // Association rules over the order→supplier basket: both directed
    // rules per qualifying pair with confidence and lift, top-30 by
    // lift. Supports are hash-aggs; the basket self-join is quadratic
    // only within an order.
    Q("q131_association_rules",
      Some("""WITH items AS (
             |  SELECT DISTINCT l_orderkey AS g, l_suppkey AS i
             |  FROM lineitem),
             |n AS (SELECT count(DISTINCT g)::DOUBLE AS n FROM items),
             |supp AS (SELECT i, count(*)::BIGINT AS s FROM items
             |         GROUP BY 1),
             |pairs AS (
             |  SELECT a.i AS x, b.i AS y, count(*)::BIGINT AS sxy
             |  FROM items a JOIN items b ON a.g = b.g AND a.i < b.i
             |  GROUP BY 1, 2 HAVING count(*) >= 5),
             |rules AS (
             |  SELECT x AS antecedent, y AS consequent, sxy FROM pairs
             |  UNION ALL SELECT y, x, sxy FROM pairs)
             |SELECT r.antecedent, r.consequent,
             |  r.sxy AS pair_support,
             |  round(r.sxy / sa.s, 6) AS confidence_r,
             |  round(n.n * r.sxy / (sa.s * sc.s), 6) AS lift_r
             |FROM rules r JOIN supp sa ON sa.i = r.antecedent
             |  JOIN supp sc ON sc.i = r.consequent, n
             |ORDER BY lift_r DESC, antecedent, consequent
             |LIMIT 30""".stripMargin),
      (s, d) => graft.ops.Graphs.associationRules(lineitem(s, d),
        "l_orderkey", "l_suppkey", minSupport = 5L, topK = 30)),

    // Kaplan–Meier survival of signup→purchase conversion, censoring
    // non-converters at the observation end — time-to-event with the
    // at-risk bookkeeping the naive mean-time-to-convert gets wrong.
    Q("q132_kaplan_meier",
      Some("""WITH su AS (
             |  SELECT user_id, min(ts) AS t0 FROM events
             |  WHERE event_type = 'signup' GROUP BY 1),
             |pu AS (
             |  SELECT e.user_id, min(e.ts) AS t1
             |  FROM events e JOIN su ON su.user_id = e.user_id
             |  WHERE e.event_type = 'purchase' AND e.ts >= su.t0
             |  GROUP BY 1),
             |mx AS (SELECT max(ts) AS tmax FROM events),
             |subj AS (
             |  SELECT CASE WHEN pu.t1 IS NOT NULL
             |      THEN datediff('day', su.t0::DATE, pu.t1::DATE)
             |      ELSE datediff('day', su.t0::DATE, mx.tmax::DATE)
             |    END::BIGINT AS t,
             |    pu.t1 IS NOT NULL AS observed
             |  FROM su LEFT JOIN pu USING (user_id), mx),
             |perT AS (
             |  SELECT t, sum(CASE WHEN observed THEN 1 ELSE 0 END)::BIGINT
             |      AS d,
             |    count(*)::BIGINT AS alln
             |  FROM subj GROUP BY 1),
             |tot AS (SELECT sum(alln) AS n FROM perT),
             |r AS (
             |  SELECT t, d,
             |    (SELECT n FROM tot) - coalesce(sum(alln) OVER (ORDER BY t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS n_risk
             |  FROM perT),
             |f AS (
             |  SELECT t, n_risk::BIGINT AS n_risk, d,
             |    (n_risk - d)::DOUBLE / n_risk AS factor
             |  FROM r WHERE d > 0),
             |s AS (
             |  SELECT t, n_risk, d,
             |    max(CASE WHEN factor = 0 THEN 1 ELSE 0 END) OVER w AS hz,
             |    sum(CASE WHEN factor > 0 THEN ln(factor) ELSE 0 END)
             |      OVER w AS lnsum
             |  FROM f
             |  WINDOW w AS (ORDER BY t
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT t, n_risk, d,
             |  CASE WHEN hz = 1 THEN 0.0 ELSE round(exp(lnsum), 6) END
             |    AS survival_r
             |FROM s ORDER BY t""".stripMargin),
      (s, d) => {
        val ev = events(s, d)
        val su = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("ts")).as("t0"))
        val pu = ev.filter(col("event_type") === "purchase")
          .join(su, "user_id").filter(col("ts") >= col("t0"))
          .groupBy("user_id").agg(min(col("ts")).as("t1"))
        val mx = ev.agg(max(col("ts")).as("tmax"))
        val subj = su.join(pu, Seq("user_id"), "left")
          .crossJoin(broadcast(mx))
          .select(
            when(col("t1").isNotNull,
              datediff(to_date(col("t1")), to_date(col("t0"))))
              .otherwise(datediff(to_date(col("tmax")), to_date(col("t0"))))
              .cast("long").as("t"),
            col("t1").isNotNull.as("observed"))
        graft.ops.Behavior.kaplanMeier(subj, "t", "observed").orderBy("t")
      }),

    // FLAGSHIP COMPOSITION — the end-to-end curation pipeline a corpus
    // actually runs, as ONE oracle-checked query: quality gate
    // (n_chars ≥ MinChars) → exact dedup (min id per content hash) →
    // MinHash-LSH near-dup removal (Jaccard ≥ 0.5) → stable hash split →
    // per-(split, lang) rollup. Every stage is the already-verified
    // library op; what this checks is that they COMPOSE (each stage's
    // output feeds the next with no hidden assumptions about reading the
    // raw table). The oracle rebuilds the identical chain with q61's
    // recursive-closure trunk rebased onto the filtered+deduped source.
    Q("q133_curation_pipeline", {
      val reach = TextQueries.neardupReachCte
        .replace("FROM documents", "FROM src")
        .replaceFirst("WITH RECURSIVE ",
          s"""WITH RECURSIVE src0 AS (
             |  SELECT * FROM documents WHERE n_chars >= $PipeMinChars),
             |keep AS (
             |  SELECT min(doc_id) AS doc_id FROM src0 GROUP BY md5(text)),
             |src AS (SELECT s.* FROM src0 s JOIN keep USING (doc_id)),
             |""".stripMargin)
      Some(s"""$reach,
              |removals AS (
              |  SELECT node AS doc_id FROM (
              |    SELECT node, min(r) AS label FROM reach GROUP BY node)
              |  WHERE label < node),
              |final AS (
              |  SELECT * FROM src
              |  WHERE doc_id NOT IN (SELECT doc_id FROM removals)),
              |sp AS (
              |  SELECT lang, n_chars,
              |    CASE WHEN bucket < 80 THEN 'train'
              |         WHEN bucket < 90 THEN 'val'
              |         ELSE 'test' END AS split
              |  FROM (SELECT lang, n_chars,
              |          ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
              |            % 100 AS bucket
              |        FROM final))
              |SELECT split, lang, count(*)::BIGINT AS n_docs,
              |  sum(n_chars)::BIGINT AS sum_chars
              |FROM sp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    },
      (s, d) => {
        val base = documents(s, d).filter(col("n_chars") >= PipeMinChars)
        val keepers = base
          .groupBy(md5(col("text")).as("_h"))
          .agg(min(col("doc_id")).as("doc_id"))
          .select("doc_id")
        val deduped = base.join(keepers, Seq("doc_id"), "left_semi")
        // near-dup stage on the PERSISTED shingle/band index, semi-
        // filtered to the quality+exact-dedup survivors: shingles and
        // band keys are per-doc pure functions of text, so row-filtering
        // the persisted tables is exactly re-shingling the filtered
        // corpus (the r13 persisted-layout migration applied to the one
        // pipeline that still re-shingled; at 100 TB the corpus shingles
        // once and every stage reads the parquet). The ids frame is
        // materialized once (eager, tiny) and feeds both semi-joins.
        val ids = deduped.select("doc_id").localCheckpoint()
        val removals = withSubsetCoPartition(s)(
          Dedup.nearDupRemovalsOnIndex(
            docShingleTable(s, d).join(ids, Seq("doc_id"), "left_semi"),
            docBandTable(s, d).join(ids, Seq("doc_id"), "left_semi"),
            "doc_id", 0.5))
        val survivors = deduped.join(removals, Seq("doc_id"), "left_anti")
        Curation.hashSplit(survivors, "doc_id")
          .groupBy(col("split"), col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"))
          .orderBy("split", "lang")
      }),

    // Hot-key skew stress for the LSH-family band join (VERDICT r5 ask
    // #6): 80% of the corpus shares ONE band key ('HOT'), the canonical
    // boilerplate-signature pathology. bandJoin's count-window valve
    // must drop that bucket BEFORE the self-join — unpruned, the hot
    // bucket alone is quadratic (4000 docs at sf0.1 → 8M pairs from one
    // key; at 100 TB, game over) — while benign buckets (8 docs each,
    // size CONSTANT in sf because cold ids are grouped by id-range)
    // pair normally. maxBucket=64 fires at every sf (hot = 0.8·n docs).
    // The oracle mirrors the cap arithmetic exactly, so this also pins
    // that both engines prune identically — the no-silent-recall-drop
    // contract MaxBucket's scaladoc promises. SkewValveSpec pins the
    // plan shape (window+filter upstream of the join) and the pair set.
    Q("q134_skew_valve",
      Some("""WITH b AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 5 <> 0 THEN 'HOT'
             |         ELSE CAST(doc_id // 40 AS VARCHAR) END AS bk
             |  FROM documents),
             |sz AS (SELECT bk, count(*) AS n FROM b GROUP BY 1),
             |p AS (SELECT doc_id, bk FROM b JOIN sz USING (bk)
             |      WHERE n <= 64)
             |SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
             |FROM p a JOIN p c ON a.bk = c.bk AND a.doc_id < c.doc_id
             |ORDER BY 1, 2""".stripMargin),
      (s, d) => {
        val bands = documents(s, d).select(col("doc_id"),
          lit(0).as("band"),
          when(col("doc_id") % 5 =!= 0, lit("HOT"))
            .otherwise(expr("CAST(doc_id div 40 AS STRING)")).as("bk"))
        Dedup.bandJoin(bands, "doc_id", "doc_a", "doc_b", maxBucket = 64L)
          .orderBy("doc_a", "doc_b")
      })
  )
}
