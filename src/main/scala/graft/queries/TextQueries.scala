package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Curation, Dedup, TextOps}
import graft.util.Tables._

/** North-star text/dedup surface over `documents` (SURVEY.md §2.12).
  * Oracle SQL strings are generated from the same constants
  * (Dedup.seeds, lang profiles) the Spark operators use, so both engines
  * compute the identical md5-derived pipeline.
  */
object TextQueries {

  // ---- shared DuckDB SQL fragments (single source of truth: Scala consts)
  private[queries] val normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
  private[queries] def hash60Sql(e: String) = s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  /** Shingle CTE: distinct word-3-shingle HASHES per doc (the engine
    * dedups/joins on the 60-bit hash, not the string — see
    * Dedup.shingleTable). Shared with CurationQueries (decontamination
    * runs over the same shingle table). */
  private[queries] val shingleCte =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split($normSql, ' ') AS t FROM documents
       |), sh AS (
       |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
       |  FROM toks, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS g(i)
       |), hashed AS (
       |  SELECT doc_id, ${hash60Sql("shingle")} AS h FROM sh
       |)""".stripMargin

  /** q279: percent of documents in the md5 audit stratum. 50% keeps
    * ~25% of ground-truth pairs in-stratum (pairs need BOTH endpoints
    * sampled) — at 100 TB the knob drops to 1-5% and the exact join's
    * ~p² cost with it. */
  private val RecallSamplePct = 50

  private val sigCte = {
    val mins = Dedup.seeds.zipWithIndex
      .map { case (k, j) => s"min(xor(h, ${k}::BIGINT)) AS m$j" }.mkString(", ")
    s"""$shingleCte, sig AS (
       |  SELECT doc_id, $mins FROM hashed GROUP BY doc_id
       |)""".stripMargin
  }

  /** SimHash CTE: sims(doc_id, simhash) — the 60-bit per-bit-majority
    * hash from the same constants as Dedup.simhash; shared by q31
    * (signatures) and q80 (pigeonhole near-dup join). */
  private val simsCte = {
    val bitSums = (0 until Dedup.SimhashBits)
      .map(i => s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS s$i")
      .mkString(", ")
    val assemble = (0 until Dedup.SimhashBits)
      .map(i => s"CASE WHEN s$i > 0 THEN ${1L << i}::BIGINT ELSE 0 END")
      .mkString(" + ")
    s"""WITH tok AS (
       |  SELECT DISTINCT doc_id, t.tok FROM (
       |    SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok
       |    FROM documents) t
       |), hashed AS (
       |  SELECT doc_id, ${hash60Sql("tok")} AS h FROM tok
       |), sums AS (
       |  SELECT doc_id, $bitSums FROM hashed GROUP BY doc_id
       |), sims AS (
       |  SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM sums
       |)""".stripMargin
  }

  /** Pigeonhole-banded simhash candidates, verified at hamming ≤ 3:
    * sims → 4 × 15-bit chunk bands (same hot-bucket valve as the MinHash
    * path) → equi-join candidates — the twin of
    * Dedup.simhashNearDupsOnTable, shared by q80 (pair listing) and q81
    * (end-to-end removals). */
  private val simhashCandCte =
    s"""$simsCte,
       |bands AS (
       |  SELECT doc_id, g.b AS band,
       |    CAST((simhash >> (15 * g.b)) & 32767 AS VARCHAR) AS bk
       |  FROM sims, unnest(generate_series(0, 3)) AS g(b)),
       |okbands AS (
       |  SELECT doc_id, band, bk FROM (
       |    SELECT doc_id, band, bk,
       |      count(*) OVER (PARTITION BY band, bk) AS n FROM bands) t
       |  WHERE n <= ${Dedup.MaxBucket}),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM okbands a JOIN okbands b ON a.band = b.band
       |   AND a.bk = b.bk AND a.doc_id < b.doc_id)""".stripMargin

  private[queries] val bandsCte = {
    val bandSelects = (0 until 4).map { b =>
      val cols = (0 until 4).map(r => s"CAST(m${b * 4 + r} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, md5($cols) AS bk FROM sig"
    }.mkString(" UNION ALL ")
    // okbands mirrors Dedup.bandJoin's hot-bucket valve (same MaxBucket
    // constant) so both engines prune identically if it ever fires
    s"""$sigCte, bands AS ($bandSelects),
       |okbands AS (
       |  SELECT doc_id, band, bk FROM (
       |    SELECT doc_id, band, bk,
       |      count(*) OVER (PARTITION BY band, bk) AS n FROM bands) t
       |  WHERE n <= ${Dedup.MaxBucket}),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM okbands a JOIN okbands b ON a.band = b.band AND a.bk = b.bk
       |   AND a.doc_id < b.doc_id
       |)""".stripMargin
  }

  /** q61's transitive-closure trunk (LSH candidates → Jaccard ≥ 0.5
    * verify → symmetric edges → recursive reachability) — shared with
    * q108's cluster-size histogram, which rolls the same components up
    * instead of listing removals. Mirrors `Dedup.nearDupComponentsOf`. */
  private[queries] val neardupReachCte =
    s"""${bandsCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |counts AS (SELECT doc_id, count(*) AS n FROM hashed GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
       |  FROM cand c
       |  JOIN hashed ha ON ha.doc_id = c.doc_a
       |  JOIN hashed hb ON hb.doc_id = c.doc_b AND hb.h = ha.h
       |  GROUP BY c.doc_a, c.doc_b),
       |verified AS MATERIALIZED (
       |  SELECT i.doc_a, i.doc_b
       |  FROM inter i
       |   JOIN counts ca ON ca.doc_id = i.doc_a
       |   JOIN counts cb ON cb.doc_id = i.doc_b
       |  WHERE CAST(n_inter AS DOUBLE) / (ca.n + cb.n - n_inter) >= 0.5),
       |edges AS MATERIALIZED (
       |  SELECT doc_a AS src, doc_b AS dst FROM verified
       |  UNION ALL SELECT doc_b, doc_a FROM verified),
       |reach(node, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, r.r FROM edges e JOIN reach r ON r.node = e.dst)""".stripMargin

  /** The sampled LSH-recall audit body, parameterized by the md5
    * stratum percent: ground truth restricted to a p-fraction doc
    * stratum cuts the exact join's pair volume to ~p² (pairs need
    * BOTH endpoints in-stratum) while the Wilson interval keeps the
    * smaller sample honest. q279 runs the 50% demonstration stratum;
    * q338 the 10% production-posture stratum (SCALE.md: 1-5% at
    * 100 TB) — its bench time SHOWS the discount materializing. */
  private def recallSampledQ(name: String, pct: Int): Q =
    Q(name,
      Some(s"""$bandsCte,
              |sizes AS (SELECT doc_id, count(*) AS n FROM hashed
              |          GROUP BY 1),
              |linter AS (
              |  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
              |  FROM cand c
              |  JOIN hashed ha ON ha.doc_id = c.doc_a
              |  JOIN hashed hb ON hb.doc_id = c.doc_b AND hb.h = ha.h
              |  GROUP BY 1, 2),
              |lsh AS (
              |  SELECT l.doc_a, l.doc_b FROM linter l
              |  JOIN sizes sa ON sa.doc_id = l.doc_a
              |  JOIN sizes sb ON sb.doc_id = l.doc_b
              |  WHERE CAST(l.n_inter AS DOUBLE)
              |      / (sa.n + sb.n - l.n_inter) >= 0.5),
              |samp AS (
              |  SELECT doc_id FROM documents
              |  WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))
              |    ::BIGINT % 100 < $pct),
              |shashed AS (
              |  SELECT h.doc_id, h.h FROM hashed h JOIN samp
              |  USING (doc_id)),
              |spdfreq AS (SELECT h, count(*) AS df FROM shashed
              |            GROUP BY 1),
              |spref AS (
              |  SELECT doc_id, h FROM (
              |    SELECT s.doc_id, s.h, z.n,
              |      row_number() OVER (PARTITION BY s.doc_id
              |        ORDER BY d.df, s.h) AS rn
              |    FROM shashed s JOIN spdfreq d USING (h)
              |      JOIN sizes z USING (doc_id)) t
              |  WHERE rn <= n - ceil(0.5 * n) + 1),
              |spok AS (
              |  SELECT doc_id, h FROM (
              |    SELECT doc_id, h, count(*) OVER (PARTITION BY h) AS bn
              |    FROM spref) t
              |  WHERE bn <= ${graft.ops.Dedup.MaxBucket}),
              |scand AS (
              |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              |  FROM spok a JOIN spok b
              |    ON a.h = b.h AND a.doc_id < b.doc_id),
              |sinter AS (
              |  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
              |  FROM scand c
              |  JOIN shashed ha ON ha.doc_id = c.doc_a
              |  JOIN shashed hb ON hb.doc_id = c.doc_b AND hb.h = ha.h
              |  GROUP BY 1, 2),
              |sexact AS (
              |  SELECT i.doc_a, i.doc_b FROM sinter i
              |  JOIN sizes sa ON sa.doc_id = i.doc_a
              |  JOIN sizes sb ON sb.doc_id = i.doc_b
              |  WHERE CAST(i.n_inter AS DOUBLE)
              |      / (sa.n + sb.n - i.n_inter) >= 0.5),
              |flag AS (
              |  SELECT e.doc_a,
              |    CASE WHEN l.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hit
              |  FROM sexact e LEFT JOIN lsh l
              |    ON e.doc_a = l.doc_a AND e.doc_b = l.doc_b),
              |a AS (
              |  SELECT 'minhash_lsh_b4r4_j0.5' AS audit,
              |    count(*)::BIGINT AS n, sum(hit)::BIGINT AS k
              |  FROM flag GROUP BY 1)
              |SELECT audit, n, k,
              |  round(k::DOUBLE / n, 6) AS rate_r,
              |  round((k::DOUBLE / n + (1.959964 * 1.959964) / (2.0 * n))
              |      / (1.0 + (1.959964 * 1.959964) / n)
              |    - 1.959964 * sqrt(k::DOUBLE / n * (1.0 - k::DOUBLE / n)
              |        / n + (1.959964 * 1.959964) / (4.0 * n * n))
              |      / (1.0 + (1.959964 * 1.959964) / n), 6) AS lo_r,
              |  round((k::DOUBLE / n + (1.959964 * 1.959964) / (2.0 * n))
              |      / (1.0 + (1.959964 * 1.959964) / n)
              |    + 1.959964 * sqrt(k::DOUBLE / n * (1.0 - k::DOUBLE / n)
              |        / n + (1.959964 * 1.959964) / (4.0 * n * n))
              |      / (1.0 + (1.959964 * 1.959964) / n), 6) AS hi_r
              |FROM a""".stripMargin),
      (s, d) => {
        import graft.ops.{Curation, Dedup, Infer}
        val docs = documents(s, d)
        val samp = Curation.stratifiedSample(docs, "doc_id", "lang",
          Map.empty, pct)
        val sh = docShingleTable(s, d)
        // ONE set-row build serves both verifies (the q262 shape): the
        // stratum's set rows are the corpus set rows semi-filtered
        // (per-doc arrays are doc-local), so the exact branch reuses
        // them instead of re-aggregating the filtered shingle table
        val sets = Dedup.docShingleSets(sh, "doc_id").localCheckpoint()
        val cand = withSubsetCoPartition(s)(
          Dedup.bandJoin(docBandTable(s, d), "doc_id", "doc_a", "doc_b")
            .localCheckpoint())
        val lsh = Dedup.jaccardOnSets(sets, cand, "doc_id")
          .where(col("jaccard") >= 0.5)
          .select("doc_a", "doc_b")
        // the sampled exact side reads the SAME persisted shingles,
        // semi-filtered to the stratum (per-doc shingle sets are
        // doc-local, so the sample's shingle table is exactly this)
        val sampIds = samp.select("doc_id")
        val exactS = Dedup.prefixFilterPairsWithSets(
            sh.join(sampIds, Seq("doc_id"), "left_semi"),
            sets.join(sampIds, Seq("doc_id"), "left_semi"),
            "doc_id", 0.5)
          .select("doc_a", "doc_b")
        val flagged = exactS
          .join(lsh.withColumn("_hit", lit(1)), Seq("doc_a", "doc_b"),
            "left")
          .select(lit("minhash_lsh_b4r4_j0.5").as("audit"), col("_hit"))
        Infer.wilsonInterval(flagged, "audit", col("_hit").isNotNull)
      })

  val all: Seq[Q] = Seq(

    // Exact dedup: hash-groupBy on content (keeper = min id).
    Q("q24_dedup_exact",
      Some("""SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
             |FROM documents GROUP BY md5(text) ORDER BY keeper_id""".stripMargin),
      (s, d) => Dedup.exactDupGroups(documents(s, d), "doc_id", "text")
        .select("keeper_id", "n_copies").orderBy("keeper_id")),

    // Token counting: whitespace + alpha-regex + BPE-ish estimate.
    Q("q25_token_stats",
      Some(s"""SELECT doc_id,
              | len(string_split($normSql, ' ')) AS n_tokens,
              | len(regexp_extract_all(text, '[a-zA-Z]+')) AS n_alpha_tokens,
              | CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tokens_bpe_est
              |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => TextOps.tokenStats(documents(s, d), "text")
        .select("doc_id", "n_tokens", "n_alpha_tokens", "n_tokens_bpe_est")
        .orderBy("doc_id")),

    // Language-ID heuristic: stopword-profile scores + deterministic argmax.
    Q("q26_lang_id", {
      val scoreCols = TextOps.langProfiles.map { case (l, pat) =>
        s"len(regexp_extract_all(text, '$pat')) AS score_$l"
      }.mkString(", ")
      val langs = TextOps.langProfiles.map(_._1)
      val cases = langs.map { l =>
        val geOthers = langs.filter(_ != l)
          .map(o => s"score_$l >= score_$o").mkString(" AND ")
        s"WHEN score_$l > 0 AND $geOthers THEN '$l'"
      }.mkString(" ")
      Some(s"""SELECT doc_id, lang, score_en, score_de, score_es, score_fr,
              | CASE $cases ELSE 'und' END AS lang_pred
              |FROM (SELECT doc_id, lang, $scoreCols FROM documents) t
              |ORDER BY doc_id""".stripMargin)
    },
      (s, d) => TextOps.langId(documents(s, d), "text")
        .select("doc_id", "lang", "score_en", "score_de", "score_es",
          "score_fr", "lang_pred")
        .orderBy("doc_id")),

    // Quality scoring: length/punct/stopword ratios → [0,1] score.
    Q("q27_quality_score",
      Some(s"""SELECT doc_id, n_chars_obs, n_tokens, punct_ratio, stop_ratio,
              | least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
              |   + (1.0 - punct_ratio) * 0.3
              |   + least(stop_ratio * 5.0, 1.0) * 0.3 AS quality
              |FROM (
              |  SELECT doc_id, length(text) AS n_chars_obs,
              |    len(string_split($normSql, ' ')) AS n_tokens,
              |    CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
              |      / length(text) AS punct_ratio,
              |    CAST(len(regexp_extract_all(text, '${TextOps.langProfiles.head._2}')) AS DOUBLE)
              |      / len(string_split($normSql, ' ')) AS stop_ratio
              |  FROM documents) t
              |ORDER BY doc_id""".stripMargin),
      (s, d) => TextOps.qualityScore(documents(s, d), "text")
        .select("doc_id", "n_chars_obs", "n_tokens", "punct_ratio",
          "stop_ratio", "quality")
        .orderBy("doc_id")),

    // Fingerprinting: content md5 + winnowing-style min-shingle hash.
    Q("q28_fingerprints",
      Some(s"""$shingleCte
              |SELECT d.doc_id, md5($normSql) AS content_md5,
              |  (SELECT min(h) FROM hashed WHERE hashed.doc_id = d.doc_id)
              |    AS min_shingle_hash
              |FROM documents d ORDER BY d.doc_id""".stripMargin),
      (s, d) => TextOps.fingerprints(documents(s, d), "doc_id", "text")
        .select("doc_id", "content_md5", "min_shingle_hash")
        .orderBy("doc_id")),

    // MinHash (16 xor-hashes) + LSH (4 bands × 4) candidate pairs.
    Q("q29_minhash_lsh_pairs",
      Some(s"""$bandsCte
              |SELECT doc_a, doc_b FROM cand ORDER BY doc_a, doc_b""".stripMargin),
      (s, d) => withSubsetCoPartition(s) {
        // read the PERSISTED band-key index (bucketed by bk): the
        // candidate self-join runs exchange-free over the layout —
        // eager (localCheckpoint) so the plan sees the scoped conf
        Dedup.bandJoin(docBandTable(s, d), "doc_id", "doc_a", "doc_b")
          .orderBy("doc_a", "doc_b").localCheckpoint()
          // re-sorted after the checkpoint: the LogicalRDD drops the
          // plan-visible Sort the Verify dump-order contract pins
          .orderBy("doc_a", "doc_b")
      }),

    // Exact n-gram Jaccard, verified on the LSH candidates (the full
    // near-dup pipeline: shingle → minhash → band join → verify).
    Q("q30_lsh_jaccard",
      Some(s"""$bandsCte,
              |counts AS (SELECT doc_id, count(*) AS n FROM hashed GROUP BY doc_id),
              |inter AS (
              |  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
              |  FROM cand c
              |  JOIN hashed ha ON ha.doc_id = c.doc_a
              |  JOIN hashed hb ON hb.doc_id = c.doc_b AND hb.h = ha.h
              |  GROUP BY c.doc_a, c.doc_b)
              |SELECT i.doc_a, i.doc_b,
              |  CAST(n_inter AS DOUBLE) / (ca.n + cb.n - n_inter) AS jaccard
              |FROM inter i
              | JOIN counts ca ON ca.doc_id = i.doc_a
              | JOIN counts cb ON cb.doc_id = i.doc_b
              |ORDER BY doc_a, doc_b""".stripMargin),
      (s, d) => {
        // the full near-dup verify off the PERSISTED layout: shingles
        // (bucketed by doc_id) and band keys (bucketed by bk) are built
        // once per corpus — this query pays only the candidate join +
        // Jaccard verify, the production re-run shape
        val shingles = docShingleTable(s, d)
        val pairs = withSubsetCoPartition(s)(
          Dedup.bandJoin(docBandTable(s, d), "doc_id", "doc_a", "doc_b")
            .localCheckpoint())
        Dedup.jaccardForPairs(shingles, pairs, "doc_id")
          .select("doc_a", "doc_b", "jaccard").orderBy("doc_a", "doc_b")
      }),

    // End-to-end corpus dedup: LSH → Jaccard ≥ 0.5 → connected components
    // → removed = non-keeper members. The Spark side runs min-label
    // propagation TO THE FIXPOINT (Dedup.nearDupComponents), i.e. exact
    // connected components; the oracle computes the same thing directly
    // via a recursive transitive closure, so the two agree for any chain
    // length — no shared iteration count to keep in sync.
    Q("q61_neardup_removals", {
      Some(s"""$neardupReachCte
              |SELECT node AS doc_id FROM (
              |  SELECT node, min(r) AS label FROM reach GROUP BY node)
              |WHERE label < node
              |ORDER BY doc_id""".stripMargin)
    },
      (s, d) => graft.ops.Dedup
        .nearDupRemovalsOnIndex(docShingleTable(s, d), docBandTable(s, d),
          "doc_id", 0.5)
        .orderBy("doc_id")),

    // 60-bit SimHash (wide per-bit agg, no row explosion).
    Q("q31_simhash",
      Some(s"""$simsCte
              |SELECT doc_id, simhash FROM sims ORDER BY doc_id""".stripMargin),
      (s, d) => docSimhashTable(s, d).orderBy("doc_id")),

    // SimHash near-dups (hamming ≤ 3) by pigeonhole banding: 60 bits →
    // 4 × 15-bit chunks; pairs within distance 3 must share one exact
    // chunk → chunk-keyed equi-join (with the shared hot-bucket valve),
    // then exact bit_count verify — never an all-pairs scan.
    Q("q80_simhash_neardup",
      Some(s"""$simhashCandCte
              |SELECT c.doc_a, c.doc_b,
              |  CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT)
              |    AS hamming
              |FROM cand c
              | JOIN sims sa ON sa.doc_id = c.doc_a
              | JOIN sims sb ON sb.doc_id = c.doc_b
              |WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
              |ORDER BY doc_a, doc_b""".stripMargin),
      (s, d) => Dedup.simhashNearDupsOnTable(docSimhashTable(s, d),
          "doc_id", 3)
        .orderBy("doc_a", "doc_b")),

    // SimHash END-TO-END dedup (the cheap-dedup pipeline: one wide agg
    // per doc instead of a shingle explosion): q80's verified pairs →
    // connected components (Dedup.nearDupComponents, reused unchanged
    // from the MinHash path) → removed = non-keeper members. The oracle
    // computes components via a recursive transitive closure, exact for
    // any chain length — same shape as q61's.
    Q("q81_simhash_removals",
      Some(s"""${simhashCandCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
              |verified AS MATERIALIZED (
              |  SELECT c.doc_a, c.doc_b FROM cand c
              |   JOIN sims sa ON sa.doc_id = c.doc_a
              |   JOIN sims sb ON sb.doc_id = c.doc_b
              |  WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3),
              |edges AS MATERIALIZED (
              |  SELECT doc_a AS src, doc_b AS dst FROM verified
              |  UNION ALL SELECT doc_b, doc_a FROM verified),
              |reach(node, r) AS (
              |  SELECT src, src FROM edges
              |  UNION
              |  SELECT e.src, r.r FROM edges e JOIN reach r ON r.node = e.dst)
              |SELECT node AS doc_id FROM (
              |  SELECT node, min(r) AS label FROM reach GROUP BY node)
              |WHERE label < node
              |ORDER BY doc_id""".stripMargin),
      (s, d) => Dedup.simhashRemovalsOnTable(docSimhashTable(s, d),
          "doc_id", 3)
        .orderBy("doc_id")),

    // TF-IDF top terms per doc (SURVEY §2.12's tf-idf): tf × ln(N/df),
    // rounded before ranking so both engines rank identical values; top-5
    // per doc with term tie-break.
    Q("q66_tfidf_top_terms",
      Some(s"""WITH toks AS (
              |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS term
              |  FROM documents),
              |tf AS (
              |  SELECT doc_id, term, count(*) AS tf
              |  FROM toks GROUP BY doc_id, term),
              |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
              |nd AS (SELECT count(*) AS n_docs FROM documents),
              |scored AS (
              |  SELECT t.doc_id, t.term, t.tf,
              |    round(t.tf * ln(n_docs::DOUBLE / d.df), 6) AS tfidf
              |  FROM tf t JOIN dfreq d USING (term) CROSS JOIN nd),
              |ranked AS (
              |  SELECT *, row_number() OVER (PARTITION BY doc_id
              |    ORDER BY tfidf DESC, term) AS rn FROM scored)
              |SELECT doc_id, term, tf, tfidf FROM ranked WHERE rn <= 5
              |ORDER BY doc_id, term""".stripMargin),
      (s, d) => TextOps.topTerms(documents(s, d), "doc_id", "text", 5)
        .orderBy("doc_id", "term"))
  ,

    // Corpus-unigram LM score (perplexity-filter shape): per-doc mean
    // surprisal −ln(cf/N) of token instances under the corpus unigram
    // distribution. Mean is a float sum → round(9) (reorder noise ~1e-14).
    Q("q75_unigram_surprisal",
      Some(s"""WITH toks AS (
              |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS term
              |  FROM documents),
              |cf AS (SELECT term, count(*) AS cf FROM toks GROUP BY term),
              |nt AS (SELECT count(*) AS n_total FROM toks)
              |SELECT doc_id, count(*) AS n_tokens,
              |  round(avg(-ln(cf::DOUBLE / n_total)), 9) AS avg_surprisal
              |FROM toks JOIN cf USING (term) CROSS JOIN nt
              |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, d) => graft.ops.TextOps
        .unigramSurprisal(documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // Bigram (order-2) LM surprisal with add-k smoothing — the KenLM-
    // style perplexity filter one order up from q75: per doc, mean
    // −ln P(w₂|w₁) = −ln((c(w₁w₂)+k)/(c(w₁·)+k·V)), k = 0.5. Docs with
    // <2 tokens have no bigrams and are omitted by both engines.
    Q("q141_bigram_surprisal",
      Some(s"""WITH toks AS (
              |  SELECT doc_id, string_split($normSql, ' ') AS t
              |  FROM documents),
              |bi AS (
              |  SELECT doc_id, t[g.i] AS w1, t[g.i + 1] AS w2
              |  FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)),
              |bc AS (SELECT w1, w2, count(*) AS n_ab FROM bi GROUP BY 1, 2),
              |c1 AS (SELECT w1, sum(n_ab) AS c_w1 FROM bc GROUP BY 1),
              |voc AS (
              |  SELECT count(DISTINCT w)::DOUBLE AS v
              |  FROM (SELECT unnest(t) AS w FROM toks))
              |SELECT doc_id, count(*) AS n_bigrams,
              |  round(avg(-ln((n_ab + 0.5) / (c_w1 + 0.5 * v))), 9)
              |    AS avg_nll
              |FROM bi JOIN bc USING (w1, w2) JOIN c1 USING (w1)
              |  CROSS JOIN voc
              |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, d) => graft.ops.TextOps
        .bigramSurprisal(documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // Golden-record survivorship over the q61 near-dup clusters:
    // canonical member = longest text (tie → lowest id, one struct-max),
    // lang/source take the cluster mode (tie → smallest value).
    Q("q149_golden_record",
      Some(s"""$neardupReachCte,
              |comp AS (SELECT node, min(r) AS label
              |         FROM reach GROUP BY node),
              |member AS (
              |  SELECT c.label, d.doc_id, d.text, d.lang, d.source
              |  FROM comp c JOIN documents d ON d.doc_id = c.node),
              |canon AS (
              |  SELECT label, count(*)::BIGINT AS n_members,
              |    max({'l': length(text), 'ni': -doc_id}) AS mx
              |  FROM member GROUP BY label),
              |langm AS (
              |  SELECT label, lang FROM (
              |    SELECT label, lang, row_number() OVER (
              |      PARTITION BY label ORDER BY count(*) DESC, lang ASC)
              |      AS rn
              |    FROM member GROUP BY label, lang) t WHERE rn = 1),
              |srcm AS (
              |  SELECT label, source FROM (
              |    SELECT label, source, row_number() OVER (
              |      PARTITION BY label ORDER BY count(*) DESC, source ASC)
              |      AS rn
              |    FROM member GROUP BY label, source) t WHERE rn = 1)
              |SELECT c.label AS cluster_id, c.n_members,
              |  (-(c.mx.ni))::BIGINT AS canonical_id,
              |  (c.mx.l)::BIGINT AS canonical_len,
              |  l.lang, s.source
              |FROM canon c JOIN langm l USING (label)
              |  JOIN srcm s USING (label)
              |ORDER BY cluster_id""".stripMargin),
      (s, d) => {
        // components read the persisted shingle/band index — the base
        // corpus is never re-shingled (round-12's q61 migration)
        Curation.goldenRecord(documents(s, d),
            Dedup.nearDupComponentsOnIndex(docShingleTable(s, d),
              docBandTable(s, d), "doc_id", 0.5),
            "doc_id", "text", Seq("lang", "source"))
          .orderBy("cluster_id")
      }),

    // Incremental near-dup: the 10% delta slice (doc_id % 10 = 0)
    // probes the base corpus's LSH band index; cross-side collisions
    // verified by exact Jaccard at 0.5. Signatures/bands are identical
    // to q29's (same sigCte), only the join sides differ.
    Q("q147_delta_neardup",
      Some(s"""$sigCte, bands AS (${(0 until 4).map { b =>
                 val cols = (0 until 4).map(r => s"CAST(m${b * 4 + r} AS VARCHAR)")
                   .mkString(" || ',' || ")
                 s"SELECT doc_id, $b AS band, md5($cols) AS bk FROM sig"
               }.mkString(" UNION ALL ")}),
              |nb AS (
              |  SELECT doc_id, band, bk FROM (
              |    SELECT doc_id, band, bk,
              |      count(*) OVER (PARTITION BY band, bk) AS n
              |    FROM bands WHERE doc_id % 10 = 0) t
              |  WHERE n <= ${Dedup.MaxBucket}),
              |bb AS (
              |  SELECT doc_id, band, bk FROM (
              |    SELECT doc_id, band, bk,
              |      count(*) OVER (PARTITION BY band, bk) AS n
              |    FROM bands WHERE doc_id % 10 <> 0) t
              |  WHERE n <= ${Dedup.MaxBucket}),
              |cand AS (
              |  SELECT DISTINCT n.doc_id AS doc_new, b.doc_id AS doc_base
              |  FROM nb n JOIN bb b ON n.band = b.band AND n.bk = b.bk),
              |sizes AS (SELECT doc_id, count(*)::BIGINT AS n
              |          FROM hashed GROUP BY 1),
              |inter AS (
              |  SELECT c.doc_new, c.doc_base, count(*) AS n_inter
              |  FROM cand c
              |  JOIN hashed ha ON ha.doc_id = c.doc_new
              |  JOIN hashed hb ON hb.doc_id = c.doc_base AND hb.h = ha.h
              |  GROUP BY 1, 2)
              |SELECT i.doc_new, i.doc_base, i.n_inter,
              |  sa.n AS n_new, sb.n AS n_base,
              |  CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter)
              |    AS jaccard
              |FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_new
              |  JOIN sizes sb ON sb.doc_id = i.doc_base
              |WHERE CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter)
              |  >= 0.5
              |ORDER BY doc_new, doc_base""".stripMargin),
      (s, d) => {
        val docs = documents(s, d)
        Dedup.deltaNearDups(
            docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
            docs.filter(pmod(col("doc_id"), lit(10)) === 0),
            "doc_id", "text", 0.5)
          .orderBy("doc_new", "doc_base")
      }),

    // Sorted-neighborhood dedup (merge/purge): global rank by 24-char
    // key prefix via two-level numbering, window-10 candidate pairs
    // from a block equi-join, exact shingle-Jaccard verify at 0.5.
    Q("q146_sorted_neighborhood",
      Some(s"""$shingleCte,
              |keyed AS (
              |  SELECT doc_id, substr($normSql, 1, 24) AS key
              |  FROM documents),
              |r AS (
              |  SELECT doc_id,
              |    row_number() OVER (ORDER BY key, doc_id) AS rn
              |  FROM keyed),
              |cand AS (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |    (b.rn - a.rn)::BIGINT AS rank_gap
              |  FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn <= 9),
              |sizes AS (SELECT doc_id, count(*)::BIGINT AS n
              |          FROM hashed GROUP BY 1),
              |inter AS (
              |  SELECT c.doc_a, c.doc_b, c.rank_gap, count(*) AS n_inter
              |  FROM cand c
              |  JOIN hashed ha ON ha.doc_id = c.doc_a
              |  JOIN hashed hb ON hb.doc_id = c.doc_b AND hb.h = ha.h
              |  GROUP BY 1, 2, 3)
              |SELECT i.doc_a, i.doc_b, i.rank_gap,
              |  CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter)
              |    AS jaccard
              |FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
              |  JOIN sizes sb ON sb.doc_id = i.doc_b
              |WHERE CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter)
              |  >= 0.5
              |ORDER BY doc_a, doc_b""".stripMargin),
      (s, d) => Dedup.sortedNeighborhoodPairsOnShingles(documents(s, d),
          docShingleTable(s, d), "doc_id", "text", 10, 0.5)
        .orderBy("doc_a", "doc_b")),

    // Winnowing fingerprints (MOSS): per-window rightmost-min k-gram
    // hash selection, k = 3, w = 4 — guarantees any shared run of
    // ≥ 6 tokens shares a fingerprint. The struct-min tie-break and
    // window-start clamp are pinned cell-by-cell by the oracle.
    Q("q144_winnow_fingerprints",
      Some(s"""WITH toks AS (
              |  SELECT doc_id, string_split($normSql, ' ') AS t
              |  FROM documents),
              |g AS (
              |  SELECT doc_id, s.i - 1 AS pos,
              |    ${hash60Sql("t[s.i] || ' ' || t[s.i+1] || ' ' || t[s.i+2]")}
              |      AS h,
              |    len(t) - 2 AS n_grams
              |  FROM toks,
              |    unnest(generate_series(1, greatest(len(t) - 2, 0)))
              |      AS s(i)),
              |sel AS (
              |  SELECT doc_id, pos, n_grams,
              |    min({'h': h, 'np': -pos}) OVER (PARTITION BY doc_id
              |      ORDER BY pos ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
              |      AS m
              |  FROM g)
              |SELECT DISTINCT doc_id, m.h AS fp_hash, -m.np AS fp_pos
              |FROM sel WHERE pos <= greatest(n_grams - 4, 0)
              |ORDER BY doc_id, fp_pos""".stripMargin),
      (s, d) => TextOps
        .winnowFingerprints(documents(s, d), "doc_id", "text", 3, 4)
        .orderBy("doc_id", "fp_pos")),

    // Max-bigram repetition ratio (Gopher/C4 quality rule): most frequent
    // bigram's share of all bigram instances — no per-doc dedup, the
    // counts ARE the signal.
    Q("q70_repetition",
      Some(s"""WITH toks AS (
              |  SELECT doc_id, string_split($normSql, ' ') AS t
              |  FROM documents),
              |bg AS (
              |  SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram
              |  FROM toks, unnest(generate_series(1, greatest(len(t) - 1, 0)))
              |    AS g(i)),
              |c AS (
              |  SELECT doc_id, bigram, count(*) AS n
              |  FROM bg GROUP BY doc_id, bigram),
              |a AS (
              |  SELECT doc_id, max(n) AS max_bigram,
              |    CAST(sum(n) AS BIGINT) AS n_bigrams
              |  FROM c GROUP BY doc_id)
              |SELECT doc_id, max_bigram, n_bigrams,
              |  max_bigram / n_bigrams AS rep_ratio
              |FROM a ORDER BY doc_id""".stripMargin),
      (s, d) => TextOps.repetition(documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // Bigram collocations by PMI (min count 5): adjacent-pair extraction
    // by slicing each doc's own token array — zero shuffle until the
    // vocabulary-sized count aggs; ln terms combined in one fixed
    // association in both engines, rounded to 6.
    Q("q93_collocations_pmi",
      Some(s"""WITH toks AS (
              |  SELECT string_split($normSql, ' ') AS t FROM documents),
              |tot AS (
              |  SELECT sum(len(t))::DOUBLE AS n_uni,
              |    sum(greatest(len(t) - 1, 0))::DOUBLE AS n_bi FROM toks),
              |uc AS (
              |  SELECT w, count(*) AS c
              |  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1),
              |bc AS (
              |  SELECT w1, w2, count(*) AS n_ab FROM (
              |    SELECT t[g.i] AS w1, t[g.i + 1] AS w2
              |    FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i))
              |  GROUP BY 1, 2 HAVING count(*) >= 5)
              |SELECT b.w1, b.w2, b.n_ab,
              |  round(ln(b.n_ab) + 2 * ln(tot.n_uni) - ln(tot.n_bi)
              |    - ln(a.c) - ln(bb.c), 6) AS pmi
              |FROM bc b JOIN uc a ON b.w1 = a.w
              |JOIN uc bb ON b.w2 = bb.w CROSS JOIN tot
              |ORDER BY w1, w2""".stripMargin),
      (s, d) => TextOps.collocations(documents(s, d), "text", 5L)
        .orderBy("w1", "w2")),

    // Character-distribution entropy (compressibility-proxy quality
    // signal) — shuffle-free, explode-free: per-symbol counts via
    // length(replace()) over a fixed alphabet, mirrored symbol-for-
    // symbol (same fold order) in SQL.
    Q("q107_char_entropy", {
      val alpha = graft.ops.TextOps.EntropyAlphabet
      val countDefs = alpha.zipWithIndex.map { case (ch, i) =>
        s"length(t) - length(replace(t, '$ch', '')) AS c$i"
      }.mkString(",\n    ")
      val otherDef = "len - (" +
        alpha.indices.map(i => s"c$i").mkString(" + ") + ") AS cOther"
      val terms = (alpha.indices.map(i => s"c$i") :+ "cOther").map { c =>
        s"CASE WHEN $c > 0 THEN -($c / len) * ln($c / len) ELSE 0.0 END"
      }.mkString("\n    + ")
      Some(s"""WITH nt AS (
              |  SELECT doc_id, $normSql AS t FROM documents),
              |c AS (
              |  SELECT doc_id, length(t) AS len,
              |    $countDefs
              |  FROM nt),
              |c2 AS (SELECT *, $otherDef FROM c)
              |SELECT doc_id, len AS n_chars,
              |  round($terms, 6) AS entropy
              |FROM c2 ORDER BY doc_id""".stripMargin)
    },
      (s, d) => graft.ops.TextOps
        .charEntropy(documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // Near-dup cluster-size histogram — the dedup REPORT view: the q61
    // components machinery rolled up to (cluster_size, n_clusters)
    // instead of a removal list. Reuses Dedup.nearDupComponentsOf
    // unchanged; the oracle reuses q61's recursive-closure trunk.
    Q("q108_cluster_histogram",
      Some(s"""$neardupReachCte,
              |labels AS (
              |  SELECT node, min(r) AS label FROM reach GROUP BY node),
              |sizes AS (
              |  SELECT label, count(*) AS cluster_size
              |  FROM labels GROUP BY label)
              |SELECT cluster_size, count(*) AS n_clusters
              |FROM sizes GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => graft.ops.Dedup
        .nearDupClusterHistogramOnIndex(docShingleTable(s, d),
          docBandTable(s, d), "doc_id", 0.5)
        .orderBy("cluster_size"))
  ,

    // EXACT-recall set-similarity join via prefix filtering (AllPairs/
    // SSJoin): Jaccard ≥ 0.5 pairs with no LSH misses. Prefixes under
    // the (df, h) order, candidate equi-join through the shared bucket
    // valve, inverted-index Jaccard verify — all mirrored in SQL.
    Q("q109_prefix_filter_join",
      Some(s"""$shingleCte,
              |dfreq AS (SELECT h, count(*) AS df FROM hashed GROUP BY 1),
              |sizes AS (SELECT doc_id, count(*) AS n FROM hashed
              |          GROUP BY 1),
              |pref AS (
              |  SELECT doc_id, h FROM (
              |    SELECT s.doc_id, s.h, z.n,
              |      row_number() OVER (PARTITION BY s.doc_id
              |        ORDER BY d.df, s.h) AS rn
              |    FROM hashed s JOIN dfreq d USING (h)
              |      JOIN sizes z USING (doc_id)) t
              |  WHERE rn <= n - ceil(0.5 * n) + 1),
              |okpref AS (
              |  SELECT doc_id, h FROM (
              |    SELECT doc_id, h,
              |      count(*) OVER (PARTITION BY h) AS bn FROM pref) t
              |  WHERE bn <= ${graft.ops.Dedup.MaxBucket}),
              |cand AS (
              |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              |  FROM okpref a JOIN okpref b
              |    ON a.h = b.h AND a.doc_id < b.doc_id),
              |inter AS (
              |  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
              |  FROM cand c
              |  JOIN hashed ha ON ha.doc_id = c.doc_a
              |  JOIN hashed hb ON hb.doc_id = c.doc_b AND hb.h = ha.h
              |  GROUP BY 1, 2)
              |SELECT i.doc_a, i.doc_b, i.n_inter,
              |  sa.n AS n_a, sb.n AS n_b,
              |  CAST(i.n_inter AS DOUBLE)
              |    / (sa.n + sb.n - i.n_inter) AS jaccard
              |FROM inter i
              |  JOIN sizes sa ON sa.doc_id = i.doc_a
              |  JOIN sizes sb ON sb.doc_id = i.doc_b
              |WHERE CAST(i.n_inter AS DOUBLE)
              |    / (sa.n + sb.n - i.n_inter) >= 0.5
              |ORDER BY doc_a, doc_b""".stripMargin),
      (s, d) => graft.ops.Dedup
        .prefixFilterPairsOnShingles(docShingleTable(s, d), "doc_id", 0.5)
        .select("doc_a", "doc_b", "n_inter", "n_a", "n_b", "jaccard")
        .orderBy("doc_a", "doc_b"))
  ,

    // LSH honesty audit: MinHash-LSH's verified pairs vs the EXACT
    // prefix-filter ground truth at the same threshold and shingle
    // space — the recall/precision numbers a dedup pipeline must
    // publish before anyone trusts "we removed the near-dups". The
    // banding theory says recall ≈ 1−(1−s^4)^4 per pair; this measures
    // it on the actual corpus.
    Q("q262_lsh_recall",
      Some(s"""$bandsCte,
              |sizes AS (SELECT doc_id, count(*) AS n FROM hashed
              |          GROUP BY 1),
              |linter AS (
              |  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
              |  FROM cand c
              |  JOIN hashed ha ON ha.doc_id = c.doc_a
              |  JOIN hashed hb ON hb.doc_id = c.doc_b AND hb.h = ha.h
              |  GROUP BY 1, 2),
              |lsh AS (
              |  SELECT l.doc_a, l.doc_b FROM linter l
              |  JOIN sizes sa ON sa.doc_id = l.doc_a
              |  JOIN sizes sb ON sb.doc_id = l.doc_b
              |  WHERE CAST(l.n_inter AS DOUBLE)
              |      / (sa.n + sb.n - l.n_inter) >= 0.5),
              |pdfreq AS (SELECT h, count(*) AS df FROM hashed GROUP BY 1),
              |ppref AS (
              |  SELECT doc_id, h FROM (
              |    SELECT s.doc_id, s.h, z.n,
              |      row_number() OVER (PARTITION BY s.doc_id
              |        ORDER BY d.df, s.h) AS rn
              |    FROM hashed s JOIN pdfreq d USING (h)
              |      JOIN sizes z USING (doc_id)) t
              |  WHERE rn <= n - ceil(0.5 * n) + 1),
              |pok AS (
              |  SELECT doc_id, h FROM (
              |    SELECT doc_id, h, count(*) OVER (PARTITION BY h) AS bn
              |    FROM ppref) t
              |  WHERE bn <= ${graft.ops.Dedup.MaxBucket}),
              |pcand AS (
              |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              |  FROM pok a JOIN pok b
              |    ON a.h = b.h AND a.doc_id < b.doc_id),
              |pinter AS (
              |  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
              |  FROM pcand c
              |  JOIN hashed ha ON ha.doc_id = c.doc_a
              |  JOIN hashed hb ON hb.doc_id = c.doc_b AND hb.h = ha.h
              |  GROUP BY 1, 2),
              |exact AS (
              |  SELECT i.doc_a, i.doc_b FROM pinter i
              |  JOIN sizes sa ON sa.doc_id = i.doc_a
              |  JOIN sizes sb ON sb.doc_id = i.doc_b
              |  WHERE CAST(i.n_inter AS DOUBLE)
              |      / (sa.n + sb.n - i.n_inter) >= 0.5),
              |m AS (SELECT
              |  (SELECT count(*) FROM exact)::BIGINT AS n_exact,
              |  (SELECT count(*) FROM exact e JOIN lsh l
              |     ON e.doc_a = l.doc_a AND e.doc_b = l.doc_b)::BIGINT
              |    AS n_found,
              |  (SELECT count(*) FROM cand)::BIGINT AS n_candidates,
              |  (SELECT count(*) FROM lsh)::BIGINT AS n_verified)
              |SELECT n_exact, n_found,
              |  CASE WHEN n_exact > 0
              |    THEN round(n_found::DOUBLE / n_exact, 6) END AS recall_r,
              |  n_candidates, n_verified,
              |  CASE WHEN n_candidates > 0
              |    THEN round(n_verified::DOUBLE / n_candidates, 6) END
              |    AS precision_r
              |FROM m""".stripMargin),
      (s, d) => {
        import graft.ops.Dedup
        val sh = docShingleTable(s, d)
        // the four audit branches below evaluate CONCURRENTLY (each is
        // a broadcast side of the final crossJoin), so multi-consumer
        // frames must be MATERIALIZED before the plan is built — lazy
        // cache() races from the parallel broadcast jobs and the whole
        // LSH/exact pipeline executes more than once (the q283 lesson).
        // localCheckpoint is eager: one computation, branches read
        // blocks.
        // ONE set-row build serves both verifies (LSH branch + exact
        // branch): the per-doc sorted-hash arrays are a pure function
        // of the shingle table, and the bucketed groupBy is
        // exchange-free — computing them per branch was the audit's
        // only duplicated pass.
        val sets = Dedup.docShingleSets(sh, "doc_id").localCheckpoint()
        val cand = withSubsetCoPartition(s)(
          Dedup.bandJoin(docBandTable(s, d), "doc_id", "doc_a", "doc_b")
            .localCheckpoint())
        val lsh = Dedup.jaccardOnSets(sets, cand, "doc_id")
          .where(col("jaccard") >= 0.5)
          .select("doc_a", "doc_b").localCheckpoint()
        val exact = Dedup.prefixFilterPairsWithSets(sh, sets, "doc_id",
            0.5)
          .select("doc_a", "doc_b").localCheckpoint()
        exact.agg(count(lit(1)).as("n_exact"))
          .crossJoin(exact.join(lsh, Seq("doc_a", "doc_b"))
            .agg(count(lit(1)).as("n_found")))
          .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
          .crossJoin(lsh.agg(count(lit(1)).as("n_verified")))
          .select(col("n_exact"), col("n_found"),
            when(col("n_exact") > 0, round(col("n_found").cast("double")
              / nullif(col("n_exact").cast("double"), lit(0.0)), 6))
              .as("recall_r"),
            col("n_candidates"), col("n_verified"),
            when(col("n_candidates") > 0,
              round(col("n_verified").cast("double")
                / nullif(col("n_candidates").cast("double"), lit(0.0)),
                6)).as("precision_r"))
      }),

    // SAMPLED LSH-recall audit — the form of q262 that is actually
    // runnable at 100 TB: the exact prefix-filter ground truth is
    // computed only on a deterministic md5 doc stratum (the
    // Curation.stratifiedSample bucket; a p-fraction sample cuts the
    // exact join's shared-token pair volume to ~p²), production LSH
    // pairs restricted to that stratum are scored against it, and the
    // estimated recall carries a Wilson 95% interval
    // (Infer.wilsonInterval — the q241 machinery) instead of a false
    // point-certainty. Beyond small corpora this REPLACES q262's
    // full-exact audit (SCALE.md "LSH recall auditing").
    recallSampledQ("q279_lsh_recall_sampled", RecallSamplePct),

    // the production-posture stratum: same audit at 10% — the ~p^2
    // exact-side discount the 50% demo cannot show (VERDICT r9 item 4)
    recallSampledQ("q338_lsh_recall_sampled10", 10)
  )
}
