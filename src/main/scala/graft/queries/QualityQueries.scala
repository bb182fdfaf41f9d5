package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Curation, Layout, Profile, Ranks, TextOps}
import graft.util.Tables._

/** Data-governance / quality-audit surface: functional-dependency
  * violations, Benford digit profiling, exact budget apportionment,
  * content-defined chunk dedup, deterministic mixture scheduling, and
  * slice-level AUC — the checks and allocators a corpus pipeline runs
  * between profiling ([[graft.ops.Profile]]) and curation
  * ([[graft.ops.Curation]]).
  */
object QualityQueries {

  private val normSql = TextQueries.normSql

  // q173: an odd budget forces fractional quotas through the
  // largest-remainder tie-break
  private val AllocBudget = 97L

  // q174: expected chunk length in tokens (CDC boundary modulus)
  private val ChunkModulus = 8

  // q175/q176: weights/labels derived from the source ordinal — both
  // engines compute them from the same string arithmetic
  private val WeightSql = "(substr(source, 4)::INT % 3 + 1)"
  private val LabelSql = "substr(source, 4)::INT % 2 = 0"

  val all: Seq[Q] = Seq(

    // Functional-dependency audit: o_custkey → o_orderstatus is (by
    // construction) violated for every multi-status customer; the audit
    // reports each violating key with its distinct-value and row counts.
    // Two stacked hash-aggs, no countDistinct Expand.
    Q("q171_fd_violations",
      Some("""WITH pairs AS (
             |  SELECT o_custkey, o_orderstatus, count(*) AS n
             |  FROM orders GROUP BY 1, 2)
             |SELECT o_custkey, count(*)::BIGINT AS n_vals,
             |  sum(n)::BIGINT AS n_rows
             |FROM pairs GROUP BY 1 HAVING count(*) > 1
             |ORDER BY o_custkey""".stripMargin),
      (s, d) => Profile.fdViolations(orders(s, d),
          "o_custkey", "o_orderstatus")
        .orderBy("o_custkey")),

    // Benford first-digit profile of order totals per priority class —
    // digit from the integer part's decimal STRING (never floor(log10),
    // a float landmine at powers of ten). ≤9 rows per group.
    Q("q172_benford_digits",
      Some("""WITH c AS (
             |  SELECT o_orderpriority,
             |    substr((floor(o_totalprice)::BIGINT)::VARCHAR, 1, 1)::INT
             |      AS digit,
             |    count(*)::BIGINT AS n_obs
             |  FROM orders WHERE o_totalprice >= 1 GROUP BY 1, 2)
             |SELECT o_orderpriority, digit, n_obs,
             |  round(n_obs / sum(n_obs) OVER (PARTITION BY o_orderpriority),
             |    6) AS obs_share,
             |  round(log10(1.0 + 1.0 / digit), 6) AS benford_share
             |FROM c ORDER BY o_orderpriority, digit""".stripMargin),
      (s, d) => Profile.benfordProfile(orders(s, d),
          "o_orderpriority", "o_totalprice")
        .orderBy("o_orderpriority", "digit")),

    // Largest-remainder apportionment of a 97-doc budget across langs —
    // all-integer quota arithmetic, Σ alloc = budget exactly.
    Q("q173_largest_remainder",
      Some(s"""WITH c AS (
              |  SELECT lang, count(*)::BIGINT AS n FROM documents
              |  GROUP BY 1),
              |t AS (SELECT sum(n)::BIGINT AS tot FROM c),
              |b AS (
              |  SELECT lang, n, ($AllocBudget * n) // tot AS base,
              |    ($AllocBudget * n) % tot AS rem
              |  FROM c CROSS JOIN t),
              |s AS (SELECT sum(base)::BIGINT AS spent FROM b),
              |r AS (
              |  SELECT lang, n, base, rem,
              |    row_number() OVER (ORDER BY rem DESC, lang) AS rk
              |  FROM b)
              |SELECT lang, n AS n_docs,
              |  (base + CASE WHEN rk <= $AllocBudget - spent
              |     THEN 1 ELSE 0 END)::BIGINT AS alloc
              |FROM r CROSS JOIN s ORDER BY lang""".stripMargin),
      (s, d) => Curation.largestRemainderAlloc(
          documents(s, d), "lang", AllocBudget)
        .select(col("lang"), col("n").as("n_docs"), col("alloc"))
        .orderBy("lang")),

    // Content-defined chunk dedup: CDC fingerprints shared across
    // occurrences — the sub-document twin of q24's whole-doc exact dedup.
    Q("q174_content_chunks",
      Some(s"""WITH toks AS (
              |  SELECT doc_id, i - 1 AS pos, t[i] AS term FROM (
              |    SELECT doc_id, string_split($normSql, ' ') AS t
              |    FROM documents) d,
              |    unnest(generate_series(1, len(t))) AS g(i)),
              |ch AS (
              |  SELECT doc_id, pos, term,
              |    coalesce(sum(CASE WHEN
              |        ('0x' || substr(md5(term), 1, 15))::BIGINT
              |          % $ChunkModulus = 0 THEN 1 ELSE 0 END)
              |      OVER (PARTITION BY doc_id ORDER BY pos
              |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              |      0) AS chunk_id
              |  FROM toks),
              |agg AS (
              |  SELECT doc_id, chunk_id, count(*) AS n_terms,
              |    md5(string_agg(term, ' ' ORDER BY pos)) AS chunk_md5
              |  FROM ch GROUP BY 1, 2),
              |per_doc AS (
              |  SELECT chunk_md5, doc_id, count(*) AS k,
              |    min(n_terms) AS nt
              |  FROM agg GROUP BY 1, 2)
              |SELECT chunk_md5, sum(k)::BIGINT AS n_occ,
              |  count(*)::BIGINT AS n_docs, min(nt)::BIGINT AS n_terms
              |FROM per_doc GROUP BY 1 HAVING sum(k) > 1
              |ORDER BY n_occ DESC, chunk_md5""".stripMargin),
      (s, d) => {
        val ch = TextOps.contentChunks(
          documents(s, d), "doc_id", "text", ChunkModulus)
        ch.groupBy(col("chunk_md5"), col("doc_id"))
          .agg(count(lit(1)).as("_k"), min(col("n_terms")).as("_nt"))
          .groupBy(col("chunk_md5"))
          .agg(sum(col("_k")).as("n_occ"), count(lit(1)).as("n_docs"),
            min(col("_nt")).as("n_terms"))
          .where(col("n_occ") > 1)
          .orderBy(col("n_occ").desc, col("chunk_md5"))
      }),

    // Stride-scheduled mixture: weights 1–3 by source ordinal, first 500
    // positions of the deterministic interleaved epoch order.
    Q("q175_stride_interleave",
      Some(s"""SELECT * FROM (
              |  SELECT row_number() OVER (ORDER BY vt, source, doc_id)
              |    ::BIGINT AS pos, source, doc_id, round(vt, 6) AS vt_r
              |  FROM (
              |    SELECT doc_id, source, rn / $WeightSql AS vt FROM (
              |      SELECT doc_id, source, row_number() OVER (
              |        PARTITION BY source ORDER BY doc_id) AS rn
              |      FROM documents) r) v) p
              |WHERE pos <= 500 ORDER BY pos""".stripMargin),
      (s, d) => Curation.strideInterleave(documents(s, d),
          "doc_id", "source",
          substring(col("source"), 4, 8).cast("int") % 3 + 1)
        .where(col("pos") <= 500)
        .select(col("pos"), col("source"), col("doc_id"),
          round(col("vt"), 6).as("vt_r"))
        .orderBy("pos")),

    // Exact per-lang quartiles of n_chars via banded rank + rational
    // interpolation — percentile_cont semantics with no per-group
    // single-task sort and no sketch error.
    Q("q177_exact_quantiles",
      Some("""SELECT lang, count(*)::BIGINT AS n, 0.25::DOUBLE AS q,
             |  quantile_cont(n_chars, 0.25) AS q_val
             |FROM documents GROUP BY lang
             |UNION ALL
             |SELECT lang, count(*)::BIGINT, 0.5::DOUBLE,
             |  quantile_cont(n_chars, 0.5) FROM documents GROUP BY lang
             |UNION ALL
             |SELECT lang, count(*)::BIGINT, 0.75::DOUBLE,
             |  quantile_cont(n_chars, 0.75) FROM documents GROUP BY lang
             |ORDER BY lang, q""".stripMargin),
      (s, d) => Ranks.exactQuantiles(
          documents(s, d).select("doc_id", "lang", "n_chars"),
          "lang", "n_chars", "doc_id", bandWidth = 100.0,
          nums = Seq(1, 2, 3), den = 4)
        .orderBy("lang", "q")),

    // Two-sample KS drift: low- vs high-ordinal sources per lang over
    // n_chars — max CDF gap, windows only on the distinct-value table.
    Q("q178_ks_drift",
      Some("""WITH per AS (
             |  SELECT lang, n_chars AS v,
             |    sum(CASE WHEN substr(source, 4)::INT < 10
             |        THEN 1 ELSE 0 END)::BIGINT AS a,
             |    sum(CASE WHEN substr(source, 4)::INT < 10
             |        THEN 0 ELSE 1 END)::BIGINT AS b
             |  FROM documents GROUP BY 1, 2),
             |c AS (
             |  SELECT lang, a, b,
             |    sum(a) OVER (PARTITION BY lang ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             |    sum(b) OVER (PARTITION BY lang ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
             |    sum(a) OVER (PARTITION BY lang) AS ta,
             |    sum(b) OVER (PARTITION BY lang) AS tb
             |  FROM per)
             |SELECT lang, min(ta)::BIGINT AS n_a, min(tb)::BIGINT AS n_b,
             |  round(max(abs(ca / ta - cb / tb)), 6) AS ks_d
             |FROM c GROUP BY 1 ORDER BY lang""".stripMargin),
      (s, d) => Profile.ksDrift(documents(s, d), "lang", "n_chars",
          substring(col("source"), 4, 8).cast("int") < 10)
        .orderBy("lang")),

    // Lang-ID confusion matrix: the q26 heuristic scored against the
    // labeled lang — per-(actual, predicted) counts and within-actual
    // shares, the slice-eval that gates a classifier before it filters.
    Q("q179_lang_confusion", {
      val scoreCols = TextOps.langProfiles.map { case (l, pat) =>
        s"len(regexp_extract_all(text, '$pat')) AS score_$l"
      }.mkString(", ")
      val langs = TextOps.langProfiles.map(_._1)
      val cases = langs.map { l =>
        val geOthers = langs.filter(_ != l)
          .map(o => s"score_$l >= score_$o").mkString(" AND ")
        s"WHEN score_$l > 0 AND $geOthers THEN '$l'"
      }.mkString(" ")
      Some(s"""WITH pred AS (
              |  SELECT doc_id, lang, CASE $cases ELSE 'und' END AS lang_pred
              |  FROM (SELECT doc_id, lang, $scoreCols FROM documents) t)
              |SELECT lang, lang_pred, count(*)::BIGINT AS n,
              |  round(count(*) / sum(count(*)) OVER (PARTITION BY lang),
              |    6) AS share_r
              |FROM pred GROUP BY 1, 2
              |ORDER BY lang, lang_pred""".stripMargin)
    },
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        TextOps.langId(documents(s, d), "text")
          .groupBy(col("lang"), col("lang_pred"))
          .agg(count(lit(1)).as("n"))
          .withColumn("share_r", round(
            col("n") / sum(col("n")).over(Window.partitionBy("lang")), 6))
          .orderBy("lang", "lang_pred")
      }),

    // Marginal n-gram coverage per md5 shard decile — the
    // diminishing-returns curve of ingesting more of the corpus.
    Q("q180_coverage_curve",
      Some(s"""WITH toks AS (
              |  SELECT doc_id,
              |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
              |      % 10 AS shard,
              |    string_split($normSql, ' ') AS t
              |  FROM documents),
              |grams AS (
              |  SELECT DISTINCT shard, doc_id,
              |    array_to_string(t[i:i+2], ' ') AS gram
              |  FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)),
              |fs AS (SELECT gram, min(shard) AS shard FROM grams
              |  GROUP BY 1),
              |c AS (SELECT shard, count(*)::BIGINT AS new_grams FROM fs
              |  GROUP BY 1)
              |SELECT shard::INT AS shard, new_grams,
              |  sum(new_grams) OVER (ORDER BY shard
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |    ::BIGINT AS cum_grams
              |FROM c ORDER BY shard""".stripMargin),
      (s, d) => graft.ops.CorpusAudit.coverageCurve(
          documents(s, d), "doc_id", "text", n = 3, shards = 10)
        .orderBy("shard")),

    // Slice-level discrimination: AUC of n_chars against an
    // even-ordinal-source pseudo-label, per lang — midrank-exact
    // Mann–Whitney, windows only over the distinct-score table.
    Q("q176_rank_auc",
      Some(s"""WITH per AS (
              |  SELECT lang, n_chars,
              |    sum(CASE WHEN $LabelSql THEN 1 ELSE 0 END)::BIGINT AS p,
              |    sum(CASE WHEN $LabelSql THEN 0 ELSE 1 END)::BIGINT AS n
              |  FROM documents GROUP BY 1, 2),
              |c AS (
              |  SELECT lang, p, n,
              |    coalesce(sum(n) OVER (PARTITION BY lang ORDER BY n_chars
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              |      0) AS cumn
              |  FROM per)
              |SELECT lang, sum(p)::BIGINT AS n_pos, sum(n)::BIGINT AS n_neg,
              |  round(sum(p * (2 * cumn + n))
              |    / (2.0 * sum(p) * sum(n)), 6) AS auc
              |FROM c GROUP BY 1 ORDER BY lang""".stripMargin),
      (s, d) => Ranks.rankSumAuc(
          documents(s, d).withColumn("label",
            substring(col("source"), 4, 8).cast("int") % 2 === 0),
          "lang", "n_chars", "label")
        .orderBy("lang")),

    // Zone-map skipping audit: Z-order pages vs a hash deal under the
    // same range predicate — the measured scan-pruning win of clustered
    // layout (pages skippable on min/max stats alone).
    Q("q181_zonemap_skip",
      Some(s"""WITH xy AS (
              |  SELECT l_partkey % 64 AS x, l_suppkey % 64 AS y
              |  FROM lineitem),
              |p AS (
              |  SELECT 'zorder' AS layout,
              |    ((${Layout.zOrderKeySql("x", "y", 6)}) >> 6) AS page, x
              |  FROM xy
              |  UNION ALL
              |  SELECT 'hash',
              |    ('0x' || substr(md5(x::VARCHAR || '#' || y::VARCHAR),
              |      1, 15))::BIGINT % 64, x
              |  FROM xy),
              |pg AS (
              |  SELECT layout, page, count(*) AS n,
              |    min(x) AS xmin, max(x) AS xmax
              |  FROM p GROUP BY 1, 2)
              |SELECT layout, count(*)::BIGINT AS n_pages,
              |  sum(n)::BIGINT AS n_rows,
              |  sum(CASE WHEN xmax < 16 OR xmin > 31 THEN 1 ELSE 0 END)
              |    ::BIGINT AS pages_skipped,
              |  sum(CASE WHEN xmax < 16 OR xmin > 31 THEN n ELSE 0 END)
              |    ::BIGINT AS rows_skipped,
              |  round(sum(CASE WHEN xmax < 16 OR xmin > 31 THEN n
              |      ELSE 0 END) / sum(n), 6) AS skip_r
              |FROM pg GROUP BY 1 ORDER BY layout""".stripMargin),
      (s, d) => Layout.zoneMapSkipAudit(
          lineitem(s, d).select((col("l_partkey") % 64).as("x"),
            (col("l_suppkey") % 64).as("y")),
          "x", "y", bits = 6, pageBits = 6, lo = 16L, hi = 31L)
        .orderBy("layout")),

    // Order-independent corpus version fingerprint per source + the
    // rollup '*' root — dataset versioning without sorting anything.
    Q("q182_corpus_fingerprint",
      Some(s"""SELECT coalesce(source, '*') AS source,
              |  count(*)::BIGINT AS n_docs,
              |  (sum(('0x' || substr(md5(md5($normSql)), 1, 15))::BIGINT)
              |    ::HUGEINT % 1152921504606846976)::BIGINT AS fingerprint
              |FROM documents GROUP BY ROLLUP(source)
              |ORDER BY source""".stripMargin),
      (s, d) => graft.ops.CorpusAudit.corpusFingerprint(
          documents(s, d), "source", "text")
        .orderBy("source")),

    // Poisson-bootstrap SE of per-lang mean doc length (Chamandy et al.
    // 2012): resampling as per-row Poisson(1) weights, one pass, no
    // materialized replicas.
    Q("q183_bootstrap_se", {
      val u = "('0x' || substr(md5(d.doc_id::VARCHAR || '#' || " +
        "r.rep::VARCHAR), 1, 15))::BIGINT / 1152921504606846976.0"
      Some(s"""WITH reps AS (
              |  SELECT unnest(generate_series(0, 19)) AS rep),
              |w AS (
              |  SELECT d.lang, d.n_chars, r.rep,
              |    ${Profile.poissonCdfSql(u)} AS w
              |  FROM documents d CROSS JOIN reps r),
              |m AS (
              |  SELECT lang, rep, sum(w * n_chars) AS ws, sum(w) AS wn,
              |    count(*) AS n
              |  FROM w GROUP BY 1, 2),
              |mm AS (SELECT lang, n, ws / wn AS m FROM m WHERE wn > 0)
              |SELECT lang, max(n)::BIGINT AS n_rows,
              |  count(*)::BIGINT AS n_reps,
              |  round(sum(m) / count(*), 6) AS boot_mean_r,
              |  round(sqrt((sum(m * m) / count(*)
              |      - (sum(m) / count(*)) * (sum(m) / count(*)))
              |    * (count(*) / (count(*) - 1.0))), 6) AS boot_se_r
              |FROM mm GROUP BY 1 ORDER BY lang""".stripMargin)
    },
      (s, d) => Profile.poissonBootstrap(
          documents(s, d), "lang", "n_chars", "doc_id", b = 20)
        .orderBy("lang")),

    // Join-cardinality audit without executing the join: per-key
    // n_a·n_b contributions of events⋈orders on the user/customer key.
    Q("q184_join_cardinality",
      Some("""WITH ca AS (
             |  SELECT user_id AS key, count(*) AS n_a FROM events
             |  GROUP BY 1),
             |cb AS (
             |  SELECT o_custkey AS key, count(*) AS n_b FROM orders
             |  GROUP BY 1),
             |j AS (
             |  SELECT key, n_a, n_b, n_a * n_b AS contrib
             |  FROM ca JOIN cb USING (key)),
             |r AS (
             |  SELECT key, n_a, n_b, contrib,
             |    row_number() OVER (ORDER BY contrib DESC, key) AS rank,
             |    sum(contrib) OVER () AS tot
             |  FROM j)
             |SELECT rank::BIGINT AS rank, key, n_a::BIGINT AS n_a,
             |  n_b::BIGINT AS n_b, contrib::BIGINT AS contrib,
             |  round(contrib / tot, 6) AS share_r
             |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin),
      (s, d) => graft.ops.Skew.joinCardinalityAudit(
          events(s, d).select(col("user_id").as("key")),
          orders(s, d).select(col("o_custkey").as("key")),
          "key", topK = 20)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("rank")),

    // Gopher-style quality gates: per-rule pass/fail report with pure
    // integer rule tests (no float threshold boundaries).
    Q("q201_gopher_rules", {
      val stopPat = TextOps.langProfiles.head._2
      Some(s"""WITH m AS (
              |  SELECT doc_id,
              |    len(string_split($normSql, ' '))::BIGINT AS nt,
              |    length(replace($normSql, ' ', ''))::BIGINT AS sumlen,
              |    length(text)::BIGINT AS nc,
              |    len(regexp_extract_all(text, '[^a-zA-Z0-9 ]'))::BIGINT
              |      AS nsym,
              |    len(regexp_extract_all(text, '$stopPat'))::BIGINT
              |      AS nstop,
              |    len(list_filter(string_split($normSql, ' '),
              |      t -> regexp_matches(t, '[a-z]')))::BIGINT AS nalpha
              |  FROM documents),
              |r AS (
              |  SELECT unnest([
              |    {'rule': '1_token_count',
              |     'pass': nt >= 50 AND nt <= 100000},
              |    {'rule': '2_mean_word_len',
              |     'pass': sumlen >= 3 * nt AND sumlen <= 10 * nt},
              |    {'rule': '3_symbol_ratio', 'pass': 10 * nsym < nc},
              |    {'rule': '4_stopword_frac', 'pass': 20 * nstop > nt},
              |    {'rule': '5_alpha_frac',
              |     'pass': 5 * nalpha >= 4 * nt},
              |    {'rule': '6_all', 'pass':
              |      nt >= 50 AND nt <= 100000
              |      AND sumlen >= 3 * nt AND sumlen <= 10 * nt
              |      AND 10 * nsym < nc AND 20 * nstop > nt
              |      AND 5 * nalpha >= 4 * nt}], recursive := true)
              |  FROM m)
              |SELECT rule, sum(CASE WHEN pass THEN 1 ELSE 0 END)::BIGINT
              |    AS n_pass,
              |  sum(CASE WHEN pass THEN 0 ELSE 1 END)::BIGINT AS n_fail,
              |  round(sum(CASE WHEN pass THEN 1 ELSE 0 END)
              |    / count(*), 6) AS pass_rate_r
              |FROM r GROUP BY rule ORDER BY rule""".stripMargin)
    },
      (s, d) => TextOps.gopherRules(documents(s, d), "doc_id", "text")
        .orderBy("rule")),

    // Rolling 7-day OLS slope of daily event volume per type — the
    // local-trend monitor; exact integer frame sums, one division.
    Q("q202_rolling_slope",
      Some("""WITH d AS (
             |  SELECT event_type, ts::DATE AS day, count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |x AS (
             |  SELECT event_type, day, n,
             |    (day - DATE '1970-01-01')::BIGINT AS xd
             |  FROM d),
             |f AS (
             |  SELECT event_type, day, n,
             |    count(*) OVER w AS fn, sum(xd) OVER w AS sx,
             |    sum(n) OVER w AS sy, sum(xd * n) OVER w AS sxy,
             |    sum(xd * xd) OVER w AS sxx
             |  FROM x WINDOW w AS (PARTITION BY event_type ORDER BY day
             |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
             |SELECT event_type, day, n::BIGINT AS n,
             |  CASE WHEN fn * sxx - sx * sx > 0
             |    THEN round((fn * sxy - sx * sy)
             |      / (fn * sxx - sx * sx), 6)
             |    ELSE NULL END AS slope_r
             |FROM f ORDER BY event_type, day""".stripMargin),
      (s, d) => graft.ops.TimeSeries.rollingSlope(events(s, d),
          "event_type", "ts", windowDays = 7)
        .orderBy("event_type", "day")),

    // Budget-constrained quality selection: spend each source's 600
    // token budget on its best-scored docs — banded rank + banded
    // running sum, no per-source single-task window.
    Q("q203_budget_trim",
      Some(s"""WITH sdocs AS (
              |  SELECT doc_id, source,
              |    len(string_split($normSql, ' '))::BIGINT AS nt,
              |    list_sum(list_transform(string_split($normSql, ' '),
              |      t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 2001
              |        - 1000))::BIGINT AS wsum
              |  FROM documents),
              |sc AS (
              |  SELECT doc_id, source, nt,
              |    wsum / (nt * 1000.0) AS score
              |  FROM sdocs WHERE nt > 0),
              |r AS (
              |  SELECT *, row_number() OVER (PARTITION BY source
              |    ORDER BY score DESC, doc_id) AS rn
              |  FROM sc),
              |c AS (
              |  SELECT *, sum(nt) OVER (PARTITION BY source ORDER BY rn
              |    ROWS UNBOUNDED PRECEDING) AS cum
              |  FROM r)
              |SELECT source, doc_id, nt AS n_tokens,
              |  cum::BIGINT AS cum_tokens
              |FROM c WHERE cum <= 600
              |ORDER BY source, cum_tokens""".stripMargin),
      (s, d) => {
        val norm = TextOps.normalize(col("text"))
        val scored = documents(s, d)
          .select(col("doc_id"), col("source"),
            TextOps.tokens(norm).as("_toks"))
          .withColumn("_nt", size(col("_toks")).cast("long"))
          .withColumn("_wsum", expr(
            "aggregate(transform(_toks, t -> CAST(conv(substring(" +
              "md5(t), 1, 15), 16, 10) AS LONG) % 2001 - 1000), 0L, " +
              "(a, x) -> a + x)"))
          .where(col("_nt") > 0)
          .withColumn("score", col("_wsum") / (col("_nt") * 1000.0))
        Curation.budgetTrim(scored, "source", "doc_id", "_nt",
            "score", budget = 600L, scoreBandWidth = 0.05)
          .select(col("source"), col("doc_id"),
            col("_nt").as("n_tokens"), col("cum_tokens"))
          .orderBy("source", "cum_tokens")
      }),

    // Within-session funnel: the q82 ordered cascade scoped to q68's
    // gap sessions — conversion must happen INSIDE one session, the
    // product metric a global funnel silently overstates.
    Q("q199_session_funnel",
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
             |  SELECT *, user_id::VARCHAR || '#' ||
             |    CAST(sum(news) OVER (PARTITION BY user_id
             |      ORDER BY ts NULLS FIRST, event_id
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT)::VARCHAR AS ent
             |  FROM g),
             |t1s AS (
             |  SELECT ent, event_type, ts,
             |    min(CASE WHEN event_type = 'view' THEN ts END)
             |      OVER (PARTITION BY ent) AS t1
             |  FROM s),
             |t2s AS (
             |  SELECT ent, event_type, ts, t1,
             |    min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts
             |        END) OVER (PARTITION BY ent) AS t2
             |  FROM t1s),
             |t3s AS (
             |  SELECT ent, t1, t2,
             |    min(CASE WHEN event_type = 'purchase' AND ts > t2
             |        THEN ts END) OVER (PARTITION BY ent) AS t3
             |  FROM t2s),
             |st AS (
             |  SELECT ent,
             |    max(CASE WHEN t3 IS NOT NULL THEN 3
             |             WHEN t2 IS NOT NULL THEN 2
             |             WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS stage
             |  FROM t3s GROUP BY ent)
             |SELECT stage AS funnel_stage, count(*)::BIGINT AS n_sessions
             |FROM st GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        val sess = graft.ops.Sessionize.assignSessions(events(s, d),
            "user_id", "ts", "event_id", gapSeconds = 21600L)
          .withColumn("ent", concat(col("user_id").cast("string"),
            lit("#"), col("session_idx").cast("string")))
        graft.ops.Behavior.funnel(sess, "ent", "event_type", "ts",
            Seq("view", "click", "purchase"))
          .groupBy(col("funnel_stage"))
          .agg(count(lit(1)).as("n_sessions"))
          .orderBy("funnel_stage")
      }),

    // Corpus-health scorecard: the one-row daily governance report —
    // volume, exact-dup mass, token budget, language entropy, filter
    // keep-rate, and the q182 version fingerprint, all integer-exact
    // or shared-parenthesization arithmetic.
    Q("q200_corpus_scorecard",
      Some(s"""WITH enr AS (
              |  SELECT doc_id, lang, source, md5($normSql) AS ck,
              |    len(string_split($normSql, ' '))::BIGINT AS nt,
              |    list_sum(list_transform(string_split($normSql, ' '),
              |      t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 2001
              |        - 1000))::BIGINT AS wsum
              |  FROM documents),
              |main AS (
              |  SELECT count(*)::BIGINT AS n_docs,
              |    sum(nt)::BIGINT AS n_tokens,
              |    sum(CASE WHEN wsum > 0 THEN 1 ELSE 0 END)::BIGINT
              |      AS n_keep,
              |    (sum(('0x' || substr(md5(ck), 1, 15))::BIGINT)::HUGEINT
              |      % 1152921504606846976)::BIGINT AS fingerprint
              |  FROM enr),
              |dc AS (
              |  SELECT count(*)::BIGINT AS n_distinct FROM (
              |    SELECT ck FROM enr GROUP BY ck) t),
              |lc AS (SELECT lang, count(*) AS nl FROM enr GROUP BY 1),
              |lt AS (SELECT sum(nl)::DOUBLE AS n,
              |    count(*)::BIGINT AS n_langs FROM lc),
              |le AS (
              |  SELECT n_langs,
              |    sum(-(nl / n) * ln(nl / n)) AS lang_ent
              |  FROM lc CROSS JOIN lt GROUP BY n_langs),
              |sc AS (SELECT count(*)::BIGINT AS n_sources FROM (
              |  SELECT source FROM enr GROUP BY source) t)
              |SELECT n_docs, n_distinct,
              |  round(1.0 - n_distinct / n_docs, 6) AS dup_ratio_r,
              |  n_tokens, n_langs, n_sources,
              |  round(lang_ent, 6) AS lang_entropy_r,
              |  round(n_keep / n_docs, 6) AS keep_rate_r, fingerprint
              |FROM main CROSS JOIN dc CROSS JOIN le
              |  CROSS JOIN sc""".stripMargin),
      (s, d) => {
        val norm = TextOps.normalize(col("text"))
        val enr = documents(s, d).select(col("lang"), col("source"),
            md5(norm).as("_ck"), TextOps.tokens(norm).as("_toks"))
          .withColumn("_nt", size(col("_toks")).cast("long"))
          .withColumn("_wsum", expr(
            "aggregate(transform(_toks, t -> CAST(conv(substring(" +
              "md5(t), 1, 15), 16, 10) AS LONG) % 2001 - 1000), 0L, " +
              "(a, x) -> a + x)"))
        val main = enr.agg(count(lit(1)).as("n_docs"),
          sum(col("_nt")).as("n_tokens"),
          sum(when(col("_wsum") > 0, 1L).otherwise(0L)).as("n_keep"),
          (sum(TextOps.hash60(col("_ck")).cast("decimal(38,0)"))
            % lit(1152921504606846976L)).cast("long").as("fingerprint"))
        val dc = enr.groupBy(col("_ck")).agg(count(lit(1)).as("_x"))
          .agg(count(lit(1)).as("n_distinct"))
        val lc = enr.groupBy(col("lang")).agg(count(lit(1)).as("_nl"))
        val lt = lc.agg(sum(col("_nl")).cast("double").as("_n"),
          count(lit(1)).as("n_langs"))
        val le = lc.crossJoin(broadcast(lt))
          .groupBy(col("n_langs"))
          .agg(sum(-(col("_nl") / col("_n"))
            * log(col("_nl") / col("_n"))).as("_lang_ent"))
        val sc = enr.groupBy(col("source")).agg(count(lit(1)).as("_y"))
          .agg(count(lit(1)).as("n_sources"))
        main.crossJoin(broadcast(dc)).crossJoin(broadcast(le))
          .crossJoin(broadcast(sc))
          .select(col("n_docs"), col("n_distinct"),
            round(lit(1.0) - col("n_distinct") / col("n_docs"), 6)
              .as("dup_ratio_r"),
            col("n_tokens"), col("n_langs"), col("n_sources"),
            round(col("_lang_ent"), 6).as("lang_entropy_r"),
            round(col("n_keep") / col("n_docs"), 6).as("keep_rate_r"),
            col("fingerprint"))
      }),

    // Point-in-time SCD2 join: each probe event picks up the dimension
    // version valid AT its own timestamp — the no-future-leakage
    // temporal join (dim = SCD2 of even event_ids, probes = odd).
    Q("q195_pit_scd2",
      Some("""WITH dim0 AS (
             |  SELECT user_id, event_type, ts, event_id FROM events
             |  WHERE event_id % 2 = 0),
             |ordered AS (
             |  SELECT user_id, event_type, ts, event_id,
             |    lag(event_type) OVER w AS prev_t,
             |    lag(event_id) OVER w AS prev_id
             |  FROM dim0
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |kept AS (
             |  SELECT user_id, event_type, ts, event_id FROM ordered
             |  WHERE prev_id IS NULL
             |     OR event_type IS DISTINCT FROM prev_t),
             |hist AS (
             |  SELECT user_id, event_type, ts AS valid_from,
             |    lead(ts) OVER wk AS valid_to,
             |    row_number() OVER wk AS version
             |  FROM kept
             |  WINDOW wk AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |probe AS (
             |  SELECT event_id, user_id, ts FROM events
             |  WHERE event_id % 2 = 1)
             |SELECT p.event_id, p.user_id, h.event_type AS dim_type,
             |  h.version::BIGINT AS version
             |FROM probe p JOIN hist h ON p.user_id = h.user_id
             |WHERE h.valid_from <= p.ts
             |  AND (h.valid_to IS NULL OR p.ts < h.valid_to)
             |ORDER BY p.event_id""".stripMargin),
      (s, d) => {
        val ev = events(s, d)
        val dim = graft.ops.Scd.scd2(
          ev.where(col("event_id") % 2 === 0)
            .select("user_id", "ts", "event_id", "event_type"),
          "user_id", "ts", "event_id", Seq("event_type"))
        val probes = ev.where(col("event_id") % 2 === 1)
          .select(col("event_id"), col("user_id"), col("ts"))
        graft.ops.Scd.pitJoin(probes, dim, "user_id", "ts")
          .select(col("event_id"), col("user_id"),
            col("event_type").as("dim_type"), col("version"))
          .orderBy("event_id")
      }),

    // Watermark-lateness profile: per type, quantiles of (running max
    // arrival-order timestamp − event time) — the measurement that SETS
    // a watermark delay. Running max via the banded two-level fold; the
    // quantiles via exactQuantiles; both scale-safe on low-cardinality
    // groups.
    Q("q196_lateness_profile",
      Some("""WITH l AS (
             |  SELECT event_type,
             |    epoch_us(max(ts) OVER (PARTITION BY event_type
             |      ORDER BY event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |    - epoch_us(ts) AS late_us
             |  FROM events)
             |SELECT event_type, count(*)::BIGINT AS n, 0.5::DOUBLE AS q,
             |  round(quantile_cont(late_us, 0.5) / 1e6, 6) AS late_s
             |FROM l GROUP BY event_type
             |UNION ALL
             |SELECT event_type, count(*)::BIGINT, 0.9::DOUBLE,
             |  round(quantile_cont(late_us, 0.9) / 1e6, 6)
             |FROM l GROUP BY event_type
             |UNION ALL
             |SELECT event_type, count(*)::BIGINT, 1.0::DOUBLE,
             |  round(quantile_cont(late_us, 1.0) / 1e6, 6)
             |FROM l GROUP BY event_type
             |ORDER BY event_type, q""".stripMargin),
      (s, d) => {
        val ev = events(s, d).select(col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        val late = Ranks.bandedRunningMax(ev, "event_type", "event_id",
            "us", bandWidth = 1024.0)
          .select(col("event_type"), col("event_id"),
            (col("runmax") - col("us")).as("late_us"))
        Ranks.exactQuantiles(late, "event_type", "late_us", "event_id",
            bandWidth = 1e8, nums = Seq(5, 9, 10), den = 10)
          .select(col("event_type"), col("n"), col("q"),
            round(col("q_val") / 1e6, 6).as("late_s"))
          .orderBy("event_type", "q")
      }),

    // Equi-depth (decile) histogram of order totals — the quantile-bin
    // complement to q91's fixed-width bins, deciles via ntileFromRank
    // over the banded exact rank (no single-task sort).
    Q("q197_equi_depth",
      Some("""WITH t AS (
             |  SELECT o_totalprice, ntile(10) OVER (
             |    ORDER BY o_totalprice, o_orderkey) AS decile
             |  FROM orders)
             |SELECT decile::INT AS decile, count(*)::BIGINT AS n_rows,
             |  min(o_totalprice) AS lo, max(o_totalprice) AS hi
             |FROM t GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        val ranked = Ranks.bandedRank(
          orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
            .withColumn("_g", lit(0)),
          "_g", "o_totalprice", "o_orderkey", bandWidth = 5000.0)
        ranked
          .withColumn("decile",
            Ranks.ntileFromRank(col("rnk"), col("grp_n"), 10))
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("o_totalprice")).as("lo"),
            max(col("o_totalprice")).as("hi"))
          .orderBy("decile")
      }),

    // Two-proportion A/B readout: md5-bucket arms over event users,
    // conversion = any purchase; lift + pooled z from integer counts.
    Q("q198_abtest",
      Some("""WITH u AS (
             |  SELECT user_id,
             |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |      AS conv,
             |    ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT
             |      % 100 >= 50 AS armb
             |  FROM events GROUP BY user_id),
             |a AS (
             |  SELECT
             |    sum(CASE WHEN NOT armb THEN 1 ELSE 0 END)::BIGINT AS n_a,
             |    sum(CASE WHEN NOT armb AND conv = 1 THEN 1 ELSE 0 END)
             |      ::BIGINT AS c_a,
             |    sum(CASE WHEN armb THEN 1 ELSE 0 END)::BIGINT AS n_b,
             |    sum(CASE WHEN armb AND conv = 1 THEN 1 ELSE 0 END)
             |      ::BIGINT AS c_b
             |  FROM u)
             |SELECT n_a, c_a, n_b, c_b,
             |  round(c_a / n_a, 6) AS rate_a_r,
             |  round(c_b / n_b, 6) AS rate_b_r,
             |  round(c_b / n_b - c_a / n_a, 6) AS lift_r,
             |  CASE WHEN n_a > 0 AND n_b > 0
             |      AND (c_a + c_b) / (n_a + n_b) > 0
             |      AND (c_a + c_b) / (n_a + n_b) < 1
             |    THEN round((c_b / n_b - c_a / n_a)
             |      / sqrt((c_a + c_b) / (n_a + n_b)
             |        * (1.0 - (c_a + c_b) / (n_a + n_b))
             |        * (1.0 / n_a + 1.0 / n_b)), 6)
             |    ELSE NULL END AS z_r
             |FROM a""".stripMargin),
      (s, d) => {
        val units = events(s, d).groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("_conv"))
          .withColumn("_arm",
            conv(substring(md5(col("user_id").cast("string")), 1, 8),
              16, 10).cast("long") % 100 >= 50)
        graft.ops.Behavior.twoProportionTest(units, col("_arm"),
          col("_conv") === 1L)
      }),

    // Interpolated Kneser-Ney bigram LM: continuation-count smoothing
    // (the production n-gram standard), top-30 bigrams with P_KN.
    Q("q186_kneser_ney",
      Some(s"""WITH toks AS (
              |  SELECT string_split($normSql, ' ') AS t FROM documents),
              |bi AS (
              |  SELECT t[g.i] AS w1, t[g.i + 1] AS w2
              |  FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)),
              |bc AS (SELECT w1, w2, count(*) AS n_ab FROM bi GROUP BY 1, 2),
              |c1 AS (SELECT w1, sum(n_ab) AS c_w1, count(*) AS n_succ
              |  FROM bc GROUP BY 1),
              |c2 AS (SELECT w2, count(*) AS n_pred FROM bc GROUP BY 1),
              |nb AS (SELECT count(*)::DOUBLE AS nbig FROM bc),
              |top AS (SELECT w1, w2, n_ab FROM bc
              |  ORDER BY n_ab DESC, w1, w2 LIMIT 30)
              |SELECT w1, w2, n_ab::BIGINT AS n_ab,
              |  round((greatest(n_ab - 0.75, 0.0)
              |    + 0.75 * n_succ * (n_pred / nbig)) / c_w1, 9) AS pkn_r
              |FROM top JOIN c1 USING (w1) JOIN c2 USING (w2)
              |  CROSS JOIN nb
              |ORDER BY n_ab DESC, w1, w2""".stripMargin),
      (s, d) => TextOps.kneserNeyBigrams(documents(s, d),
          "doc_id", "text", discount = 0.75, topK = 30)
        .orderBy(col("n_ab").desc, col("w1"), col("w2"))),

    // Reliability diagram for the q113 hashed-linear classifier: integer
    // bin arithmetic (no float floor at cell edges), integer rates.
    Q("q187_calibration_bins",
      Some(s"""WITH s AS (
              |  SELECT doc_id, substr(source, 4)::INT % 2 = 0 AS label,
              |    len(string_split($normSql, ' '))::BIGINT AS n,
              |    list_sum(list_transform(string_split($normSql, ' '),
              |      t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 2001
              |        - 1000))::BIGINT AS wsum
              |  FROM documents),
              |b AS (
              |  SELECT least(((wsum + 1000 * n) * 10) // (2000 * n), 9)
              |      AS bin,
              |    CASE WHEN label THEN 1 ELSE 0 END AS pos,
              |    CASE WHEN wsum > 0 THEN 1 ELSE 0 END AS keep
              |  FROM s WHERE n > 0)
              |SELECT bin::BIGINT AS bin, -1.0 + 2.0 * bin / 10 AS bin_lo,
              |  count(*)::BIGINT AS n_docs, sum(pos)::BIGINT AS n_pos,
              |  round(sum(pos) / count(*), 6) AS pos_rate_r,
              |  sum(keep)::BIGINT AS n_keep,
              |  round(sum(keep) / count(*), 6) AS keep_rate_r
              |FROM b GROUP BY bin ORDER BY bin""".stripMargin),
      (s, d) => TextOps.scoreCalibration(documents(s, d),
          "doc_id", "text",
          substring(col("source"), 4, 8).cast("int") % 2 === 0, bins = 10)
        .orderBy("bin")),

    // RLE-compressibility audit: runs of l_partkey%64 per page under
    // three write orders — colsort (x-sorted: RLE optimum), zorder (the
    // two-sided pruning compromise), hash deal (unclustered). q181
    // measures the pruning half of the same decision.
    Q("q188_run_length", {
      val zsql = Layout.zOrderKeySql("x", "y", 6)
      val hsql = "('0x' || substr(md5(x::VARCHAR || '#' || y::VARCHAR)," +
        " 1, 15))::BIGINT"
      Some(s"""WITH xy AS (
              |  SELECT l_partkey % 64 AS x, l_suppkey % 64 AS y
              |  FROM lineitem),
              |p AS (
              |  SELECT 'zorder' AS layout, (($zsql) >> 6) AS page, x,
              |    ($zsql) AS ord
              |  FROM xy
              |  UNION ALL
              |  SELECT 'hash', ($hsql) % 64, x, ($hsql) FROM xy
              |  UNION ALL
              |  SELECT 'colsort', x, x, (x << 6) | y FROM xy),
              |r AS (
              |  SELECT layout, page, x,
              |    CASE WHEN lag(x) OVER (PARTITION BY layout, page
              |        ORDER BY ord, x) IS DISTINCT FROM x
              |      THEN 1 ELSE 0 END AS newrun
              |  FROM p),
              |pg AS (SELECT layout, page, count(*) AS n,
              |    sum(newrun) AS runs
              |  FROM r GROUP BY 1, 2)
              |SELECT layout, count(*)::BIGINT AS n_pages,
              |  sum(n)::BIGINT AS n_rows, sum(runs)::BIGINT AS n_runs,
              |  round(sum(runs) / count(*), 6) AS runs_per_page_r,
              |  round(sum(runs) / sum(n), 6) AS runs_ratio_r
              |FROM pg GROUP BY 1 ORDER BY layout""".stripMargin)
    },
      (s, d) => Layout.runLengthAudit(
          lineitem(s, d).select((col("l_partkey") % 64).as("x"),
            (col("l_suppkey") % 64).as("y")),
          "x", "y", bits = 6, pageBits = 6)
        .orderBy("layout")),

    // Matryoshka truncation fidelity: cosine on the first d dims vs the
    // full 64 over a deterministic (id, id+1)/(id, id+97) pair sample.
    Q("q189_matryoshka",
      Some("""WITH pairs AS (
             |  SELECT a.embedding::DOUBLE[] AS va,
             |    b.embedding::DOUBLE[] AS vb
             |  FROM embeddings a JOIN embeddings b
             |    ON b.vec_id = a.vec_id + 1
             |  UNION ALL
             |  SELECT a.embedding::DOUBLE[], b.embedding::DOUBLE[]
             |  FROM embeddings a JOIN embeddings b
             |    ON b.vec_id = a.vec_id + 97),
             |tiers AS (SELECT unnest([8, 16, 32]) AS d),
             |sims AS (
             |  SELECT d, list_cosine_similarity(va, vb) AS f,
             |    list_cosine_similarity(va[1:d], vb[1:d]) AS t
             |  FROM pairs CROSS JOIN tiers),
             |ok AS (SELECT * FROM sims
             |  WHERE f IS NOT NULL AND t IS NOT NULL)
             |SELECT d::INT AS d, count(*)::BIGINT AS n_pairs,
             |  round(sum(abs(t - f)) / count(*), 6) AS mean_abs_diff_r,
             |  round((sum(f * t) / count(*)
             |      - (sum(f) / count(*)) * (sum(t) / count(*)))
             |    / (sqrt(sum(f * f) / count(*)
             |        - (sum(f) / count(*)) * (sum(f) / count(*)))
             |      * sqrt(sum(t * t) / count(*)
             |        - (sum(t) / count(*)) * (sum(t) / count(*)))), 6)
             |    AS corr_r
             |FROM ok GROUP BY d ORDER BY d""".stripMargin),
      (s, d) => graft.ops.Similarity.truncationFidelity(
          embeddings(s, d), "vec_id", "embedding",
          dims = Seq(8, 16, 32), offsets = Seq(1L, 97L))
        .orderBy("d")),

    // HLL set algebra: |A|, |B|, |A∪B| (register-max merge — exact on
    // sketches) and inclusion-exclusion |A∩B| for the custkey sets of
    // urgent vs normal orders, with the exact intersection for audit.
    Q("q190_hll_overlap", {
      val p = 8; val m = 1 << p; val w1 = 60 - p + 1
      val aMM = graft.ops.Sketches.hllAlpha(m) * m * m
      val lc = 2.5 * m
      val srcA = "SELECT o_custkey::VARCHAR AS k FROM orders " +
        "WHERE substr(o_orderpriority, 1, 1)::INT <= 2"
      val srcB = "SELECT o_custkey::VARCHAR AS k FROM orders " +
        "WHERE substr(o_orderpriority, 1, 1)::INT >= 3"
      def est(tag: String, src: String) =
        s"""h_$tag AS (SELECT ('0x' || substr(md5(k), 1, 15))::BIGINT
           |  AS h FROM ($src)),
           |b_$tag AS (SELECT h % $m AS idx, h // $m AS w FROM h_$tag),
           |r_$tag AS (SELECT idx, max(CASE WHEN w = 0 THEN $w1
           |    ELSE $w1 - length(bin(w)) END) AS reg
           |  FROM b_$tag GROUP BY idx),
           |f_$tag AS (SELECT coalesce(r.reg, 0) AS reg
           |  FROM grid LEFT JOIN r_$tag r USING (idx)),
           |a_$tag AS (SELECT sum(pow(2.0, -reg)) AS z,
           |    sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END)::BIGINT AS v0
           |  FROM f_$tag),
           |e_$tag AS (SELECT round(CASE WHEN v0 > 0
           |      AND $aMM / z <= $lc
           |    THEN $m.0 * ln($m.0 / v0) ELSE $aMM / z END, 6) AS est
           |  FROM a_$tag)""".stripMargin
      Some(s"""WITH grid AS (
              |  SELECT g AS idx
              |  FROM unnest(generate_series(0, ${m - 1})) AS t(g)),
              |${est("a", srcA)},
              |${est("b", srcB)},
              |${est("u", s"$srcA UNION ALL $srcB")},
              |x AS (SELECT count(*)::BIGINT AS n_true FROM (
              |  SELECT DISTINCT k FROM ($srcA)
              |  INTERSECT SELECT DISTINCT k FROM ($srcB)))
              |SELECT e_a.est AS est_a, e_b.est AS est_b,
              |  e_u.est AS est_union,
              |  round(e_a.est + e_b.est - e_u.est, 6) AS est_intersect,
              |  n_true
              |FROM e_a CROSS JOIN e_b CROSS JOIN e_u
              |  CROSS JOIN x""".stripMargin)
    },
      (s, d) => {
        val o = orders(s, d).withColumn("_pri",
          substring(col("o_orderpriority"), 1, 1).cast("int"))
        val a = o.where(col("_pri") <= 2).select(col("o_custkey"))
        val b = o.where(col("_pri") >= 3).select(col("o_custkey"))
        val exact = a.distinct().intersect(b.distinct())
          .agg(count(lit(1)).as("n_true"))
        graft.ops.Sketches.hllOverlap(a, b, "o_custkey", p = 8)
          .crossJoin(broadcast(exact))
      }),

    // CUSUM change-point monitor over daily event counts per type —
    // the running-extremum identity makes Page's recursion two windows.
    Q("q191_cusum", {
      val k = 4.0; val h = 25.0
      Some(s"""WITH d AS (
              |  SELECT event_type, ts::DATE AS day, count(*) AS n
              |  FROM events GROUP BY 1, 2),
              |w AS (
              |  SELECT event_type, day, n,
              |    sum(n) OVER (PARTITION BY event_type) AS tot,
              |    count(*) OVER (PARTITION BY event_type) AS days,
              |    row_number() OVER (PARTITION BY event_type
              |      ORDER BY day) AS rn,
              |    sum(n) OVER (PARTITION BY event_type ORDER BY day
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |      AS runsum
              |  FROM d),
              |s AS (
              |  SELECT event_type, day, n,
              |    runsum - rn * (tot / days + $k) AS sv
              |  FROM w),
              |m AS (
              |  SELECT event_type, day, n, sv,
              |    min(sv) OVER (PARTITION BY event_type ORDER BY day
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |      AS smin
              |  FROM s)
              |SELECT event_type, day, n::BIGINT AS n,
              |  round(sv - least(smin, 0.0), 6) AS cusum_r,
              |  (sv - least(smin, 0.0)) > $h AS alarm
              |FROM m ORDER BY event_type, day""".stripMargin)
    },
      (s, d) => graft.ops.TimeSeries.cusumDaily(events(s, d),
          "event_type", "ts", allowance = 4.0, threshold = 25.0)
        .orderBy("event_type", "day")),

    // FD discovery sweep over four orders columns (12 directed pairs):
    // the unique key's FDs hold, everything else reports violations.
    Q("q192_fd_discovery", {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderpriority")
      val branches = (for { l <- cols; r <- cols if l != r } yield
        s"""SELECT '$l' AS lhs, '$r' AS rhs,
           |  count(*)::BIGINT AS n_keys,
           |  sum(CASE WHEN v > 1 THEN 1 ELSE 0 END)::BIGINT
           |    AS n_violating,
           |  sum(CASE WHEN v > 1 THEN 1 ELSE 0 END) = 0 AS holds
           |FROM (SELECT $l AS lk, count(*) AS v FROM (
           |  SELECT $l, $r FROM orders GROUP BY 1, 2) t
           |  GROUP BY 1) g""".stripMargin).mkString("\nUNION ALL\n")
      Some(s"$branches\nORDER BY lhs, rhs")
    },
      (s, d) => Profile.fdDiscovery(orders(s, d),
          Seq("o_orderkey", "o_custkey", "o_orderstatus",
            "o_orderpriority"))
        .orderBy("lhs", "rhs")),

    // Mutual information lang ↔ source with entropies and NMI — the
    // effect-size companion to q167's chi².
    Q("q193_mutual_info",
      Some("""WITH j AS (
             |  SELECT lang, source, count(*) AS nxy FROM documents
             |  GROUP BY 1, 2),
             |nx AS (SELECT lang, sum(nxy) AS nx FROM j GROUP BY 1),
             |ny AS (SELECT source, sum(nxy) AS ny FROM j GROUP BY 1),
             |t AS (SELECT sum(nxy)::DOUBLE AS n FROM j),
             |mi AS (
             |  SELECT sum((nxy / n) * ln((nxy * n)
             |    / (nx::DOUBLE * ny))) AS mi
             |  FROM j JOIN nx USING (lang) JOIN ny USING (source)
             |    CROSS JOIN t),
             |hx AS (SELECT sum(-(nx / n) * ln(nx / n)) AS h
             |  FROM nx CROSS JOIN t),
             |hy AS (SELECT sum(-(ny / n) * ln(ny / n)) AS h
             |  FROM ny CROSS JOIN t),
             |tt AS (SELECT n::BIGINT AS n FROM t)
             |SELECT n, round(mi, 6) AS mi_r, round(hx.h, 6) AS h_x_r,
             |  round(hy.h, 6) AS h_y_r,
             |  round(mi / sqrt(hx.h * hy.h), 6) AS nmi_r
             |FROM tt CROSS JOIN mi CROSS JOIN hx
             |  CROSS JOIN hy""".stripMargin),
      (s, d) => Profile.mutualInfo(documents(s, d), "lang", "source")),

    // AMS F2 (self-join size) sketch vs the exact second moment over
    // lineitem order keys — 9 signed-sum counters vs a |keys| aggregate.
    Q("q185_ams_f2", {
      val signSums = (0 until 9).map { t =>
        s"""sum(CASE WHEN ((('0x' || substr(md5(l_orderkey::VARCHAR),
           | 1, 15))::BIGINT >> $t) & 1) = 1
           | THEN 1 ELSE -1 END) AS s$t""".stripMargin.replace("\n", "")
      }.mkString(", ")
      val ests = (0 until 9).map(t => s"s$t * s$t").mkString(", ")
      Some(s"""WITH s AS (SELECT $signSums FROM lineitem),
              |e AS (SELECT unnest([$ests]) AS est FROM s),
              |med AS (
              |  SELECT est FROM (
              |    SELECT est, row_number() OVER (ORDER BY est) AS rk
              |    FROM e) t WHERE rk = 5),
              |x AS (
              |  SELECT sum(f * f)::BIGINT AS f2_exact FROM (
              |    SELECT count(*) AS f FROM lineitem
              |    GROUP BY l_orderkey) t)
              |SELECT f2_exact, est::BIGINT AS f2_ams,
              |  round(abs(est::DOUBLE - f2_exact::DOUBLE) / f2_exact, 6)
              |    AS rel_err_r
              |FROM x CROSS JOIN med""".stripMargin)
    },
      (s, d) => graft.ops.Sketches.amsF2(
          lineitem(s, d).select("l_orderkey"), "l_orderkey", trials = 9)),

    // Isotonic (PAV) recalibration of q187's reliability diagram, in
    // closed minimax form on the 10-bin aggregate (Infer.pavIsotonic):
    // the monotone p(label | score bin) fit that pools adjacent rate
    // violations — raw rate next to the isotonic fit per bin. The
    // corpus reduces to (bin, n, k) in one hash-agg; the B² interval
    // minimax runs on the spec frame.
    Q("q280_isotonic_calibration",
      Some(s"""WITH s AS (
              |  SELECT doc_id, substr(source, 4)::INT % 2 = 0 AS label,
              |    len(string_split($normSql, ' '))::BIGINT AS n,
              |    list_sum(list_transform(string_split($normSql, ' '),
              |      t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 2001
              |        - 1000))::BIGINT AS wsum
              |  FROM documents),
              |b AS (
              |  SELECT least(((wsum + 1000 * n) * 10) // (2000 * n), 9)
              |      AS bin,
              |    CASE WHEN label THEN 1 ELSE 0 END AS pos
              |  FROM s WHERE n > 0),
              |bins AS (
              |  SELECT bin::BIGINT AS bin, count(*)::BIGINT AS n_docs,
              |    sum(pos)::BIGINT AS n_pos
              |  FROM b GROUP BY bin),
              |cum AS (
              |  SELECT bin, n_docs, n_pos,
              |    sum(n_docs) OVER (ORDER BY bin) AS cn,
              |    sum(n_pos) OVER (ORDER BY bin) AS ck
              |  FROM bins),
              |iv AS (
              |  SELECT l.bin AS h, r.bin AS j,
              |    (r.ck - (l.ck - l.n_pos))::DOUBLE
              |      / (r.cn - (l.cn - l.n_docs)) AS mean
              |  FROM cum l JOIN cum r ON l.bin <= r.bin),
              |mn AS (
              |  SELECT i.bin AS bin, v.h, min(v.mean) AS mn
              |  FROM bins i JOIN iv v ON v.h <= i.bin AND v.j >= i.bin
              |  GROUP BY 1, 2),
              |iso AS (SELECT bin, max(mn) AS iso FROM mn GROUP BY 1)
              |SELECT b2.bin, -1.0 + 2.0 * b2.bin / 10 AS bin_lo,
              |  b2.n_docs, b2.n_pos,
              |  round(b2.n_pos / b2.n_docs, 6) AS pos_rate_r,
              |  round(iso.iso, 6) AS iso_rate_r
              |FROM bins b2 JOIN iso USING (bin)
              |ORDER BY bin""".stripMargin),
      (s, d) => {
        val cal = TextOps.scoreCalibration(documents(s, d),
          "doc_id", "text",
          substring(col("source"), 4, 8).cast("int") % 2 === 0, bins = 10)
          .select(col("bin"), col("bin_lo"), col("n_docs"),
            col("n_pos"), col("pos_rate_r"))
        graft.ops.Infer.pavIsotonic(cal, "bin", "n_docs", "n_pos")
          .select(col("bin"), col("bin_lo"), col("n_docs"),
            col("n_pos"), col("pos_rate_r"), col("iso_rate_r"))
          .orderBy("bin")
      })
  )
}
