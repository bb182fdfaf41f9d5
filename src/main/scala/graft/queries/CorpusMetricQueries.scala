package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{CorpusAudit, TextOps}
import graft.util.Tables._

/** Corpus-linguistics & governance metrics: distinct-n diversity,
  * tokenizer fertility, readability, the Hill tail index of the term
  * distribution, and a differentially-private statistics release — the
  * slice-level linguistic profile a training-data platform publishes
  * about each corpus snapshot.
  */
object CorpusMetricQueries {

  private val normSql = TextQueries.normSql

  /** q219: Hill estimator over the top-k term frequencies per source. */
  private val HillK = 10

  val all: Seq[Q] = Seq(

    // Distinct-1/2/3 lexical diversity per source: map-side gram
    // lambdas + stacked hash-aggs (no countDistinct Expand).
    Q("q216_distinct_ngrams",
      Some(s"""WITH toks AS (
              |  SELECT source, string_split($normSql, ' ') AS t
              |  FROM documents),
              |g1 AS (
              |  SELECT source, 1 AS n, t[g.i] AS gram
              |  FROM toks, unnest(generate_series(1, len(t))) AS g(i)),
              |g2 AS (
              |  SELECT source, 2 AS n, t[g.i] || ' ' || t[g.i + 1] AS gram
              |  FROM toks,
              |    unnest(generate_series(1, len(t) - 1)) AS g(i)),
              |g3 AS (
              |  SELECT source, 3 AS n,
              |    t[g.i] || ' ' || t[g.i + 1] || ' ' || t[g.i + 2] AS gram
              |  FROM toks,
              |    unnest(generate_series(1, len(t) - 2)) AS g(i)),
              |u AS (
              |  SELECT * FROM g1 UNION ALL SELECT * FROM g2
              |  UNION ALL SELECT * FROM g3),
              |c AS (
              |  SELECT source, n, gram, count(*) AS c
              |  FROM u GROUP BY 1, 2, 3),
              |a AS (
              |  SELECT source, n, sum(c)::BIGINT AS n_total,
              |    count(*)::BIGINT AS n_distinct
              |  FROM c GROUP BY 1, 2)
              |SELECT source, n, n_total, n_distinct,
              |  round(n_distinct / n_total, 6) AS distinct_ratio_r
              |FROM a ORDER BY source, n""".stripMargin),
      (s, d) => TextOps.distinctNgramRatio(documents(s, d), "source",
          "text", ns = Seq(1, 2, 3))
        .orderBy("source", "n")),

    // Tokenizer fertility per lang: BPE-estimate vs whitespace token
    // counts + chars-per-token, all from integer sums.
    Q("q217_tokenizer_fertility",
      Some(s"""WITH p AS (
              |  SELECT lang,
              |    len(string_split($normSql, ' '))::BIGINT AS w,
              |    len(regexp_extract_all(text, '[a-zA-Z]+'))::BIGINT
              |      AS al,
              |    ceil(length(text) / 4.0)::BIGINT AS bpe,
              |    length(replace($normSql, ' ', ''))::BIGINT AS ch
              |  FROM documents),
              |a AS (
              |  SELECT lang, count(*)::BIGINT AS n_docs,
              |    sum(w)::BIGINT AS n_ws_tokens,
              |    sum(al)::BIGINT AS n_alpha_tokens,
              |    sum(bpe)::BIGINT AS n_bpe_est,
              |    sum(ch)::BIGINT AS n_chars
              |  FROM p GROUP BY 1)
              |SELECT lang, n_docs, n_ws_tokens, n_alpha_tokens,
              |  n_bpe_est,
              |  round(n_bpe_est / n_ws_tokens, 6) AS fertility_r,
              |  round(n_chars / n_ws_tokens, 6) AS chars_per_token_r
              |FROM a ORDER BY lang""".stripMargin),
      (s, d) => {
        val p = TextOps.tokenStats(documents(s, d), "text")
          .select(col("lang"), col("n_tokens"), col("n_alpha_tokens"),
            col("n_tokens_bpe_est"),
            length(regexp_replace(TextOps.normalize(col("text")),
              " ", "")).cast("long").as("_ch"))
        p.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_ws_tokens"),
            sum(col("n_alpha_tokens")).as("n_alpha_tokens"),
            sum(col("n_tokens_bpe_est")).as("n_bpe_est"),
            sum(col("_ch")).as("_nc"))
          .select(col("lang"), col("n_docs"), col("n_ws_tokens"),
            col("n_alpha_tokens"), col("n_bpe_est"),
            round(col("n_bpe_est") / col("n_ws_tokens"), 6)
              .as("fertility_r"),
            round(col("_nc") / col("n_ws_tokens"), 6)
              .as("chars_per_token_r"))
          .orderBy("lang")
      }),

    // Flesch reading ease per source from aggregate integer counts.
    Q("q218_readability",
      Some(s"""WITH p AS (
              |  SELECT source,
              |    len(string_split($normSql, ' '))::BIGINT AS w,
              |    greatest(1, len(regexp_extract_all(text, '[.!?]+')))
              |      ::BIGINT AS s,
              |    len(regexp_extract_all(lower(text), '[aeiouy]+'))
              |      ::BIGINT AS y
              |  FROM documents),
              |a AS (
              |  SELECT source, count(*)::BIGINT AS n_docs,
              |    sum(w)::BIGINT AS n_words,
              |    sum(s)::BIGINT AS n_sentences,
              |    sum(y)::BIGINT AS n_syllables
              |  FROM p GROUP BY 1)
              |SELECT source, n_docs, n_words, n_sentences, n_syllables,
              |  round(206.835 - 1.015 * (n_words / n_sentences)
              |    - 84.6 * (n_syllables / n_words), 6) AS flesch_r
              |FROM a ORDER BY source""".stripMargin),
      (s, d) => TextOps.fleschAggregate(documents(s, d), "source", "text")
        .orderBy("source")),

    // Hill tail-index of the per-source term-frequency distribution:
    // α̂ = k / Σ_{i≤k} ln(f_i / f_{k+1}) over the top-k ranks — the
    // "how heavy is this source's vocabulary tail" number Zipf's global
    // slope (q166) summarizes away. Log terms summed as DECIMAL of
    // rounded values (order-independent); sources with vocab ≤ k+1 are
    // dropped by the rank join.
    Q("q219_hill_tail_index",
      Some(s"""WITH toks AS (
              |  SELECT source, unnest(string_split($normSql, ' '))
              |    AS term
              |  FROM documents),
              |cf AS (
              |  SELECT source, term, count(*)::BIGINT AS f
              |  FROM toks GROUP BY 1, 2),
              |r AS (
              |  SELECT source, f, row_number() OVER (
              |    PARTITION BY source ORDER BY f DESC, term) AS rk
              |  FROM cf),
              |k1 AS (
              |  SELECT source, f AS fk1 FROM r WHERE rk = ${HillK + 1}),
              |h AS (
              |  SELECT r.source, any_value(k1.fk1)::BIGINT AS fk1,
              |    sum(round(ln(r.f / k1.fk1), 9)::DECIMAL(18,9))::DOUBLE
              |      AS slog
              |  FROM r JOIN k1 ON r.source = k1.source
              |  WHERE r.rk <= $HillK GROUP BY r.source)
              |SELECT source, fk1,
              |  CASE WHEN slog > 0
              |    THEN round($HillK.0 / slog, 6) END AS hill_alpha_r
              |FROM h ORDER BY source""".stripMargin),
      (s, d) => {
        val toks = documents(s, d).select(col("source"),
          explode(TextOps.tokens(TextOps.normalize(col("text"))))
            .as("term"))
        val cf = toks.groupBy(col("source"), col("term"))
          .agg(count(lit(1)).as("f"))
        val w = Window.partitionBy("source")
          .orderBy(col("f").desc, col("term"))
        val r = cf.withColumn("rk", row_number().over(w))
        val k1 = r.where(col("rk") === HillK + 1)
          .select(col("source"), col("f").as("fk1"))
        r.where(col("rk") <= HillK)
          .join(broadcast(k1), Seq("source"))
          .groupBy(col("source"))
          .agg(first(col("fk1")).as("fk1"),
            sum(round(log(col("f") / col("fk1")), 9)
              .cast("decimal(18,9)")).cast("double").as("_slog"))
          .select(col("source"), col("fk1"),
            when(col("_slog") > 0,
              round(lit(HillK.toDouble) / col("_slog"), 6))
              .as("hill_alpha_r"))
          .orderBy("source")
      }),

    // DP-noised per-lang release: clamped token sums + deterministic
    // md5-uniform Laplace noise + small-group suppression.
    Q("q220_dp_release",
      Some(s"""WITH m AS (
              |  SELECT lang,
              |    least(len(string_split($normSql, ' ')), 500)::BIGINT
              |      AS v
              |  FROM documents),
              |a AS (
              |  SELECT lang, count(*)::BIGINT AS n_true,
              |    sum(v)::BIGINT AS s
              |  FROM m GROUP BY 1 HAVING count(*) >= 10),
              |u AS (
              |  SELECT lang, n_true, s,
              |    ((('0x' || substr(md5(lang || '#count'), 1, 15))
              |      ::BIGINT % 1000000)::DOUBLE + 0.5) / 1000000.0 AS uc,
              |    ((('0x' || substr(md5(lang || '#sum'), 1, 15))
              |      ::BIGINT % 1000000)::DOUBLE + 0.5) / 1000000.0 AS us
              |  FROM a)
              |SELECT lang, n_true,
              |  round(n_true + -(1.0) * sign(uc - 0.5)
              |    * ln(1.0 - 2.0 * abs(uc - 0.5)), 6) AS n_released_r,
              |  round(s + -(500.0) * sign(us - 0.5)
              |    * ln(1.0 - 2.0 * abs(us - 0.5)), 6) AS sum_released_r
              |FROM u ORDER BY lang""".stripMargin),
      (s, d) => CorpusAudit.dpNoisedRelease(
          documents(s, d).select(col("lang"),
            size(TextOps.tokens(TextOps.normalize(col("text"))))
              .as("nt")),
          "lang", "nt", eps = 1.0, clamp = 500L, minGroup = 10L)
        .orderBy("lang")))
}
