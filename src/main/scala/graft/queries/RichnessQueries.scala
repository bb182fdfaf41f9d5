package graft.queries

import graft.ops.TextOps
import graft.util.Tables._

/** Round-12 lexical-richness batch: the vocabulary-quality dashboard a
  * training-corpus pipeline runs next to the Gopher rules — MATTR
  * lexical diversity (the length-unbiased TTR), the Yule/Simpson/
  * Herdan/Honoré/Sichel richness panel, Hill-number diversity ladders
  * per source, and sampled self-BLEU (does the corpus repeat
  * itself?).
  */
object RichnessQueries {

  private val normSql = TextQueries.normSql
  private val MattrWindow = 25
  private val BleuK = 16

  val all: Seq[Q] = Seq(

    // MATTR per language: mean sliding-window TTR (window 25), docs
    // shorter than the window excluded.
    Q("q483_mattr",
      Some(s"""WITH toks AS MATERIALIZED (
              |  SELECT lang, doc_id, string_split($normSql, ' ') AS t
              |  FROM documents),
              |pos AS MATERIALIZED (
              |  SELECT lang, doc_id, i - 1 AS p, t[i] AS tok,
              |    len(t) AS n
              |  FROM toks, unnest(generate_series(1, len(t)))
              |    AS g(i)),
              |el AS (SELECT lang, doc_id, tok,
              |  unnest(generate_series(greatest(0, p - ${MattrWindow - 1}),
              |    least(p, n - $MattrWindow))) AS s
              |  FROM pos WHERE n >= $MattrWindow),
              |ty AS (SELECT DISTINCT lang, doc_id, s, tok FROM el),
              |vv AS (SELECT lang, doc_id, s, count(*)::BIGINT AS v
              |  FROM ty GROUP BY 1, 2, 3),
              |pd AS (SELECT lang, doc_id,
              |  sum(v)::DOUBLE / (count(*) * $MattrWindow)::DOUBLE
              |    AS m
              |  FROM vv GROUP BY 1, 2)
              |SELECT lang, count(*)::BIGINT AS n_docs,
              |  round(sum(round(m, 12)::DECIMAL(28,12))::DOUBLE
              |    / count(*)::DOUBLE, 6) AS mattr_r
              |FROM pd GROUP BY 1 ORDER BY lang""".stripMargin),
      (s, d) => TextOps.mattr(documents(s, d), "lang", "doc_id",
          "text", MattrWindow)
        .orderBy("lang")),

    // Corpus richness panel: Yule's K, Simpson's D, Herdan's C,
    // Honoré's R, Sichel's S from one frequency-spectrum pass.
    Q("q484_vocab_richness",
      Some(s"""WITH f AS (SELECT tok, count(*)::BIGINT AS f FROM (
              |  SELECT unnest(string_split($normSql, ' ')) AS tok
              |  FROM documents) t GROUP BY 1),
              |a AS (SELECT sum(f)::BIGINT AS n, count(*)::BIGINT AS v,
              |  sum(f * f)::BIGINT AS f2,
              |  sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)::BIGINT AS v1,
              |  sum(CASE WHEN f = 2 THEN 1 ELSE 0 END)::BIGINT AS v2
              |  FROM f)
              |SELECT n AS n_tokens, v AS vocab, v1, v2,
              |  round(10000.0 * (f2 - n)::DOUBLE
              |    / (n::DOUBLE * n::DOUBLE), 6) AS yule_k_r,
              |  round((f2 - n)::DOUBLE
              |    / (n::DOUBLE * (n::DOUBLE - 1)), 6) AS simpson_r,
              |  round(ln(v::DOUBLE) / ln(n::DOUBLE), 6) AS herdan_r,
              |  CASE WHEN v1 < v THEN round(100.0 * ln(n::DOUBLE)
              |    / (1.0 - v1::DOUBLE / v::DOUBLE), 6) END
              |    AS honore_r,
              |  round(v2::DOUBLE / v::DOUBLE, 6) AS sichel_r
              |FROM a""".stripMargin),
      (s, d) => TextOps.vocabRichness(documents(s, d), "text")),

    // Hill diversity ladder + Pielou evenness per source.
    Q("q485_hill_evenness",
      Some(s"""WITH f AS (SELECT source, tok, count(*)::BIGINT AS f
              |  FROM (SELECT source,
              |    unnest(string_split($normSql, ' ')) AS tok
              |  FROM documents) t GROUP BY 1, 2),
              |tot AS (SELECT source, sum(f)::BIGINT AS n FROM f
              |  GROUP BY 1),
              |a AS (SELECT source, any_value(n) AS n_tokens,
              |  count(*)::BIGINT AS hill0,
              |  sum(round(-(f::DOUBLE / n::DOUBLE)
              |    * ln(f::DOUBLE / n::DOUBLE), 12)
              |    ::DECIMAL(28,12))::DOUBLE AS h,
              |  sum(f * f)::BIGINT AS f2
              |  FROM f JOIN tot USING (source) GROUP BY 1)
              |SELECT source, n_tokens, hill0,
              |  round(exp(round(h, 12)), 6) AS hill1_r,
              |  round(n_tokens::DOUBLE * n_tokens::DOUBLE
              |    / f2::DOUBLE, 6) AS hill2_r,
              |  CASE WHEN hill0 >= 2 THEN
              |    round(round(h, 12) / ln(hill0::DOUBLE), 6) END
              |    AS pielou_r
              |FROM a ORDER BY source""".stripMargin),
      (s, d) => TextOps.hillEvenness(documents(s, d), "source", "text")
        .orderBy("source")),

    // Sampled self-BLEU-2: corpus repetition audit over a 16-doc
    // deterministic md5 sample.
    Q("q486_self_bleu",
      Some(s"""WITH sam AS MATERIALIZED (
              |  SELECT doc_id AS id, string_split($normSql, ' ') AS t,
              |    len(string_split($normSql, ' ')) AS len
              |  FROM documents
              |  ORDER BY md5(doc_id::VARCHAR) LIMIT $BleuK),
              |s2 AS MATERIALIZED (SELECT * FROM sam WHERE len >= 2),
              |g1 AS (SELECT id, t[i] AS g, count(*)::BIGINT AS c
              |  FROM s2, unnest(generate_series(1, len)) AS u(i)
              |  GROUP BY 1, 2),
              |g2 AS (SELECT id, t[i] || ' ' || t[i + 1] AS g,
              |  count(*)::BIGINT AS c
              |  FROM s2, unnest(generate_series(1, len - 1)) AS u(i)
              |  GROUP BY 1, 2),
              |c1 AS (SELECT a.id AS cand, b.id AS ref,
              |  sum(least(a.c, b.c))::BIGINT AS clip1
              |  FROM g1 a JOIN g1 b USING (g) WHERE a.id <> b.id
              |  GROUP BY 1, 2),
              |c2 AS (SELECT a.id AS cand, b.id AS ref,
              |  sum(least(a.c, b.c))::BIGINT AS clip2
              |  FROM g2 a JOIN g2 b USING (g) WHERE a.id <> b.id
              |  GROUP BY 1, 2),
              |grid AS (SELECT a.id AS cand, a.len AS lc,
              |  b.id AS ref, b.len AS lr
              |  FROM s2 a, s2 b WHERE a.id <> b.id),
              |sc AS (SELECT
              |  coalesce(clip1, 0)::DOUBLE / lc::DOUBLE AS p1,
              |  coalesce(clip2, 0)::DOUBLE / (lc - 1)::DOUBLE AS p2,
              |  CASE WHEN lc > lr THEN 1.0
              |    ELSE exp(round(1.0 - lr::DOUBLE / lc::DOUBLE, 12))
              |    END AS bp
              |  FROM grid LEFT JOIN c1 USING (cand, ref)
              |  LEFT JOIN c2 USING (cand, ref))
              |SELECT (SELECT count(DISTINCT id) FROM s2) AS k_docs,
              |  count(*)::BIGINT AS n_pairs,
              |  round(sum(round(CASE WHEN p1 > 0 AND p2 > 0
              |      THEN bp * sqrt(p1 * p2) ELSE 0.0 END, 12)
              |    ::DECIMAL(28,12))::DOUBLE / count(*)::DOUBLE, 6)
              |    AS self_bleu_r
              |FROM sc""".stripMargin),
      (s, d) => TextOps.selfBleuSampled(documents(s, d), "doc_id",
        "text", BleuK)))
}
