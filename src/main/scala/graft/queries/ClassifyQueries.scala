package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Fit, Retrieval, Similarity, TextOps}
import graft.util.Tables._

/** Round-12 classify/select batch: a trained naive-Bayes language
  * identifier (train + apply in one relational pipeline), the
  * MCC/F1 threshold sweep, greedy k-center coreset selection, the
  * Dirichlet-smoothed query-likelihood ranker, and unsupervised
  * Fellegi–Sunter EM — the "model fitting as queries" face of the
  * engine. Iterative oracles are unrolled CTE chains on the 12-dp
  * grid (the plattScaling discipline).
  */
object ClassifyQueries {

  private val norm = TextQueries.normSql
  private def hash60Sql(e: String) =
    s"('0x' || substr(md5($e), 1, 15))::BIGINT"
  private val NbBuckets = 4096
  private val Thresholds = Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8,
    0.9)
  private val CoresetK = 6
  private val DirichletMu = 2000.0
  private val FsIters = 3
  private val FsP0 = 0.05
  private val FsM0 = 0.9
  private val FsU0 = 0.3

  /** One k-center round in SQL: argmax of the running min-distance
    * md<i-1>, then md<i> = least against the new center. */
  private def kcRoundSql(i: Int): String =
    s"""c$i AS MATERIALIZED (
       |  SELECT vec_id, embedding FROM md${i - 1}
       |  ORDER BY d DESC, vec_id LIMIT 1),
       |md$i AS MATERIALIZED (
       |  SELECT m.vec_id, m.embedding,
       |    least(m.d, coalesce(round(1.0 - list_cosine_similarity(
       |      m.embedding::DOUBLE[], c.embedding::DOUBLE[]), 9), 1.0))
       |      AS d
       |  FROM md${i - 1} m, c$i c),
       |r$i AS (SELECT $i AS step, c.vec_id AS center_id,
       |        round(x.r, 9) AS radius_r
       |        FROM c$i c, (SELECT max(d) AS r FROM md$i) x)"""
      .stripMargin

  /** One FS-EM step in SQL against params p<i-1> → p<i>. */
  private def fsStepSql(i: Int): String =
    s"""e$i AS MATERIALIZED (
       |  SELECT f1, f2, f3,
       |    round(p * ((CASE WHEN f1 THEN m1 ELSE 1.0 - m1 END)
       |        * (CASE WHEN f2 THEN m2 ELSE 1.0 - m2 END)
       |        * (CASE WHEN f3 THEN m3 ELSE 1.0 - m3 END))
       |      / (p * ((CASE WHEN f1 THEN m1 ELSE 1.0 - m1 END)
       |          * (CASE WHEN f2 THEN m2 ELSE 1.0 - m2 END)
       |          * (CASE WHEN f3 THEN m3 ELSE 1.0 - m3 END))
       |        + (1.0 - p) * ((CASE WHEN f1 THEN u1 ELSE 1.0 - u1 END)
       |          * (CASE WHEN f2 THEN u2 ELSE 1.0 - u2 END)
       |          * (CASE WHEN f3 THEN u3 ELSE 1.0 - u3 END))), 12)
       |      AS g
       |  FROM fpairs, p${i - 1}),
       |p$i AS MATERIALIZED (
       |  SELECT round(sg / n, 12) AS p,
       |    round(g1 / sg, 12) AS m1, round(g2 / sg, 12) AS m2,
       |    round(g3 / sg, 12) AS m3,
       |    round(h1 / (n - sg), 12) AS u1,
       |    round(h2 / (n - sg), 12) AS u2,
       |    round(h3 / (n - sg), 12) AS u3
       |  FROM (
       |    SELECT count(*)::DOUBLE AS n,
       |      sum(round(g, 12)::DECIMAL(28,12))::DOUBLE AS sg,
       |      sum(round(g * (CASE WHEN f1 THEN 1.0 ELSE 0.0 END), 12)
       |        ::DECIMAL(28,12))::DOUBLE AS g1,
       |      sum(round(g * (CASE WHEN f2 THEN 1.0 ELSE 0.0 END), 12)
       |        ::DECIMAL(28,12))::DOUBLE AS g2,
       |      sum(round(g * (CASE WHEN f3 THEN 1.0 ELSE 0.0 END), 12)
       |        ::DECIMAL(28,12))::DOUBLE AS g3,
       |      sum(round((1.0 - g) * (CASE WHEN f1 THEN 1.0 ELSE 0.0
       |        END), 12)::DECIMAL(28,12))::DOUBLE AS h1,
       |      sum(round((1.0 - g) * (CASE WHEN f2 THEN 1.0 ELSE 0.0
       |        END), 12)::DECIMAL(28,12))::DOUBLE AS h2,
       |      sum(round((1.0 - g) * (CASE WHEN f3 THEN 1.0 ELSE 0.0
       |        END), 12)::DECIMAL(28,12))::DOUBLE AS h3
       |    FROM e$i) t)""".stripMargin

  val all: Seq[Q] = Seq(

    // Naive-Bayes language identifier over hashed char-3-gram
    // features, trained and applied in one pipeline; the confusion
    // matrix against the true lang is the readout.
    Q("q430_nb_lang_confusion",
      Some(s"""WITH dt AS MATERIALIZED (
              |  SELECT doc_id, lang, $norm AS t FROM documents),
              |g AS MATERIALIZED (
              |  SELECT doc_id, lang,
              |    ${hash60Sql("substr(t, i, 3)")} % $NbBuckets AS b
              |  FROM dt, unnest(generate_series(1, length(t) - 2))
              |    AS s(i)
              |  WHERE length(t) >= 3),
              |counts AS MATERIALIZED (
              |  SELECT lang AS l, b, count(*)::BIGINT AS c
              |  FROM g GROUP BY 1, 2),
              |tot AS (SELECT l, sum(c)::BIGINT AS tot FROM counts
              |        GROUP BY 1),
              |prior AS (
              |  SELECT lang AS l,
              |    round(ln(count(*)::DOUBLE
              |      / (SELECT count(*) FROM documents)), 12)
              |      AS lnprior
              |  FROM documents GROUP BY 1),
              |db AS MATERIALIZED (
              |  SELECT doc_id, lang AS true_lang, b,
              |    count(*)::BIGINT AS n
              |  FROM g GROUP BY 1, 2, 3),
              |lp AS MATERIALIZED (
              |  SELECT t.l, bb.b, p.lnprior,
              |    round(ln((coalesce(c.c, 0)::DOUBLE + 1.0)
              |      / (t.tot::DOUBLE + $NbBuckets)), 12) AS lp
              |  FROM generate_series(0, ${NbBuckets - 1}) bb(b)
              |  CROSS JOIN tot t
              |  JOIN prior p ON p.l = t.l
              |  LEFT JOIN counts c ON c.l = t.l AND c.b = bb.b),
              |scored AS MATERIALIZED (
              |  SELECT db.doc_id, db.true_lang, lp.l,
              |    max(lp.lnprior) + sum(round(lp.lp * db.n, 12)
              |      ::DECIMAL(28,12))::DOUBLE AS score
              |  FROM db JOIN lp ON lp.b = db.b
              |  GROUP BY 1, 2, 3),
              |pred AS (
              |  SELECT doc_id, true_lang, l AS pred_lang FROM (
              |    SELECT doc_id, true_lang, l, row_number() OVER (
              |      PARTITION BY doc_id
              |      ORDER BY round(score, 9) DESC, l) AS rk
              |    FROM scored) t WHERE rk = 1)
              |SELECT true_lang, pred_lang, count(*)::BIGINT AS n_docs
              |FROM pred GROUP BY 1, 2
              |ORDER BY true_lang, pred_lang""".stripMargin),
      (s, d) => TextOps.naiveBayesLangConfusion(documents(s, d),
          "doc_id", "text", "lang", NbBuckets)
        .orderBy("true_lang", "pred_lang")),

    // MCC / F1 / precision / recall sweep of the q27 quality score
    // against lang = 'en', across a 9-point threshold grid.
    Q("q431_mcc_f1_sweep", {
      val quality =
        s"""least(CAST(len(string_split($norm, ' ')) AS DOUBLE)
           |   / 100.0, 1.0) * 0.4
           | + (1.0 - CAST(len(regexp_extract_all(text, '[.,!?;:]'))
           |     AS DOUBLE) / length(text)) * 0.3
           | + least(CAST(len(regexp_extract_all(text,
           |     '${TextOps.langProfiles.head._2}')) AS DOUBLE)
           |   / len(string_split($norm, ' ')) * 5.0, 1.0) * 0.3"""
          .stripMargin
      Some(s"""WITH sc AS MATERIALIZED (
              |  SELECT ($quality) AS s,
              |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
              |  FROM documents),
              |g AS (
              |  SELECT t.threshold,
              |    sum(CASE WHEN y = 1 AND s > t.threshold THEN 1
              |      ELSE 0 END)::BIGINT AS tp,
              |    sum(CASE WHEN y = 0 AND s > t.threshold THEN 1
              |      ELSE 0 END)::BIGINT AS fp,
              |    sum(CASE WHEN y = 1 AND NOT (s > t.threshold) THEN 1
              |      ELSE 0 END)::BIGINT AS fn,
              |    sum(CASE WHEN y = 0 AND NOT (s > t.threshold) THEN 1
              |      ELSE 0 END)::BIGINT AS tn
              |  FROM sc, (SELECT unnest([${Thresholds.mkString(", ")}])
              |    AS threshold) t
              |  GROUP BY 1)
              |SELECT threshold, tp, fp, fn, tn,
              |  round(tp::DOUBLE / nullif((tp + fp)::DOUBLE, 0.0), 6)
              |    AS precision_r,
              |  round(tp::DOUBLE / nullif((tp + fn)::DOUBLE, 0.0), 6)
              |    AS recall_r,
              |  round(2.0 * (tp::DOUBLE / nullif((tp + fp)::DOUBLE,
              |      0.0)) * (tp::DOUBLE / nullif((tp + fn)::DOUBLE,
              |      0.0))
              |    / nullif(tp::DOUBLE / nullif((tp + fp)::DOUBLE, 0.0)
              |      + tp::DOUBLE / nullif((tp + fn)::DOUBLE, 0.0),
              |      0.0), 6) AS f1_r,
              |  round((tp::HUGEINT * tn - fp::HUGEINT * fn)::DOUBLE
              |    / nullif(sqrt(((tp + fp)::HUGEINT * (tp + fn)
              |      * (tn + fp) * (tn + fn))::DOUBLE), 0.0), 6)
              |    AS mcc_r
              |FROM g ORDER BY threshold""".stripMargin)
    },
      (s, d) => Fit.mccF1Sweep(
        TextOps.qualityScore(documents(s, d), "text"),
        col("quality"), col("lang") === "en", Thresholds)),

    // Greedy k-center coreset over the embeddings: 6 exemplars by
    // farthest-point traversal, with the covering radius per step.
    Q("q432_kcenter_coreset",
      Some(s"""WITH c1 AS MATERIALIZED (
              |  SELECT vec_id, embedding FROM embeddings
              |  ORDER BY vec_id LIMIT 1),
              |md1 AS MATERIALIZED (
              |  SELECT e.vec_id, e.embedding,
              |    coalesce(round(1.0 - list_cosine_similarity(
              |      e.embedding::DOUBLE[], c.embedding::DOUBLE[]), 9),
              |      1.0) AS d
              |  FROM embeddings e, c1 c),
              |r1 AS (SELECT 1 AS step, c.vec_id AS center_id,
              |       round(x.r, 9) AS radius_r
              |       FROM c1 c, (SELECT max(d) AS r FROM md1) x),
              |${(2 to CoresetK).map(kcRoundSql).mkString(",\n")}
              |SELECT step, center_id, radius_r FROM (
              |  ${(1 to CoresetK).map(i => s"SELECT * FROM r$i")
                  .mkString("\n  UNION ALL ")})
              |ORDER BY step""".stripMargin),
      (s, d) => Similarity.kCenterCoreset(embeddings(s, d), CoresetK)
        .orderBy("step")),

    // Dirichlet query-likelihood ranking (mu = 2000) for the shared
    // query terms — the LM ranker next to BM25 (q100) and its PRF
    // expansion (q394).
    Q("q433_lm_dirichlet",
      Some(s"""WITH tok AS MATERIALIZED (
              |  SELECT doc_id, unnest(string_split($norm, ' ')) AS term
              |  FROM documents),
              |dl AS MATERIALIZED (
              |  SELECT doc_id, count(*)::BIGINT AS dl FROM tok
              |  GROUP BY 1),
              |ct AS (SELECT count(*)::BIGINT AS ct FROM tok),
              |cf AS MATERIALIZED (
              |  SELECT term,
              |    $DirichletMu * count(*)::DOUBLE / (SELECT ct FROM ct)
              |      AS mp
              |  FROM tok
              |  WHERE term IN (${DepthQueries.Bm25Terms
                   .map(t => s"'$t'").mkString(", ")})
              |  GROUP BY 1),
              |base AS MATERIALIZED (
              |  SELECT dl.doc_id, dl.dl,
              |    sum(round(ln(cf.mp / (dl.dl::DOUBLE + $DirichletMu)),
              |      12)::DECIMAL(28,12))::DOUBLE AS base
              |  FROM dl CROSS JOIN cf GROUP BY 1, 2),
              |tf AS MATERIALIZED (
              |  SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok
              |  WHERE term IN (${DepthQueries.Bm25Terms
                   .map(t => s"'$t'").mkString(", ")})
              |  GROUP BY 1, 2),
              |corr AS MATERIALIZED (
              |  SELECT t.doc_id, count(*)::BIGINT AS n_terms_hit,
              |    sum(round(ln((t.tf::DOUBLE + cf.mp)
              |        / (dl.dl::DOUBLE + $DirichletMu)), 12)
              |      ::DECIMAL(28,12)
              |      - round(ln(cf.mp / (dl.dl::DOUBLE + $DirichletMu)),
              |        12)::DECIMAL(28,12))::DOUBLE AS corr
              |  FROM tf t JOIN dl USING (doc_id) JOIN cf USING (term)
              |  GROUP BY 1)
              |SELECT row_number() OVER (ORDER BY
              |    round(base + corr, 6) DESC, doc_id) AS rnk,
              |  doc_id, n_terms_hit, round(base + corr, 6) AS ql_r
              |FROM corr JOIN base USING (doc_id)
              |ORDER BY ql_r DESC, doc_id LIMIT 20""".stripMargin),
      (s, d) => Retrieval.lmDirichletTopK(documents(s, d), "doc_id",
        "text", DepthQueries.Bm25Terms, 20, DirichletMu)),

    // Unsupervised Fellegi-Sunter by EM over the SNM comparison
    // vectors — q397's m/u weights WITHOUT the ground-truth label.
    Q("q434_fellegi_sunter_em",
      Some(s"""WITH keyed AS MATERIALIZED (
              |  SELECT doc_id, substr($norm, 1, 24) AS key
              |  FROM documents),
              |r AS MATERIALIZED (
              |  SELECT doc_id,
              |    row_number() OVER (ORDER BY key, doc_id) AS rn
              |  FROM keyed),
              |cand AS MATERIALIZED (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              |  FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn <= 9),
              |d AS MATERIALIZED (
              |  SELECT doc_id, source, lang, n_chars FROM documents),
              |fpairs AS MATERIALIZED (
              |  SELECT (da.source = db.source) AS f1,
              |    (da.lang = db.lang) AS f2,
              |    (abs(da.n_chars - db.n_chars) <= 2) AS f3
              |  FROM cand c JOIN d da ON da.doc_id = c.doc_a
              |    JOIN d db ON db.doc_id = c.doc_b),
              |p0 AS (SELECT $FsP0 AS p, $FsM0 AS m1, $FsM0 AS m2,
              |       $FsM0 AS m3, $FsU0 AS u1, $FsU0 AS u2,
              |       $FsU0 AS u3),
              |${(1 to FsIters).map(fsStepSql).mkString(",\n")},
              |np AS (SELECT count(*)::BIGINT AS n_pairs FROM fpairs)
              |${Seq(("f_source", "m1", "u1"), ("f_lang", "m2", "u2"),
                  ("f_len", "m3", "u3")).map { case (f, mc, uc) =>
                  s"""SELECT '$f' AS feature, n_pairs,
                     |  round(p, 6) AS p_match_r,
                     |  round($mc, 6) AS m_r, round($uc, 6) AS u_r,
                     |  round(CASE WHEN $mc > 0 AND $uc > 0
                     |    THEN ln($mc / $uc) END, 6) AS w_agree_r,
                     |  round(CASE WHEN $mc < 1 AND $uc < 1
                     |    THEN ln((1.0 - $mc) / (1.0 - $uc)) END, 6)
                     |    AS w_disagree_r
                     |FROM p$FsIters, np""".stripMargin
                }.mkString("\nUNION ALL\n")}
              |ORDER BY feature""".stripMargin),
      (s, d) => Dedup.fellegiSunterEm(documents(s, d), "doc_id",
        "text", w = 10, iters = FsIters, p0 = FsP0, m0 = FsM0,
        u0 = FsU0))
  )
}
