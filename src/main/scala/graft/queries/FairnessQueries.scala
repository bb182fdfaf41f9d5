package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{CorpusAudit, Curation, Fit}
import graft.util.Tables._

/** Round-12 fairness/privacy-assurance batch: t-closeness release
  * gate, equalized-odds audit, PSIS k̂ importance-weight diagnostic,
  * and the randomized-response (local-DP) debiasing audit — the
  * governance numbers a curation pipeline publishes next to q163's
  * k-anonymity and q385's positivity. */
object FairnessQueries {

  private val norm = TextQueries.normSql
  private def hash60Sql(e: String) =
    s"('0x' || substr(md5($e), 1, 15))::BIGINT"
  private val LenBucket = 200
  private val TvThreshold = 0.25
  private val PredChars = 300
  private val DsirBuckets = 1024
  private val TailDenom = 5
  private val RrP = 0.75

  val all: Seq[Q] = Seq(

    // t-closeness: per (source, length-bucket) QI group, the total
    // variation distance of its lang mix from the global one — the
    // leak a large-and-diverse group can still carry past q163.
    Q("q422_t_closeness",
      Some(s"""WITH gs AS MATERIALIZED (
              |  SELECT source, (n_chars // $LenBucket)::BIGINT
              |    AS len_bucket, lang, count(*)::BIGINT AS ngs
              |  FROM documents GROUP BY 1, 2, 3),
              |g AS (SELECT source, len_bucket, sum(ngs)::BIGINT AS n
              |      FROM gs GROUP BY 1, 2),
              |st AS (SELECT lang, count(*)::BIGINT AS ns
              |       FROM documents GROUP BY 1),
              |nt AS (SELECT count(*)::BIGINT AS ntot FROM documents),
              |x AS (
              |  SELECT g.source, g.len_bucket, g.n,
              |    sum(round(abs(coalesce(gs.ngs, 0)::DOUBLE / g.n
              |      - st.ns::DOUBLE / nt.ntot), 12)::DECIMAL(28,12))
              |      ::DOUBLE / 2.0 AS tv
              |  FROM g CROSS JOIN st CROSS JOIN nt
              |  LEFT JOIN gs ON gs.source = g.source
              |    AND gs.len_bucket = g.len_bucket AND gs.lang = st.lang
              |  GROUP BY 1, 2, 3)
              |SELECT source, len_bucket, n, round(tv, 6) AS tv_r,
              |  round(tv, 6) > $TvThreshold AS breached
              |FROM x ORDER BY source, len_bucket""".stripMargin),
      (s, d) => CorpusAudit.tCloseness(
          documents(s, d).withColumn("len_bucket",
            expr(s"n_chars div $LenBucket")),
          Seq("source", "len_bucket"), "lang", TvThreshold)
        .orderBy("source", "len_bucket")),

    // Equalized odds of the length "classifier" (n_chars > 300)
    // against lang = 'en' across sources: per-source TPR/FPR plus the
    // corpus max gaps.
    Q("q423_equalized_odds",
      Some(s"""WITH g AS MATERIALIZED (
              |  SELECT source, count(*)::BIGINT AS n,
              |    (count(*) FILTER (WHERE lang = 'en'))::BIGINT
              |      AS n_pos,
              |    (count(*) FILTER (WHERE lang = 'en'
              |      AND n_chars > $PredChars))::BIGINT AS tp,
              |    (count(*) FILTER (WHERE lang <> 'en'
              |      AND n_chars > $PredChars))::BIGINT AS fp
              |  FROM documents GROUP BY 1),
              |r AS (
              |  SELECT source, n, n_pos,
              |    round(CASE WHEN n_pos > 0
              |      THEN tp::DOUBLE / n_pos END, 6) AS tpr_r,
              |    round(CASE WHEN n > n_pos
              |      THEN fp::DOUBLE / (n - n_pos) END, 6) AS fpr_r
              |  FROM g),
              |gaps AS (SELECT max(tpr_r) - min(tpr_r) AS tg,
              |         max(fpr_r) - min(fpr_r) AS fg FROM r)
              |SELECT source, n, n_pos, tpr_r, fpr_r,
              |  round(tg, 6) AS tpr_gap_r, round(fg, 6) AS fpr_gap_r
              |FROM r, gaps ORDER BY source""".stripMargin),
      (s, d) => CorpusAudit.equalizedOdds(documents(s, d), "source",
          col("n_chars") > PredChars, col("lang") === "en")
        .orderBy("source")),

    // PSIS k-hat over the DSIR importance weights (q151's machinery):
    // GPD shape of the top-20% weight tail — "can these importance
    // weights be trusted, or do a few documents dominate".
    Q("q424_psis_khat",
      Some(s"""WITH tok AS (
              |  SELECT doc_id, lang = 'en' AS tgt,
              |    unnest(string_split($norm, ' ')) AS w
              |  FROM documents),
              |b AS (
              |  SELECT doc_id, tgt,
              |    ${hash60Sql("w")} % $DsirBuckets AS bk
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
              |  FROM ct, tot),
              |dw AS MATERIALIZED (
              |  SELECT doc_id, round(avg(lw), 6) AS logw
              |  FROM b JOIN lw USING (bk) GROUP BY 1),
              |wts AS MATERIALIZED (
              |  SELECT doc_id,
              |    round(round(exp(round(logw, 12)), 12) * 1e6)::BIGINT
              |      AS w
              |  FROM dw),
              |cnt AS (SELECT count(*)::BIGINT AS n,
              |        (count(*) + ${TailDenom - 1}) // $TailDenom AS k
              |        FROM wts),
              |rk AS (SELECT w, row_number() OVER (
              |         ORDER BY w DESC, doc_id) AS rnk FROM wts),
              |u AS (SELECT min(w)::BIGINT AS u FROM rk, cnt
              |      WHERE rnk <= k),
              |ex AS (SELECT (w - u)::HUGEINT AS z FROM wts, u
              |       WHERE w > u),
              |mm AS (SELECT count(*)::BIGINT AS n_exceed,
              |       sum(z) AS sz, sum(z * z) AS szz FROM ex),
              |f AS (SELECT n_exceed, sz::DOUBLE / n_exceed AS mz,
              |      (szz::DOUBLE - sz::DOUBLE * sz::DOUBLE / n_exceed)
              |        / (n_exceed - 1) AS s2
              |      FROM mm)
              |SELECT cnt.n AS n_weights, u.u AS u, n_exceed,
              |  round(CASE WHEN n_exceed >= 3 AND s2 > 0 THEN mz END,
              |    6) AS mean_r,
              |  round(CASE WHEN n_exceed >= 3 AND s2 > 0
              |    THEN (1.0 - mz * mz / s2) / 2 END, 6) AS khat_r,
              |  round(CASE WHEN n_exceed >= 3 AND s2 > 0
              |    THEN mz * (1.0 + mz * mz / s2) / 2 END, 6) AS beta_r
              |FROM f, cnt, u""".stripMargin),
      (s, d) => {
        val w = Curation.importanceWeights(
            documents(s, d).withColumn("is_tgt", col("lang") === "en"),
            "doc_id", "text", "is_tgt", DsirBuckets)
          .select(col("doc_id"),
            // exp pinned on BOTH argument and value (the r11 plattScaling
            // discipline): JVM and libm exp differ by 1 ulp
            round(round(exp(round(col("logw_r"), 12)), 12) * 1e6)
              .cast("long").as("w_micro"))
        Fit.psisKhat(w, "w_micro", "doc_id", TailDenom,
          bandWidth = 100000.0)
      }),

    // Randomized-response (Warner local-DP) debiasing audit: md5 coins
    // privatize lang='en' at p = 0.75; the estimator must reconstruct
    // the true rate within sampling noise.
    Q("q425_randomized_response",
      Some(s"""WITH r AS MATERIALIZED (
              |  SELECT lang = 'en' AS t,
              |    CASE WHEN ${hash60Sql(
                     "doc_id::VARCHAR || ':rr-keep'")} % 100
              |        < ${(RrP * 100).toLong}
              |      THEN lang = 'en'
              |      ELSE ${hash60Sql(
                     "doc_id::VARCHAR || ':rr-coin'")} % 2 = 0
              |    END AS rep
              |  FROM documents),
              |m AS (SELECT count(*)::BIGINT AS n,
              |  (count(*) FILTER (WHERE t))::BIGINT AS nt,
              |  (count(*) FILTER (WHERE rep))::BIGINT AS nr FROM r)
              |SELECT n,
              |  round(nt::DOUBLE / n, 6) AS true_rate_r,
              |  round(nr::DOUBLE / n, 6) AS observed_rate_r,
              |  round((nr::DOUBLE / n - ${(1.0 - RrP) / 2}) / $RrP, 6)
              |    AS estimated_r,
              |  round(abs((nr::DOUBLE / n - ${(1.0 - RrP) / 2}) / $RrP
              |    - nt::DOUBLE / n), 6) AS abs_err_r
              |FROM m""".stripMargin),
      (s, d) => CorpusAudit.randomizedResponse(documents(s, d),
        "doc_id", col("lang") === "en", RrP))
  )
}
