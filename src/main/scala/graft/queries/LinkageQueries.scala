package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Nonparam, Profile, Retrieval}
import graft.util.Tables._

/** Round-11 linkage/retrieval batch: the MapState member of the
  * typed-state trio (q393), BM25 pseudo-relevance feedback (q394),
  * Anderson–Darling exponentiality (q395), the negative-binomial
  * overdispersion fit (q396), and Fellegi–Sunter record-linkage
  * weights over the SNM blocking (q397).
  */
object LinkageQueries {

  private val PrfSeeds = Seq("spark", "merge", "window")

  val all: Seq[Q] = Seq(

    // transformWithState MapState enrichment: per user, a map of
    // event_type -> running count; each event emits its 1-based
    // sequence number WITHIN its type. State = |type vocabulary|
    // entries per user, never the history — the third member of the
    // ValueState (q362) / ListState (q383) typed-state trio.
    Q("q393_tws_type_counts",
      Some("""SELECT user_id, event_id, event_type,
             |  row_number() OVER (PARTITION BY user_id, event_type
             |    ORDER BY ts, event_id) AS seq_in_type
             |FROM events
             |ORDER BY user_id, event_id""".stripMargin),
      (s, d) => graft.streaming.StatefulTws.typeCounts(s, d)
        .orderBy("user_id", "event_id")),

    // BM25 with pseudo-relevance feedback: seed query -> top-10
    // feedback docs -> 5 expansion terms (most document-frequent in
    // the feedback set) -> re-score. Two-pass retrieval; the
    // expansion stays a broadcast frame, never a collected list.
    Q("q394_bm25_prf",
      Some(s"""WITH tok AS MATERIALIZED (
              |  SELECT doc_id, unnest(string_split(${TextQueries.normSql},
              |    ' ')) AS term
              |  FROM documents),
              |dl AS MATERIALIZED (
              |  SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
              |consts AS (SELECT count(*)::BIGINT AS n_docs,
              |                  avg(dl) AS avgdl FROM dl),
              |tf1 AS (
              |  SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok
              |  WHERE term IN (${PrfSeeds.map(t => s"'$t'").mkString(", ")})
              |  GROUP BY 1, 2),
              |df1 AS (SELECT term, count(*)::BIGINT AS df
              |        FROM tf1 GROUP BY 1),
              |s1 AS MATERIALIZED (
              |  SELECT t.doc_id,
              |    round(sum(ln(1.0 + (c.n_docs - f.df + 0.5)
              |        / (f.df + 0.5)) *
              |      (t.tf * 2.2) / (t.tf + 1.2 *
              |        (0.25 + 0.75 * d.dl / c.avgdl))), 6) AS bm25
              |  FROM tf1 t JOIN dl d USING (doc_id)
              |    JOIN df1 f USING (term), consts c
              |  GROUP BY t.doc_id),
              |fb AS MATERIALIZED (
              |  SELECT doc_id FROM s1 ORDER BY bm25 DESC, doc_id
              |  LIMIT 10),
              |ex AS MATERIALIZED (
              |  SELECT term FROM (
              |    SELECT t.term, count(DISTINCT t.doc_id) AS dffb
              |    FROM tok t JOIN fb USING (doc_id)
              |    WHERE len(t.term) >= 4 AND t.term NOT IN
              |      (${PrfSeeds.map(t => s"'$t'").mkString(", ")})
              |    GROUP BY 1) x
              |  ORDER BY dffb DESC, term LIMIT 5),
              |q AS MATERIALIZED (
              |  ${PrfSeeds.map(t => s"SELECT '$t' AS term")
                  .mkString(" UNION ALL ")}
              |  UNION ALL SELECT term FROM ex),
              |tf2 AS (
              |  SELECT tok.doc_id, tok.term, count(*)::BIGINT AS tf
              |  FROM tok JOIN q ON tok.term = q.term GROUP BY 1, 2),
              |df2 AS (SELECT term, count(*)::BIGINT AS df
              |        FROM tf2 GROUP BY 1),
              |s2 AS MATERIALIZED (
              |  SELECT t.doc_id, count(*)::BIGINT AS n_terms_hit,
              |    round(sum(ln(1.0 + (c.n_docs - f.df + 0.5)
              |        / (f.df + 0.5)) *
              |      (t.tf * 2.2) / (t.tf + 1.2 *
              |        (0.25 + 0.75 * d.dl / c.avgdl))), 6) AS bm25
              |  FROM tf2 t JOIN dl d USING (doc_id)
              |    JOIN df2 f USING (term), consts c
              |  GROUP BY t.doc_id),
              |top AS (
              |  SELECT doc_id, n_terms_hit, bm25 FROM s2
              |  ORDER BY bm25 DESC, doc_id LIMIT 20)
              |SELECT row_number() OVER (ORDER BY bm25 DESC, doc_id)
              |    AS rnk, doc_id, n_terms_hit, bm25
              |FROM top ORDER BY rnk""".stripMargin),
      (s, d) => Retrieval.bm25Prf(documents(s, d), "doc_id", "text",
        PrfSeeds, fbDocs = 10, fbTerms = 5, k = 20).orderBy("rnk")),

    // Anderson-Darling exponentiality of inter-event gaps: the
    // tail-weighted sharpening of q353's KS — AD upweights exactly
    // the small-gap burst region KS underweights.
    Q("q395_ad_exponentiality",
      Some("""WITH g AS MATERIALIZED (
             |  SELECT (epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id))::BIGINT
             |    AS gus
             |  FROM events),
             |gg AS MATERIALIZED (
             |  SELECT gus FROM g WHERE gus IS NOT NULL AND gus > 0),
             |grain AS MATERIALIZED (
             |  SELECT gus, count(*)::BIGINT AS c FROM gg GROUP BY 1),
             |cum AS MATERIALIZED (
             |  SELECT gus, c, sum(c) OVER (ORDER BY gus
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS runsum
             |  FROM grain),
             |tot AS (SELECT count(*)::BIGINT AS n, sum(gus)::BIGINT
             |        AS sg FROM gg),
             |terms AS MATERIALIZED (
             |  SELECT
             |    (c::HUGEINT * (2 * (runsum - c) + c))::DOUBLE
             |      * ln(greatest(1.0 - exp(-round(
             |        (n::DOUBLE / (sg::DOUBLE / 1e6))
             |          * (gus::DOUBLE / 1e6), 12)), 1e-12)) AS t1,
             |    (c::HUGEINT * (2 * n - 2 * (runsum - c) - c))::DOUBLE
             |      * (-(n::DOUBLE / (sg::DOUBLE / 1e6))
             |        * (gus::DOUBLE / 1e6)) AS t2
             |  FROM cum, tot)
             |SELECT n AS n_gaps,
             |  round(n::DOUBLE / (sg::DOUBLE / 1e6), 6)
             |    AS lambda_per_s_r,
             |  round(-(n::DOUBLE)
             |    - (sum(round(t1, 12)::DECIMAL(28,12))::DOUBLE
             |      + sum(round(t2, 12)::DECIMAL(28,12))::DOUBLE)
             |      / n::DOUBLE, 6) AS a2_r
             |FROM terms, tot GROUP BY n, sg""".stripMargin),
      (s, d) => Nonparam.adExponentiality(events(s, d), "user_id",
        "ts", "event_id")),

    // Negative-binomial overdispersion fit of per-user event counts:
    // Poisson says variance = mean; the NB(r, p) method-of-moments
    // fit sizes how far reality overshoots.
    Q("q396_negbin_fit",
      Some("""WITH u AS MATERIALIZED (
             |  SELECT user_id, count(*)::BIGINT AS n FROM events
             |  GROUP BY 1),
             |m AS (
             |  SELECT count(*)::BIGINT AS n_keys, sum(n)::BIGINT AS s1,
             |    sum(round(n::DOUBLE * n, 12)::DECIMAL(28,12))::DOUBLE
             |      AS s2
             |  FROM u)
             |SELECT n_keys,
             |  round(s1::DOUBLE / n_keys::DOUBLE, 6) AS mean_r,
             |  round(s2 / n_keys::DOUBLE
             |    - (s1::DOUBLE / n_keys::DOUBLE)
             |      * (s1::DOUBLE / n_keys::DOUBLE), 6) AS var_r,
             |  round((s2 / n_keys::DOUBLE
             |    - (s1::DOUBLE / n_keys::DOUBLE)
             |      * (s1::DOUBLE / n_keys::DOUBLE))
             |    / (s1::DOUBLE / n_keys::DOUBLE), 6) AS dispersion_r,
             |  round(CASE WHEN s2 / n_keys::DOUBLE
             |      - (s1::DOUBLE / n_keys::DOUBLE)
             |        * (s1::DOUBLE / n_keys::DOUBLE)
             |      > s1::DOUBLE / n_keys::DOUBLE THEN
             |    (s1::DOUBLE / n_keys::DOUBLE)
             |      * (s1::DOUBLE / n_keys::DOUBLE)
             |      / (s2 / n_keys::DOUBLE
             |        - (s1::DOUBLE / n_keys::DOUBLE)
             |          * (s1::DOUBLE / n_keys::DOUBLE)
             |        - s1::DOUBLE / n_keys::DOUBLE) END, 6) AS nb_r_r,
             |  round(CASE WHEN s2 / n_keys::DOUBLE
             |      - (s1::DOUBLE / n_keys::DOUBLE)
             |        * (s1::DOUBLE / n_keys::DOUBLE)
             |      > s1::DOUBLE / n_keys::DOUBLE THEN
             |    ((s1::DOUBLE / n_keys::DOUBLE)
             |      * (s1::DOUBLE / n_keys::DOUBLE)
             |      / (s2 / n_keys::DOUBLE
             |        - (s1::DOUBLE / n_keys::DOUBLE)
             |          * (s1::DOUBLE / n_keys::DOUBLE)
             |        - s1::DOUBLE / n_keys::DOUBLE))
             |    / ((s1::DOUBLE / n_keys::DOUBLE)
             |      * (s1::DOUBLE / n_keys::DOUBLE)
             |      / (s2 / n_keys::DOUBLE
             |        - (s1::DOUBLE / n_keys::DOUBLE)
             |          * (s1::DOUBLE / n_keys::DOUBLE)
             |        - s1::DOUBLE / n_keys::DOUBLE)
             |      + s1::DOUBLE / n_keys::DOUBLE) END, 6) AS nb_p_r
             |FROM m""".stripMargin),
      (s, d) => Profile.negbinFit(events(s, d), "user_id")),

    // Fellegi-Sunter record-linkage weights over the SNM blocking:
    // per comparison feature, m/u rates against exact-content ground
    // truth and the agree/disagree log-likelihood-ratio weights a
    // linkage scorer sums.
    Q("q397_fellegi_sunter",
      Some(s"""WITH keyed AS MATERIALIZED (
              |  SELECT doc_id, substr(${TextQueries.normSql}, 1, 24)
              |    AS key
              |  FROM documents),
              |r AS MATERIALIZED (
              |  SELECT doc_id,
              |    row_number() OVER (ORDER BY key, doc_id) AS rn
              |  FROM keyed),
              |cand AS MATERIALIZED (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              |  FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn <= 9),
              |d AS MATERIALIZED (
              |  SELECT doc_id, md5(text) AS ch, source, lang, n_chars
              |  FROM documents),
              |p AS MATERIALIZED (
              |  SELECT (da.ch = db.ch) AS m,
              |    (da.source = db.source) AS f_source,
              |    (da.lang = db.lang) AS f_lang,
              |    (abs(da.n_chars - db.n_chars) <= 2) AS f_len
              |  FROM cand c JOIN d da ON da.doc_id = c.doc_a
              |    JOIN d db ON db.doc_id = c.doc_b),
              |g AS (
              |  SELECT
              |    sum(CASE WHEN m THEN 1 ELSE 0 END)::BIGINT AS nm,
              |    sum(CASE WHEN NOT m THEN 1 ELSE 0 END)::BIGINT AS nu,
              |    sum(CASE WHEN m AND f_source THEN 1 ELSE 0 END)
              |      ::BIGINT AS ma_f_source,
              |    sum(CASE WHEN NOT m AND f_source THEN 1 ELSE 0 END)
              |      ::BIGINT AS ua_f_source,
              |    sum(CASE WHEN m AND f_lang THEN 1 ELSE 0 END)
              |      ::BIGINT AS ma_f_lang,
              |    sum(CASE WHEN NOT m AND f_lang THEN 1 ELSE 0 END)
              |      ::BIGINT AS ua_f_lang,
              |    sum(CASE WHEN m AND f_len THEN 1 ELSE 0 END)
              |      ::BIGINT AS ma_f_len,
              |    sum(CASE WHEN NOT m AND f_len THEN 1 ELSE 0 END)
              |      ::BIGINT AS ua_f_len
              |  FROM p)
              |${Seq("f_source", "f_lang", "f_len").map { f =>
                 s"""SELECT '$f' AS feature, nm AS n_match,
                    |  nu AS n_nonmatch,
                    |  round(ma_$f::DOUBLE / nullif(nm::DOUBLE, 0.0), 6)
                    |    AS m_r,
                    |  round(ua_$f::DOUBLE / nullif(nu::DOUBLE, 0.0), 6)
                    |    AS u_r,
                    |  round(CASE WHEN ma_$f::DOUBLE
                    |      / nullif(nm::DOUBLE, 0.0) > 0
                    |      AND ua_$f::DOUBLE / nullif(nu::DOUBLE, 0.0)
                    |      > 0 THEN
                    |    ln((ma_$f::DOUBLE / nullif(nm::DOUBLE, 0.0))
                    |      / (ua_$f::DOUBLE / nullif(nu::DOUBLE, 0.0)))
                    |    END, 6) AS w_agree_r,
                    |  round(CASE WHEN ma_$f::DOUBLE
                    |      / nullif(nm::DOUBLE, 0.0) < 1
                    |      AND ua_$f::DOUBLE / nullif(nu::DOUBLE, 0.0)
                    |      < 1 THEN
                    |    ln((1.0 - ma_$f::DOUBLE
                    |        / nullif(nm::DOUBLE, 0.0))
                    |      / (1.0 - ua_$f::DOUBLE
                    |        / nullif(nu::DOUBLE, 0.0))) END, 6)
                    |    AS w_disagree_r
                    |FROM g""".stripMargin
               }.mkString("\nUNION ALL\n")}
              |ORDER BY feature""".stripMargin),
      (s, d) => {
        val docs = documents(s, d)
        val cand = Dedup.snmCandidates(docs, "doc_id", "text", 10)
        val meta = docs.select(col("doc_id"), md5(col("text")).as("_ch"),
          col("source"), col("lang"), col("n_chars"))
        val pairs = cand
          .join(meta.select(col("doc_id").as("doc_a"),
            col("_ch").as("_cha"), col("source").as("_sa"),
            col("lang").as("_la"), col("n_chars").as("_na")), Seq("doc_a"))
          .join(meta.select(col("doc_id").as("doc_b"),
            col("_ch").as("_chb"), col("source").as("_sb"),
            col("lang").as("_lb"), col("n_chars").as("_nb")), Seq("doc_b"))
          .select((col("_cha") === col("_chb")).as("m"),
            (col("_sa") === col("_sb")).as("f_source"),
            (col("_la") === col("_lb")).as("f_lang"),
            (abs(col("_na") - col("_nb")) <= 2).as("f_len"))
        Dedup.fellegiSunterWeights(pairs, "m",
          Seq("f_source", "f_lang", "f_len")).orderBy("feature")
      })
  )
}
