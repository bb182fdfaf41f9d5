package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Retrieval, TextOps}
import graft.util.Tables._

/** Round-12 lexicon batch: vocabulary-mass estimation (Good–Turing
  * smoothing, Chao1 richness + Good's coverage) and ranking-similarity
  * metrics (RBO, ERR) — the "is more data still buying vocabulary" and
  * "what did the scorer swap do to my top-k" numbers a corpus/retrieval
  * pipeline publishes. Reference scope: generalizes the reference's
  * count aggregations (fetch_youtube_data.py statistics columns) to the
  * corpus-statistics surface.
  */
object LexiconQueries {

  private val norm = TextQueries.normSql
  /** Word 4-gram instance expression over the split-token list `t`. */
  private val gram4Sql =
    """t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]"""
  private val GtMaxR = 10
  private val RboP = 0.9
  private val RboK = 20
  private val ErrK = 20
  private val ErrMaxGrade = 3

  /** BM25 top-k as an explicit 1-based rank list (one literal
    * unpartitioned window over the ≤k post-limit frame — the q394
    * idiom; WindowGrainSpec: post-limit grain). */
  private def rankedBm25(docs: DataFrame, terms: Seq[String], k: Int,
      b: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Retrieval.bm25TopK(docs, "doc_id", "text", terms, k, b = b)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id").asc)))
  }

  /** The shared BM25 scoring CTE chain with a parameterized b —
    * bm25s<sfx>(doc_id, n_terms_hit, bm25). */
  private def bm25Sql(sfx: String, b: Double): String =
    s"""tf$sfx AS MATERIALIZED (
       |  SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok
       |  WHERE term IN (${DepthQueries.Bm25Terms
            .map(t => s"'$t'").mkString(", ")})
       |  GROUP BY 1, 2),
       |dfreq$sfx AS (SELECT term, count(*)::BIGINT AS df
       |              FROM tf$sfx GROUP BY 1),
       |bm25s$sfx AS MATERIALIZED (
       |  SELECT t.doc_id, count(*) AS n_terms_hit,
       |    round(sum(
       |      ln(1.0 + (c.n_docs - f.df + 0.5) / (f.df + 0.5)) *
       |      (t.tf * ${1.2 + 1.0}::DOUBLE) /
       |      (t.tf + ${1.2}::DOUBLE *
       |        (${1.0 - b}::DOUBLE + ${b}::DOUBLE * d.dl / c.avgdl))
       |    ), 6) AS bm25
       |  FROM tf$sfx t JOIN dl d USING (doc_id)
       |    JOIN dfreq$sfx f USING (term), consts c
       |  GROUP BY t.doc_id),
       |r$sfx AS MATERIALIZED (
       |  SELECT doc_id, n_terms_hit, bm25,
       |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
       |  FROM bm25s$sfx QUALIFY rnk <= $RboK)""".stripMargin

  private val tokDlSql =
    s"""WITH tok AS MATERIALIZED (
       |  SELECT doc_id, unnest(string_split($norm, ' ')) AS term
       |  FROM documents),
       |dl AS MATERIALIZED (SELECT doc_id, count(*)::BIGINT AS dl
       |       FROM tok GROUP BY 1),
       |consts AS (SELECT count(*)::BIGINT AS n_docs,
       |                  avg(dl) AS avgdl FROM dl)""".stripMargin

  val all: Seq[Q] = Seq(

    // Good-Turing adjusted counts over the corpus unigram table: the
    // low-count smoothing table (r*, p_gt) plus the unseen mass P0 —
    // one tokenize pass, then everything on the freq-of-freq grid.
    Q("q409_good_turing",
      Some(s"""WITH toks AS MATERIALIZED (
              |  SELECT string_split($norm, ' ') AS t FROM documents),
              |g AS MATERIALIZED (
              |  SELECT $gram4Sql AS w
              |  FROM toks, unnest(generate_series(1,
              |    greatest(len(t) - 3, 0))) AS s(i)),
              |c AS MATERIALIZED (
              |  SELECT w, count(*)::BIGINT AS r FROM g GROUP BY 1),
              |fof AS MATERIALIZED (
              |  SELECT r, count(*)::BIGINT AS n_r FROM c GROUP BY 1),
              |tot AS (SELECT sum(r)::BIGINT AS n,
              |  sum(CASE WHEN r = 1 THEN 1 ELSE 0 END)::BIGINT AS f1
              |  FROM c)
              |SELECT a.r, a.n_r, b.n_r AS n_r_next,
              |  round((a.r + 1)::DOUBLE * b.n_r / a.n_r, 6) AS r_star_r,
              |  round((a.r + 1)::DOUBLE * b.n_r / a.n_r / n, 6)
              |    AS p_gt_r,
              |  round(f1::DOUBLE / n, 6) AS p0_r
              |FROM fof a JOIN fof b ON b.r = a.r + 1, tot
              |WHERE a.r <= $GtMaxR ORDER BY a.r""".stripMargin),
      (s, d) => TextOps.goodTuring(documents(s, d), "doc_id", "text",
        GtMaxR)),

    // Chao1 richness + Good's coverage per source: is more data from
    // this source still buying vocabulary? f1/f2 type counts on the
    // per-source term grid.
    Q("q410_chao1_richness",
      Some(s"""WITH toks AS MATERIALIZED (
              |  SELECT source, string_split($norm, ' ') AS t
              |  FROM documents),
              |g AS MATERIALIZED (
              |  SELECT source, $gram4Sql AS w
              |  FROM toks, unnest(generate_series(1,
              |    greatest(len(t) - 3, 0))) AS s(i)),
              |c AS MATERIALIZED (
              |  SELECT source, w, count(*)::BIGINT AS r
              |  FROM g GROUP BY 1, 2)
              |SELECT source, count(*)::BIGINT AS n_types,
              |  sum(r)::BIGINT AS n_tokens,
              |  sum(CASE WHEN r = 1 THEN 1 ELSE 0 END)::BIGINT AS f1,
              |  sum(CASE WHEN r = 2 THEN 1 ELSE 0 END)::BIGINT AS f2,
              |  round(count(*)::DOUBLE
              |    + sum(CASE WHEN r = 1 THEN 1 ELSE 0 END)::DOUBLE
              |      * (sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) - 1)
              |      / (2.0 * (sum(CASE WHEN r = 2 THEN 1 ELSE 0 END)
              |        + 1)), 6) AS chao1_r,
              |  round(1.0
              |    - sum(CASE WHEN r = 1 THEN 1 ELSE 0 END)::DOUBLE
              |      / sum(r), 6) AS coverage_r
              |FROM c GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => TextOps.chao1Richness(documents(s, d), "source",
        "text")),

    // Rank-biased overlap between the BM25 ranking and its b=0 variant
    // (length normalization OFF) — the scorer-swap drift number, head-
    // weighted with persistence p = 0.9, extrapolated past depth k.
    Q("q411_rbo_rankings",
      Some(s"""$tokDlSql,
              |${bm25Sql("a", 0.75)},
              |${bm25Sql("b", 0.0)},
              |pr AS (
              |  SELECT greatest(a.rnk, b.rnk)::BIGINT AS dmin
              |  FROM ra a JOIN rb b USING (doc_id)),
              |xd AS (
              |  SELECT d, sum(CASE WHEN dmin <= d THEN 1 ELSE 0 END)
              |    ::BIGINT AS x
              |  FROM generate_series(1, $RboK) t(d), pr GROUP BY 1),
              |m AS (
              |  SELECT sum(round(x::DOUBLE / d * pow($RboP, d), 12)
              |      ::DECIMAL(28,12))::DOUBLE AS s,
              |    max(CASE WHEN d = $RboK THEN x END)::BIGINT AS xk
              |  FROM xd)
              |SELECT $RboK AS k, xk AS n_common,
              |  round(${(1.0 - RboP) / RboP} * s
              |    + xk::DOUBLE / $RboK * ${math.pow(RboP, RboK)}, 6)
              |    AS rbo_ext_r
              |FROM m""".stripMargin),
      (s, d) => {
        val docs = documents(s, d)
        Retrieval.rboExt(
          rankedBm25(docs, DepthQueries.Bm25Terms, RboK, b = 0.75),
          rankedBm25(docs, DepthQueries.Bm25Terms, RboK, b = 0.0),
          "doc_id", "rnk", RboK, RboP)
      }),

    // Expected Reciprocal Rank of the BM25 top-20 under the cascade
    // model, grades = query terms hit (0..3) — the dedup-sensitive
    // ranking metric next to q226's MAP/NDCG.
    Q("q412_err_bm25",
      Some(s"""$tokDlSql,
              |${bm25Sql("a", 0.75)},
              |g AS MATERIALIZED (
              |  SELECT rnk,
              |    (pow(2.0, n_terms_hit) - 1.0)
              |      / ${math.pow(2.0, ErrMaxGrade)} AS rel
              |  FROM ra),
              |t AS MATERIALIZED (
              |  SELECT rnk, rel,
              |    coalesce(sum(round(ln(1.0 - rel), 12)
              |      ::DECIMAL(28,12)) OVER (ORDER BY rnk
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              |      ::DOUBLE, 0.0) AS lnsum
              |  FROM g)
              |SELECT $ErrK AS k,
              |  round(sum(round(exp(lnsum) * rel / rnk, 12)
              |    ::DECIMAL(28,12))::DOUBLE, 6) AS err_r
              |FROM t""".stripMargin),
      (s, d) => Retrieval.errAtK(
        rankedBm25(documents(s, d), DepthQueries.Bm25Terms, ErrK,
          b = 0.75),
        "rnk", "n_terms_hit", ErrK, ErrMaxGrade))
  )
}
