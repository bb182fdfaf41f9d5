package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Curation, Nonparam, TextOps, TimeSeries}
import graft.util.Tables._

/** Round-11 frontier batch: sampling-theory and structure closers —
  * the Horvitz–Thompson total audit (q389), kernel MMD two-sample on
  * embeddings (q390), depth-2 binary segmentation (q391), and the BPE
  * TRAINING loop on the bounded vocab (q392).
  */
object FrontierQueries {

  private val BpeRounds = 4

  /** Unrolled BPE merge chain: v0 = char-spaced vocab with counts,
    * each round picks the max-count pair (ties lexicographic) and
    * literal-replaces it corpus-wide on the padded repr. */
  private def bpeSql: String = {
    val steps = (1 to BpeRounds).map { i =>
      s"""b$i AS MATERIALIZED (
         |  SELECT pair, n FROM (
         |    SELECT t.t[g.j] || ' ' || t.t[g.j + 1] AS pair,
         |      sum(t.cnt)::BIGINT AS n
         |    FROM (SELECT string_split(repr, ' ') AS t, cnt
         |          FROM v${i - 1}) t(t, cnt),
         |      unnest(generate_series(1, len(t.t) - 1)) AS g(j)
         |    GROUP BY 1) p
         |  ORDER BY n DESC, pair LIMIT 1),
         |v$i AS MATERIALIZED (
         |  SELECT trim(replace(' ' || v.repr || ' ',
         |      ' ' || b.pair || ' ',
         |      ' ' || replace(b.pair, ' ', '') || ' ')) AS repr, v.cnt
         |  FROM v${i - 1} v, b$i b)""".stripMargin
    }.mkString(",\n")
    val out = (1 to BpeRounds).map(i =>
      s"SELECT $i AS round, pair, replace(pair, ' ', '') AS merged, n FROM b$i")
      .mkString("\nUNION ALL ")
    s"""WITH w AS MATERIALIZED (
       |  SELECT u.w AS w, count(*)::BIGINT AS cnt
       |  FROM (SELECT string_split(${TextQueries.normSql}, ' ') AS t
       |        FROM documents) d, unnest(d.t) AS u(w)
       |  WHERE len(u.w) >= 1 GROUP BY 1),
       |v0 AS MATERIALIZED (
       |  SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS repr, cnt
       |  FROM w),
       |$steps
       |$out
       |ORDER BY round""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // Horvitz-Thompson total audit: size-proportional Poisson sample
    // of orders (pi = totalprice/50k$, capped at 1), HT estimate vs
    // the exact total + the Poisson variance SE — earning trust in
    // the estimator while the truth is still computable.
    Q("q389_ht_total",
      Some("""WITH b AS MATERIALIZED (
             |  SELECT o_orderkey AS id,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS y
             |  FROM orders),
             |s AS MATERIALIZED (
             |  SELECT y, least(1.0, y::DOUBLE / 5000000.0) AS pi,
             |    (('0x' || substr(md5(id::VARCHAR), 1, 15))::BIGINT
             |      ::DOUBLE + 1.0) / 1152921504606846976.0 AS u
             |  FROM b),
             |m AS (
             |  SELECT count(*)::BIGINT AS n_pop, sum(y)::BIGINT AS total,
             |    sum(CASE WHEN u < pi THEN 1 ELSE 0 END)::BIGINT
             |      AS n_sample,
             |    sum(CASE WHEN u < pi THEN
             |      round(y::DOUBLE / pi, 12)::DECIMAL(28,12) END)
             |      ::DOUBLE AS ht,
             |    sum(CASE WHEN u < pi THEN
             |      round((1.0 - pi) / (pi * pi) * y::DOUBLE * y::DOUBLE,
             |        12)::DECIMAL(28,12) END)::DOUBLE AS v
             |  FROM s)
             |SELECT n_pop, n_sample, total, round(ht, 6) AS ht_total_r,
             |  round((ht - total::DOUBLE) / total::DOUBLE, 6)
             |    AS rel_err_r,
             |  round(sqrt(v), 6) AS ht_se_r
             |FROM m""".stripMargin),
      (s, d) => Curation.htTotalAudit(
        orders(s, d).select(col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("_cents")),
        "o_orderkey", "_cents", 5000000.0)),

    // Kernel MMD two-sample on the embedding space: are label-0 and
    // label-1 sub-corpora the same distribution? The multivariate
    // complement to q371/q372's scalar ECDF distances.
    Q("q390_mmd",
      Some("""WITH b AS MATERIALIZED (
             |  SELECT vec_id, label, embedding::DOUBLE[] AS e,
             |    list_dot_product(embedding::DOUBLE[],
             |      embedding::DOUBLE[]) AS ss
             |  FROM embeddings WHERE label IN (0, 1)),
             |p AS MATERIALIZED (
             |  SELECT a.label AS la, bb.label AS lb,
             |    round(exp(-(1.0 / 64) * round(a.ss + bb.ss
             |      - 2.0 * list_dot_product(a.e, bb.e), 12)), 12) AS k
             |  FROM b a JOIN b bb ON a.vec_id <> bb.vec_id),
             |s AS (
             |  SELECT
             |    sum(CASE WHEN la = 0 AND lb = 0 THEN
             |      round(k, 12)::DECIMAL(28,12) END)::DOUBLE AS saa,
             |    sum(CASE WHEN la = 1 AND lb = 1 THEN
             |      round(k, 12)::DECIMAL(28,12) END)::DOUBLE AS sbb,
             |    sum(CASE WHEN la = 0 AND lb = 1 THEN
             |      round(k, 12)::DECIMAL(28,12) END)::DOUBLE AS sab
             |  FROM p),
             |c AS (
             |  SELECT sum(CASE WHEN label = 0 THEN 1 ELSE 0 END)::BIGINT
             |      AS m,
             |    sum(CASE WHEN label = 1 THEN 1 ELSE 0 END)::BIGINT AS n
             |  FROM b)
             |SELECT m, n,
             |  round(saa / (m::DOUBLE * (m - 1)), 6) AS kaa_r,
             |  round(sbb / (n::DOUBLE * (n - 1)), 6) AS kbb_r,
             |  round(sab / (m::DOUBLE * n), 6) AS kab_r,
             |  round(saa / (m::DOUBLE * (m - 1))
             |    + sbb / (n::DOUBLE * (n - 1))
             |    - 2.0 * sab / (m::DOUBLE * n), 6) AS mmd2_r
             |FROM s, c""".stripMargin),
      (s, d) => Nonparam.mmdRbf(embeddings(s, d), "label", 0, 1,
        1.0 / 64)),

    // Depth-2 binary segmentation of daily order revenue: the root
    // break, then the best break WITHIN each regime — q352's scan
    // grown into the changepoint TREE.
    Q("q391_binseg2",
      Some(s"""${DiagQueries.GrainSql},
              |${binsegScanSql("root", "t")},
              |${binsegScanSql("lseg",
                 "(SELECT t.t, t.y FROM t, broot WHERE t.t < broot.break_t)")},
              |${binsegScanSql("rseg",
                 "(SELECT t.t, t.y FROM t, broot WHERE t.t >= broot.break_t)")}
              |SELECT 'root' AS segment, * FROM broot
              |UNION ALL SELECT 'left', * FROM blseg
              |UNION ALL SELECT 'right', * FROM brseg
              |ORDER BY segment""".stripMargin),
      (s, d) => TimeSeries.binarySegmentation2(
        DiagQueries.grain(s, d), "t", "y").orderBy("segment")),

    // BPE TRAINING loop: 4 merge rounds on the bounded (word, count)
    // vocab — the tokenizer-training iteration q122's single pair
    // count only hints at; each round is one vocab hash-agg + one
    // literal merge.
    Q("q392_bpe_merges",
      Some(bpeSql),
      (s, d) => TextOps.bpeTrain(documents(s, d), "text", BpeRounds)
        .orderBy("round"))
  )

  /** One bestMeanShift scan as SQL over day frame `src` (must expose
    * t, y); emits CTEs prefixed with `name`, final pick `b<name>`. */
  private def binsegScanSql(name: String, src: String): String =
    s"""pre$name AS MATERIALIZED (
       |  SELECT s.t, count(*) OVER w AS cn,
       |    sum(s.y::HUGEINT) OVER w AS cy,
       |    sum(s.y::HUGEINT * s.y) OVER w AS cyy
       |  FROM $src s WINDOW w AS (ORDER BY s.t ROWS BETWEEN
       |    UNBOUNDED PRECEDING AND CURRENT ROW)),
       |tot$name AS MATERIALIZED (
       |  SELECT max(cn)::BIGINT AS n, arg_max(cy, t) AS sy,
       |    arg_max(cyy, t) AS syy, max(t)::BIGINT AS tmax
       |  FROM pre$name),
       |cand$name AS MATERIALIZED (
       |  SELECT t, cn, cy, n, sy,
       |    cyy::DOUBLE - cy::DOUBLE * cy::DOUBLE / cn::DOUBLE AS ssel,
       |    (syy - cyy)::DOUBLE - (sy - cy)::DOUBLE
       |      * (sy - cy)::DOUBLE / (n - cn)::DOUBLE AS sser,
       |    syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE AS sse0
       |  FROM pre$name, tot$name WHERE t < tmax),
       |b$name AS MATERIALIZED (
       |  SELECT n AS n_days, (t + 1)::BIGINT AS break_t,
       |    cn::BIGINT AS n_left,
       |    round(cy::DOUBLE / cn::DOUBLE, 6) AS mean_left_r,
       |    round((sy - cy)::DOUBLE / (n - cn)::DOUBLE, 6)
       |      AS mean_right_r,
       |    CASE WHEN n > 2 AND ssel + sser > 0 THEN
       |      round((sse0 - (ssel + sser))
       |        / ((ssel + sser) / (n::DOUBLE - 2)), 6) END AS f_r
       |  FROM cand$name
       |  ORDER BY (sse0 - (ssel + sser)) DESC, t LIMIT 1)""".stripMargin
}
