package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Infer, Profile, Similarity}
import graft.util.Tables._

/** Round-11 robust/curation batch: hard-negative mining (q378), Platt
  * score calibration (q379), blocking-quality audit (q380), the
  * Rousseeuw–Croux Sn robust scale (q381) and diagonal-Mahalanobis
  * embedding outliers (q382). The Platt oracle is an unrolled
  * `AS MATERIALIZED` Newton chain on the 12-dp DECIMAL grid (the
  * q373–q375 convention) with the sigmoid argument AND value rounded to
  * 12 dp so a last-ulp exp() divergence cannot enter the trajectory;
  * Sn is exact integer order statistics end-to-end.
  */
object RobustQueries {

  private val PlattBins = 40
  private val PlattIters = 6

  /** Unrolled Newton chain for the Platt fit. Width is written as the
    * same double expression (2.0/40) both engines evaluate. */
  private def plattSql: String = {
    val steps = (1 to PlattIters).map { i =>
      s"""g$i AS MATERIALIZED (
         |  SELECT
         |    sum(round((t.n * t.p - t.k) * t.xb, 12)::DECIMAL(28,12))
         |      ::DOUBLE AS g1,
         |    sum(round(t.n * t.p - t.k, 12)::DECIMAL(28,12))
         |      ::DOUBLE AS g2,
         |    sum(round(t.n * t.p * (1.0 - t.p) * t.xb * t.xb, 12)
         |      ::DECIMAL(28,12))::DOUBLE AS h11,
         |    sum(round(t.n * t.p * (1.0 - t.p) * t.xb, 12)
         |      ::DECIMAL(28,12))::DOUBLE AS h12,
         |    sum(round(t.n * t.p * (1.0 - t.p), 12)::DECIMAL(28,12))
         |      ::DOUBLE AS h22
         |  FROM (SELECT g.n, g.k, g.xb,
         |      round(1.0 / (1.0 + exp(-round(a.a * g.xb + a.b, 12))), 12)
         |        AS p
         |    FROM grid g, ab${i - 1} a) t),
         |ab$i AS MATERIALIZED (
         |  SELECT
         |    a.a - coalesce((g.g1 * g.h22 - g.g2 * g.h12)
         |      / nullif(g.h11 * g.h22 - g.h12 * g.h12, 0.0), 0.0) AS a,
         |    a.b - coalesce((g.g2 * g.h11 - g.g1 * g.h12)
         |      / nullif(g.h11 * g.h22 - g.h12 * g.h12, 0.0), 0.0) AS b
         |  FROM g$i g, ab${i - 1} a)""".stripMargin
    }.mkString(",\n")
    s"""WITH s AS MATERIALIZED (
       |  SELECT doc_id, substr(source, 4)::INT % 2 = 0 AS label,
       |    len(string_split(${TextQueries.normSql}, ' '))::BIGINT AS n,
       |    list_sum(list_transform(string_split(${TextQueries.normSql}, ' '),
       |      t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 2001
       |        - 1000))::BIGINT AS wsum
       |  FROM documents),
       |x AS MATERIALIZED (
       |  SELECT wsum::DOUBLE / (1000 * n) AS x,
       |    CASE WHEN label THEN 1 ELSE 0 END AS y
       |  FROM s WHERE n > 0),
       |grid AS MATERIALIZED (
       |  SELECT least(greatest(floor((x - (-1.0)) / (2.0 / $PlattBins)),
       |      0.0), ${PlattBins - 1}.0)::BIGINT AS b,
       |    count(*)::BIGINT AS n, sum(y)::BIGINT AS k,
       |    -1.0 + (least(greatest(floor((x - (-1.0)) / (2.0 / $PlattBins)),
       |      0.0), ${PlattBins - 1}.0) + 0.5) * (2.0 / $PlattBins) AS xb
       |  FROM x GROUP BY 1, 4),
       |ab0 AS (SELECT 0.0::DOUBLE AS a, 0.0::DOUBLE AS b),
       |$steps,
       |fin AS MATERIALIZED (
       |  SELECT g.n, g.k,
       |    least(greatest(
       |      round(1.0 / (1.0 + exp(-round(a.a * g.xb + a.b, 12))), 12),
       |      1e-12), 1.0 - 1e-12) AS p,
       |    a.a AS af, a.b AS bf
       |  FROM grid g, ab$PlattIters a)
       |SELECT sum(n)::BIGINT AS n, sum(k)::BIGINT AS n_pos,
       |  round(max(af), 6) AS a_r, round(max(bf), 6) AS b_r,
       |  round(sum(round(-(k * ln(p) + (n - k) * ln(1.0 - p)), 12)
       |    ::DECIMAL(28,12))::DOUBLE / sum(n), 6) AS nll_r
       |FROM fin""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // Hard-negative mining for contrastive training: per anchor, the 3
    // most-similar vectors with a DIFFERENT label — the false-positive
    // boundary cases a contrastive loss learns most from.
    Q("q378_hard_negatives",
      Some("""WITH sims AS MATERIALIZED (
             |  SELECT q.vec_id AS q_id, q.label AS q_label,
             |    e.vec_id AS neighbor_id, e.label AS n_label,
             |    list_cosine_similarity(e.embedding::DOUBLE[],
             |      q.embedding::DOUBLE[]) AS sim
             |  FROM embeddings e, embeddings q
             |  WHERE e.label <> q.label),
             |ranked AS (
             |  SELECT q_id, q_label, neighbor_id, n_label,
             |    round(sim, 9) AS sim_r,
             |    row_number() OVER (PARTITION BY q_id
             |      ORDER BY sim DESC, neighbor_id) AS rn
             |  FROM sims WHERE sim IS NOT NULL)
             |SELECT q_id, q_label, rn, neighbor_id, n_label, sim_r
             |FROM ranked WHERE rn <= 3
             |ORDER BY q_id, rn""".stripMargin),
      (s, d) => Similarity.hardNegatives(embeddings(s, d), 3)
        .orderBy("q_id", "rn")),

    // Platt scaling of the hashed-linear doc score against the parity
    // label (the q280 calibration base): P(y|x) = sigmoid(Ax + B), fit
    // by Newton-Raphson on the 40-bin score grid - the probabilistic
    // calibration next to q280's non-parametric isotonic fit.
    Q("q379_platt_scaling",
      Some(plattSql),
      (s, d) => {
        val sc = documents(s, d)
          .withColumn("_toks",
            split(lower(trim(regexp_replace(col("text"), "\\s+", " "))),
              " "))
          .withColumn("_n", size(col("_toks")).cast("long"))
          .where(col("_n") > 0)
          .withColumn("_wsum", expr(
            "aggregate(transform(_toks, t -> CAST(conv(substring(md5(t)," +
              " 1, 15), 16, 10) AS LONG) % 2001 - 1000), 0L, (a, x) -> a + x)"))
          .select(
            (col("_wsum").cast("double") / (lit(1000L) * col("_n")))
              .as("_x"),
            (substring(col("source"), 4, 8).cast("int") % 2 === 0)
              .as("_y"))
        Infer.plattScaling(sc, "_x", "_y", -1.0, 1.0, PlattBins,
          PlattIters)
      }),

    // Blocking-quality audit of the sorted-neighborhood blocking
    // (q146's scheme, w = 10): reduction ratio vs C(N,2) and pair
    // completeness against exact-content duplicate ground truth.
    Q("q380_blocking_quality",
      Some(s"""WITH keyed AS MATERIALIZED (
              |  SELECT doc_id, substr(${TextQueries.normSql}, 1, 24) AS key
              |  FROM documents),
              |r AS MATERIALIZED (
              |  SELECT doc_id,
              |    row_number() OVER (ORDER BY key, doc_id) AS rn
              |  FROM keyed),
              |cand AS MATERIALIZED (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              |  FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn <= 9),
              |h AS MATERIALIZED (
              |  SELECT doc_id, md5(text) AS ch FROM documents),
              |tp AS MATERIALIZED (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              |  FROM h a JOIN h b ON a.ch = b.ch AND b.doc_id > a.doc_id),
              |m AS (
              |  SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
              |    (SELECT count(*) FROM tp)::BIGINT AS n_true_pairs,
              |    (SELECT count(*) FROM cand)::BIGINT AS n_cand_pairs,
              |    (SELECT count(*) FROM tp
              |     WHERE EXISTS (SELECT 1 FROM cand c
              |       WHERE c.doc_a = tp.doc_a AND c.doc_b = tp.doc_b))
              |      ::BIGINT AS n_found_pairs)
              |SELECT n_docs, n_true_pairs, n_cand_pairs, n_found_pairs,
              |  round(1.0 - n_cand_pairs::DOUBLE /
              |    ((n_docs::HUGEINT * (n_docs - 1) / 2)::DOUBLE), 6)
              |    AS rr_r,
              |  round(n_found_pairs::DOUBLE
              |    / nullif(n_true_pairs::DOUBLE, 0.0), 6) AS pc_r
              |FROM m""".stripMargin),
      (s, d) => Dedup.blockingQualityAudit(documents(s, d), "doc_id",
        "text", 10)),

    // Rousseeuw-Croux Sn robust scale of daily revenue: 50%-breakdown
    // spread with no location estimate - lowmed over highmeds of exact
    // integer cent differences on the calendar-bounded day grain.
    Q("q381_sn_scale",
      Some("""WITH daily AS MATERIALIZED (
             |  SELECT l_shipdate AS day,
             |    sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             |      ::BIGINT AS cents
             |  FROM lineitem GROUP BY 1),
             |n AS (SELECT count(*)::BIGINT AS n FROM daily),
             |pairs AS MATERIALIZED (
             |  SELECT a.day AS di, b.day AS dj,
             |    abs(a.cents - b.cents)::BIGINT AS d
             |  FROM daily a JOIN daily b ON a.day <> b.day),
             |hm AS MATERIALIZED (
             |  SELECT di, d AS hm FROM (
             |    SELECT di, d, row_number() OVER (
             |      PARTITION BY di ORDER BY d, dj) AS rn
             |    FROM pairs) t, n
             |  WHERE t.rn = (n.n - 1) // 2 + 1),
             |lm AS (
             |  SELECT hm FROM (
             |    SELECT hm, row_number() OVER (ORDER BY hm, di) AS rn
             |    FROM hm) t, n
             |  WHERE t.rn = (n.n + 1) // 2)
             |SELECT n.n, lm.hm AS sn_raw,
             |  round(1.1926 * lm.hm, 6) AS sn_r
             |FROM lm, n""".stripMargin),
      (s, d) => {
        val daily = lineitem(s, d)
          .groupBy(col("l_shipdate").as("_day"))
          .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
            .as("_cents"))
        Profile.snScale(daily, "_day", "_cents")
      }),

    // Diagonal-Mahalanobis embedding outliers: per-dim corpus
    // mean/std in one d-bounded hash-agg, score = sum of z^2 - the
    // no-inverse outlier scan every embedding corpus can afford.
    Q("q382_mahalanobis_outliers",
      Some("""WITH x AS MATERIALIZED (
             |  SELECT e.vec_id, g.i - 1 AS j,
             |    e.embedding[g.i]::DOUBLE AS x
             |  FROM (SELECT vec_id, embedding::DOUBLE[] AS embedding
             |        FROM embeddings) e,
             |    unnest(generate_series(1, len(e.embedding))) AS g(i)),
             |stats AS MATERIALIZED (
             |  SELECT j, count(*)::DOUBLE AS n,
             |    sum(round(x, 12)::DECIMAL(28,12))::DOUBLE AS s1,
             |    sum(round(x * x, 12)::DECIMAL(28,12))::DOUBLE AS s2
             |  FROM x GROUP BY 1),
             |st AS MATERIALIZED (
             |  SELECT j, s1 / n AS mu,
             |    sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0.0)) AS sd
             |  FROM stats),
             |z AS MATERIALIZED (
             |  SELECT x.vec_id,
             |    sum(round(coalesce(
             |      ((x.x - st.mu) / nullif(st.sd, 0.0))
             |        * ((x.x - st.mu) / nullif(st.sd, 0.0)), 0.0), 12)
             |      ::DECIMAL(28,12))::DOUBLE AS s
             |  FROM x JOIN st USING (j) GROUP BY 1),
             |top AS (
             |  SELECT vec_id, round(s, 6) AS score_r FROM z
             |  ORDER BY s DESC, vec_id LIMIT 20)
             |SELECT row_number() OVER (ORDER BY score_r DESC, vec_id)
             |    AS rn, vec_id, score_r
             |FROM top ORDER BY rn""".stripMargin),
      (s, d) => Similarity.mahalanobisDiag(embeddings(s, d), 20)
        .orderBy("rn"))
  )
}
