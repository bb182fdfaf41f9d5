package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Infer, Sketches, TextOps, TimeSeries}
import graft.util.Tables._

/** Forecast-verification & sketch batch: KMV bottom-k distinct sketch,
  * pinball-loss forecast scoring, and the Murphy decomposition of the
  * Brier score ([[graft.ops.Sketches.kmvDistinct]],
  * [[graft.ops.TimeSeries.pinballBacktest]],
  * [[graft.ops.Infer.brierDecomposition]]).
  */
object ForecastQueries {

  private val KmvK = 64
  private val PinballLag = 7
  private val BrierBins = 10

  private val normSql = TextQueries.normSql

  val all: Seq[Q] = Seq(

    // KMV distinct-user sketch per event type: k smallest md5 hashes,
    // D̂ = (k−1)·2⁶⁰/h_(k) — exactly reproducible state, so the oracle
    // recomputes the identical k-th minimum and estimate.
    Q("q259_kmv_distinct",
      Some(s"""WITH h AS (
              |  SELECT DISTINCT event_type,
              |    ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT
              |      AS h
              |  FROM events),
              |r AS (
              |  SELECT event_type, h,
              |    row_number() OVER (PARTITION BY event_type ORDER BY h)
              |      AS rn,
              |    count(*) OVER (PARTITION BY event_type) AS nd
              |  FROM h)
              |SELECT event_type, least(nd, $KmvK)::BIGINT AS k_used,
              |  max(CASE WHEN rn = $KmvK THEN h END) AS kth_hash,
              |  round(CASE WHEN nd >= $KmvK
              |    THEN ${(KmvK - 1).toDouble} * 1152921504606846976.0
              |      / max(CASE WHEN rn = $KmvK THEN h END)
              |    ELSE nd::DOUBLE END, 6) AS est_r
              |FROM r GROUP BY event_type, nd
              |ORDER BY event_type""".stripMargin),
      (s, d) => Sketches.kmvDistinct(events(s, d), "event_type",
          "user_id", KmvK)
        .orderBy("event_type")),

    // KMV set algebra: pairwise union/Jaccard/intersection estimates
    // between event types' user sets from the bottom-64 sketches —
    // exactly reproducible state, so every estimate is oracle-checked
    // (the auditable complement of q190's HLL overlap).
    Q("q263_kmv_set_algebra",
      Some(s"""WITH h AS (
              |  SELECT DISTINCT event_type,
              |    ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT
              |      AS h
              |  FROM events),
              |bk AS (
              |  SELECT event_type, h FROM (
              |    SELECT event_type, h,
              |      row_number() OVER (PARTITION BY event_type
              |        ORDER BY h) AS rn
              |    FROM h) t
              |  WHERE rn <= $KmvK),
              |pairs AS (
              |  SELECT DISTINCT a.event_type AS group_a,
              |    b.event_type AS group_b
              |  FROM bk a JOIN bk b ON a.event_type < b.event_type),
              |pu AS (
              |  SELECT p.group_a, p.group_b, x.h
              |  FROM pairs p JOIN bk x
              |    ON x.event_type = p.group_a OR x.event_type = p.group_b
              |  GROUP BY 1, 2, 3),
              |u AS (
              |  SELECT group_a, group_b, h,
              |    row_number() OVER (PARTITION BY group_a, group_b
              |      ORDER BY h) AS rn
              |  FROM pu),
              |uk AS (SELECT * FROM u WHERE rn <= $KmvK),
              |fl AS (
              |  SELECT uk.group_a, uk.group_b, uk.h, uk.rn,
              |    CASE WHEN ia.h IS NOT NULL AND ib.h IS NOT NULL
              |      THEN 1 ELSE 0 END AS bo
              |  FROM uk
              |  LEFT JOIN bk ia ON ia.event_type = uk.group_a
              |    AND ia.h = uk.h
              |  LEFT JOIN bk ib ON ib.event_type = uk.group_b
              |    AND ib.h = uk.h),
              |agg AS (
              |  SELECT group_a, group_b, count(*)::BIGINT AS k_union,
              |    sum(bo)::BIGINT AS n_both,
              |    max(CASE WHEN rn = $KmvK THEN h END) AS kth
              |  FROM fl GROUP BY 1, 2)
              |SELECT group_a, group_b, k_union, n_both,
              |  round(CASE WHEN k_union = $KmvK
              |    THEN ${(KmvK - 1).toDouble} * 1152921504606846976.0 / kth
              |    ELSE k_union::DOUBLE END, 6) AS est_union_r,
              |  round(n_both::DOUBLE / k_union, 6) AS jaccard_r,
              |  round(n_both::DOUBLE / k_union *
              |    (CASE WHEN k_union = $KmvK
              |     THEN ${(KmvK - 1).toDouble} * 1152921504606846976.0
              |       / kth
              |     ELSE k_union::DOUBLE END), 6) AS est_inter_r
              |FROM agg ORDER BY group_a, group_b""".stripMargin),
      (s, d) => Sketches.kmvSetAlgebra(events(s, d), "event_type",
          "user_id", KmvK)
        .orderBy("group_a", "group_b")),

    // Pinball loss of the lag-7 seasonal-naïve forecast at τ = 0.5 and
    // 0.9: the asymmetric quantile score over the zero-filled spine.
    Q("q260_pinball_loss",
      Some(s"""WITH daily AS (
              |  SELECT event_type, ts::DATE AS day,
              |    count(*)::BIGINT AS x
              |  FROM events GROUP BY 1, 2),
              |bounds AS (
              |  SELECT event_type, min(day) AS d0, max(day) AS d1
              |  FROM daily GROUP BY 1),
              |spine AS (
              |  SELECT event_type,
              |    unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE
              |      AS day
              |  FROM bounds),
              |filled AS (
              |  SELECT s.event_type, s.day, coalesce(d.x, 0)::BIGINT AS x
              |  FROM spine s LEFT JOIN daily d USING (event_type, day)),
              |j AS (
              |  SELECT f.event_type, f.x, p.x AS p
              |  FROM filled f JOIN filled p
              |    ON f.event_type = p.event_type
              |   AND f.day = p.day + $PinballLag),
              |taus AS (SELECT 0.5::DOUBLE AS tau
              |         UNION ALL SELECT 0.9::DOUBLE)
              |SELECT event_type, tau, count(*)::BIGINT AS n_days,
              |  round(sum(round(greatest(tau * (x - p)::DOUBLE,
              |      (tau - 1.0) * (x - p)::DOUBLE), 9)::DECIMAL(28,9))
              |    ::DOUBLE / count(*), 6) AS pinball_r
              |FROM j CROSS JOIN taus
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, d) => TimeSeries.pinballBacktest(events(s, d), "event_type",
          "ts", PinballLag, Seq(0.5, 0.9))
        .orderBy("event_type", "tau")),

    // Murphy decomposition of the q113/q187 classifier's Brier score:
    // is it miscalibrated (REL) or just undiscriminating (low RES)?
    Q("q261_brier_decomposition",
      Some(s"""WITH s AS (
              |  SELECT substr(source, 4)::INT % 2 = 0 AS label,
              |    len(string_split($normSql, ' '))::BIGINT AS n,
              |    list_sum(list_transform(string_split($normSql, ' '),
              |      t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 2001
              |        - 1000))::BIGINT AS wsum
              |  FROM documents),
              |p AS (
              |  SELECT (wsum + 1000 * n)::DOUBLE / (2000 * n) AS p,
              |    CASE WHEN label THEN 1 ELSE 0 END AS y
              |  FROM s WHERE n > 0),
              |b AS (
              |  SELECT least(floor(p * $BrierBins), ${BrierBins - 1})
              |      ::INT AS bin, p, y
              |  FROM p),
              |g AS (
              |  SELECT bin, count(*)::BIGINT AS nb, sum(y)::BIGINT AS kb,
              |    sum(round(p, 9)::DECIMAL(28,9)) AS sp,
              |    sum(round((p - y) * (p - y), 9)::DECIMAL(28,9)) AS sq
              |  FROM b GROUP BY 1),
              |t AS (
              |  SELECT g.*, sum(nb) OVER ()::BIGINT AS n,
              |    sum(kb) OVER ()::BIGINT AS k
              |  FROM g)
              |SELECT n, count(*)::BIGINT AS n_bins,
              |  round(k::DOUBLE / n, 6) AS base_rate_r,
              |  round(sum(sq)::DOUBLE / n, 6) AS brier_r,
              |  round(sum(round(nb * ((sp::DOUBLE / nb - kb::DOUBLE / nb)
              |      * (sp::DOUBLE / nb - kb::DOUBLE / nb)), 12)
              |    ::DECIMAL(28,12))::DOUBLE / n, 6) AS rel_r,
              |  round(sum(round(nb * ((kb::DOUBLE / nb - k::DOUBLE / n)
              |      * (kb::DOUBLE / nb - k::DOUBLE / n)), 12)
              |    ::DECIMAL(28,12))::DOUBLE / n, 6) AS res_r,
              |  round(k::DOUBLE / n * (1.0 - k::DOUBLE / n), 6) AS unc_r
              |FROM t GROUP BY n, k ORDER BY n""".stripMargin),
      (s, d) => {
        val scored = documents(s, d)
          .withColumn("_toks", TextOps.tokens(
            TextOps.normalize(col("text"))))
          .withColumn("_n", size(col("_toks")).cast("long"))
          .withColumn("_wsum", expr(
            "aggregate(transform(_toks, t -> CAST(conv(substring(md5(t)," +
              " 1, 15), 16, 10) AS LONG) % 2001 - 1000), 0L," +
              " (a, x) -> a + x)"))
          .where(col("_n") > 0)
          .select(((col("_wsum") + lit(1000) * col("_n")).cast("double")
            / (lit(2000) * col("_n"))).as("p"),
            (substring(col("source"), 4, 8).cast("int") % 2 === 0)
              .as("_lab"))
        Infer.brierDecomposition(scored, "p", col("_lab"), BrierBins)
          .orderBy("n")
      }))
}
