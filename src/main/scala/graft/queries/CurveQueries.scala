package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Behavior, Infer, Skew, TextOps, TimeSeries}
import graft.util.Tables._

/** Round-11 curve/correction batch: seasonal Mann–Kendall (q403),
  * Burrows' Delta stylometry (q404), restricted mean survival time
  * (q405), the Lorenz decile table (q406), and Holm step-down FWER
  * control (q407).
  */
object CurveQueries {

  private val HolmAlpha = 0.05
  private val RmstTau = 30L
  private val DeltaTopK = 30

  val all: Seq[Q] = Seq(

    // Seasonal Mann-Kendall: the q293 trend test stratified by
    // day-of-week, so the weekly cycle can neither fake nor mask a
    // monotone trend - pairs compare only like-with-like days.
    Q("q403_seasonal_mann_kendall",
      Some("""WITH grain AS MATERIALIZED (
             |  SELECT event_type, ts::DATE AS day,
             |    (extract(dow FROM ts::DATE) + 1)::BIGINT AS dw,
             |    count(*)::BIGINT AS x
             |  FROM events GROUP BY 1, 2, 3),
             |nn AS (SELECT event_type, count(*)::BIGINT AS n FROM grain
             |       GROUP BY 1),
             |p AS (
             |  SELECT a.event_type,
             |    CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1
             |      ELSE 0 END AS sg
             |  FROM grain a JOIN grain b
             |    ON a.event_type = b.event_type AND a.dw = b.dw
             |    AND a.day < b.day),
             |s AS (SELECT event_type, sum(sg)::BIGINT AS s_stat FROM p
             |      GROUP BY 1),
             |strat AS (SELECT event_type, dw, count(*)::BIGINT AS ns
             |          FROM grain GROUP BY 1, 2),
             |ties AS (SELECT event_type, dw, x, count(*)::BIGINT AS t
             |         FROM grain GROUP BY 1, 2, 3),
             |tc AS (SELECT event_type, dw,
             |    sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tcorr
             |  FROM ties WHERE t > 1 GROUP BY 1, 2),
             |vs AS (
             |  SELECT st.event_type,
             |    sum(st.ns * (st.ns - 1) * (2 * st.ns + 5)
             |      - coalesce(tc.tcorr, 0))::BIGINT AS var18
             |  FROM strat st LEFT JOIN tc
             |    ON tc.event_type = st.event_type AND tc.dw = st.dw
             |  GROUP BY 1)
             |SELECT s.event_type, nn.n, s.s_stat,
             |  CASE WHEN vs.var18 > 0 AND s.s_stat > 0 THEN
             |      round((s.s_stat - 1)::DOUBLE
             |        / sqrt(vs.var18::DOUBLE / 18.0), 6)
             |    WHEN vs.var18 > 0 AND s.s_stat < 0 THEN
             |      round((s.s_stat + 1)::DOUBLE
             |        / sqrt(vs.var18::DOUBLE / 18.0), 6)
             |    WHEN vs.var18 > 0 THEN 0.0 END AS z_r
             |FROM s JOIN nn USING (event_type) JOIN vs USING (event_type)
             |ORDER BY event_type""".stripMargin),
      (s, d) => TimeSeries.seasonalMannKendall(events(s, d),
        "event_type", "ts").orderBy("event_type")),

    // Burrows' Delta between sources: z-scored top-30-term frequency
    // profiles, mean |dz| per source pair - the stylometric distance
    // that flags boilerplate farms and single-author source clusters.
    Q("q404_burrows_delta",
      Some(s"""WITH tok AS MATERIALIZED (
              |  SELECT source AS g, unnest(string_split(
              |    ${TextQueries.normSql}, ' ')) AS t
              |  FROM documents),
              |top AS MATERIALIZED (
              |  SELECT t FROM (
              |    SELECT t, count(*)::BIGINT AS n FROM tok GROUP BY 1)
              |  ORDER BY n DESC, t LIMIT $DeltaTopK),
              |tot AS (SELECT g, count(*)::BIGINT AS tot FROM tok
              |        GROUP BY 1),
              |st AS (
              |  SELECT tok.g, tok.t, count(*)::BIGINT AS c
              |  FROM tok JOIN top USING (t) GROUP BY 1, 2),
              |grid AS MATERIALIZED (
              |  SELECT tot.g, top.t,
              |    coalesce(st.c, 0)::DOUBLE / tot.tot::DOUBLE AS f
              |  FROM tot CROSS JOIN top
              |  LEFT JOIN st ON st.g = tot.g AND st.t = top.t),
              |mom AS MATERIALIZED (
              |  SELECT t, count(*)::DOUBLE AS ng,
              |    sum(round(f, 12)::DECIMAL(28,12))::DOUBLE AS s1,
              |    sum(round(f * f, 12)::DECIMAL(28,12))::DOUBLE AS s2
              |  FROM grid GROUP BY 1),
              |z AS MATERIALIZED (
              |  SELECT grid.g, grid.t,
              |    (grid.f - mom.s1 / mom.ng)
              |      / nullif(sqrt(greatest(mom.s2 / mom.ng
              |        - (mom.s1 / mom.ng) * (mom.s1 / mom.ng), 0.0)),
              |        0.0) AS z
              |  FROM grid JOIN mom USING (t))
              |SELECT a.g AS source_a, b.g AS source_b,
              |  sum(CASE WHEN a.z IS NOT NULL AND b.z IS NOT NULL
              |    THEN 1 ELSE 0 END)::BIGINT AS n_terms,
              |  round(sum(round(coalesce(abs(a.z - b.z), 0.0), 12)
              |    ::DECIMAL(28,12))::DOUBLE
              |    / sum(CASE WHEN a.z IS NOT NULL AND b.z IS NOT NULL
              |      THEN 1 ELSE 0 END)::DOUBLE, 6) AS delta_r
              |FROM z a JOIN z b ON a.t = b.t AND a.g < b.g
              |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin),
      (s, d) => TextOps.burrowsDelta(documents(s, d), "source", "text",
        DeltaTopK).orderBy("source_a", "source_b")),

    // Restricted mean survival time to day 30: area under the q132
    // Kaplan-Meier curve - "expected purchase-free days in the first
    // month", defined even when median survival never crosses 0.5.
    Q("q405_rmst",
      Some(s"""WITH su AS (
              |  SELECT user_id, min(ts) AS t0 FROM events
              |  WHERE event_type = 'signup' GROUP BY 1),
              |pu AS (
              |  SELECT e.user_id, min(e.ts) AS t1
              |  FROM events e JOIN su ON su.user_id = e.user_id
              |  WHERE e.event_type = 'purchase' AND e.ts >= su.t0
              |  GROUP BY 1),
              |mx AS (SELECT max(ts) AS tmax FROM events),
              |subj AS (
              |  SELECT CASE WHEN pu.t1 IS NOT NULL
              |      THEN datediff('day', su.t0::DATE, pu.t1::DATE)
              |      ELSE datediff('day', su.t0::DATE, mx.tmax::DATE)
              |    END::BIGINT AS t,
              |    pu.t1 IS NOT NULL AS observed
              |  FROM su LEFT JOIN pu USING (user_id), mx),
              |perT AS (
              |  SELECT t, sum(CASE WHEN observed THEN 1 ELSE 0 END)
              |      ::BIGINT AS d,
              |    count(*)::BIGINT AS alln
              |  FROM subj GROUP BY 1),
              |tot AS (SELECT sum(alln)::BIGINT AS n FROM perT),
              |w AS (
              |  SELECT t, d,
              |    (n - coalesce(sum(alln) OVER (ORDER BY t
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              |      0))::BIGINT AS n_risk, n
              |  FROM perT, tot),
              |f AS (
              |  SELECT t, d, n_risk, n,
              |    CASE WHEN (n_risk - d)::DOUBLE / n_risk > 0
              |      THEN ln((n_risk - d)::DOUBLE / n_risk)
              |      ELSE 0.0 END AS lnf
              |  FROM w WHERE d > 0),
              |curve AS (
              |  SELECT t, d, n,
              |    exp(sum(lnf) OVER (ORDER BY t
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              |      AS s
              |  FROM f),
              |clipped AS (SELECT * FROM curve WHERE t <= $RmstTau),
              |segs AS (
              |  SELECT t, d, n, s,
              |    coalesce(lead(t) OVER (ORDER BY t), $RmstTau) AS tn
              |  FROM clipped)
              |SELECT $RmstTau::BIGINT AS tau, max(n)::BIGINT AS n,
              |  sum(d)::BIGINT AS n_events_le_tau,
              |  round(least(min(t)::DOUBLE, ${RmstTau}.0)
              |    + sum(round(s * (least(tn, $RmstTau) - t)::DOUBLE, 12)
              |      ::DECIMAL(28,12))::DOUBLE, 6) AS rmst_r
              |FROM segs""".stripMargin),
      (s, d) => {
        val ev = events(s, d)
        val su = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("ts")).as("t0"))
        val pu = ev.filter(col("event_type") === "purchase")
          .join(su, "user_id").filter(col("ts") >= col("t0"))
          .groupBy("user_id").agg(min(col("ts")).as("t1"))
        val mx = ev.agg(max(col("ts")).as("tmax"))
        val subj = su.join(pu, Seq("user_id"), "left")
          .crossJoin(broadcast(mx))
          .select(
            when(col("t1").isNotNull,
              datediff(to_date(col("t1")), to_date(col("t0"))))
              .otherwise(datediff(to_date(col("tmax")),
                to_date(col("t0"))))
              .cast("long").as("t"),
            col("t1").isNotNull.as("observed"))
        Behavior.rmst(subj, "t", "observed", RmstTau)
      }),

    // Lorenz decile table of customer revenue: the distributional
    // curve behind q286's scalar concentration - decile shares and
    // cumulative shares from a banded (never single-task) key rank.
    Q("q406_lorenz_deciles",
      Some("""WITH k AS MATERIALIZED (
             |  SELECT o_custkey AS ck,
             |    sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
             |      AS v
             |  FROM orders GROUP BY 1),
             |r AS MATERIALIZED (
             |  SELECT v, ntile(10) OVER (ORDER BY v, ck) AS decile
             |  FROM k),
             |dec AS (
             |  SELECT decile::INT AS decile, count(*)::BIGINT AS n_keys,
             |    sum(v)::BIGINT AS total
             |  FROM r GROUP BY 1),
             |g AS (SELECT sum(total)::BIGINT AS gt FROM dec)
             |SELECT decile, n_keys, total,
             |  round(total::DOUBLE / gt::DOUBLE, 6) AS share_r,
             |  round((sum(total) OVER (ORDER BY decile
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |    ::DOUBLE / gt::DOUBLE, 6) AS cum_share_r
             |FROM dec, g ORDER BY decile""".stripMargin),
      (s, d) => Skew.lorenzDeciles(
        orders(s, d).select(col("o_custkey"),
          round(col("o_totalprice") * 100).cast("long").as("_cents")),
        "o_custkey", "_cents").orderBy("decile")),

    // Holm step-down over the q232 hypothesis family: FWER control -
    // reject the ranked prefix before the first failure at
    // alpha/(m-k+1); the conservative sibling of BH's FDR step-up.
    Q("q407_holm_stepdown",
      Some(s"""WITH v AS (
              |  SELECT event_type,
              |    CAST(round(value * 1000000) AS BIGINT) AS v6
              |  FROM events),
              |g AS (
              |  SELECT count(*)::BIGINT AS n, sum(v6)::DOUBLE AS s,
              |    sum(v6::HUGEINT * v6)::DOUBLE AS ss
              |  FROM v),
              |t AS (
              |  SELECT event_type, count(*)::BIGINT AS n_g,
              |    sum(v6)::DOUBLE AS s_g
              |  FROM v GROUP BY 1),
              |z AS (
              |  SELECT event_type, n_g,
              |    (s_g / n_g - s / n)
              |      / sqrt(((ss - s * s / n) / (n - 1)) / n_g) AS z
              |  FROM t, g WHERE (ss - s * s / n) / (n - 1) > 0),
              |p AS (
              |  SELECT event_type, n_g, z,
              |    2.0 * (1.0 - ${Infer.normalCdfSql("abs(z)")}) AS p
              |  FROM z),
              |r AS (
              |  SELECT *, row_number() OVER (ORDER BY p, event_type)
              |      AS holm_rank,
              |    count(*) OVER () AS m
              |  FROM p),
              |kf AS (
              |  SELECT min(CASE WHEN p > $HolmAlpha / (m - holm_rank + 1)
              |    THEN holm_rank END) AS kfail FROM r)
              |SELECT event_type, n_g, round(z, 6) AS z_r,
              |  round(p, 6) AS p_r, holm_rank,
              |  round($HolmAlpha / (m - holm_rank + 1), 6)
              |    AS holm_thresh_r,
              |  coalesce(holm_rank < kf.kfail, true) AS discovery
              |FROM r, kf ORDER BY holm_rank""".stripMargin),
      (s, d) => {
        val v = events(s, d).select(col("event_type"),
          round(col("value") * lit(1000000.0)).cast("long").as("_v6"))
        val g = v.agg(count(lit(1)).as("n"),
          sum(col("_v6")).cast("double").as("s"),
          sum(col("_v6").cast("decimal(38,0)") * col("_v6"))
            .cast("double").as("ss"))
        val t = v.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_g"),
            sum(col("_v6")).cast("double").as("s_g"))
        val vg = (col("ss") - col("s") * col("s") / col("n")) /
          (col("n") - lit(1))
        val z = t.crossJoin(broadcast(g))
          .where(vg > 0)
          .withColumn("z", (col("s_g") / col("n_g") - col("s") / col("n"))
            / sqrt(vg / col("n_g")))
        val p = z.select(col("event_type"), col("n_g"), col("z"),
          (lit(2.0) * (lit(1.0) - Infer.normalCdf(abs(col("z")))))
            .as("p"))
        Infer.holmStepDown(p, "p", "event_type", HolmAlpha)
          .select(col("event_type"), col("n_g"),
            round(col("z"), 6).as("z_r"), round(col("p"), 6).as("p_r"),
            col("holm_rank"), col("holm_thresh_r"), col("discovery"))
          .orderBy("holm_rank")
      })
  )
}
