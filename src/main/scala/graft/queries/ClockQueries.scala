package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Circular, Control, TimeSeries}
import graft.util.Tables._

/** Round-12 clock/monitoring batch: circular statistics on the
  * time-of-day clock (Kuiper uniformity, Rayleigh/von-Mises summary),
  * the Lomb–Scargle periodogram for irregularly observed series, the
  * I-MR control chart with Western Electric run rules, and Taylor's
  * variance–mean power law.
  *
  * Cross-engine discipline: no engine trig in any plan — cos/sin are
  * Scala-computed literals over bounded bin grids, shared verbatim
  * with the oracle (the spectralPower idiom); float sums are 12-dp
  * DECIMAL term sums; σ-band comparisons in the control chart are
  * exact cross-multiplied integers.
  */
object ClockQueries {

  private val KuiperBins = 1440
  private val ClockBins = 96
  private val LsPeriods = (3 to 10).toSeq

  val all: Seq[Q] = Seq(

    // Kuiper test of minute-of-day uniformity: the rotation-invariant
    // KS variant (V = D+ + D-) on the 1440-cell clock grid — a
    // diurnal-load detector that cannot be fooled by where midnight
    // cuts the clock. Exact rational deviations; stats rounded at 6dp.
    Q("q463_kuiper_minutes",
      Some(s"""WITH b AS (
              |  SELECT ((epoch_us(ts) % 86400000000) // 60000000)
              |    ::BIGINT AS b
              |  FROM events),
              |cnt AS (SELECT b, count(*)::BIGINT AS c FROM b
              |  GROUP BY 1),
              |grid AS (
              |  SELECT g.b, coalesce(c.c, 0)::BIGINT AS c
              |  FROM (SELECT unnest(generate_series(0, 1439))::BIGINT
              |    AS b) g
              |  LEFT JOIN cnt c USING (b)),
              |cum AS (SELECT b,
              |  sum(c) OVER (ORDER BY b)::BIGINT AS cc FROM grid),
              |tot AS (SELECT sum(c)::BIGINT AS n FROM grid),
              |dev AS (SELECT n,
              |  $KuiperBins * cc - n * (b + 1) AS num FROM cum, tot),
              |agg AS (SELECT n,
              |  greatest(max(num), 0)::BIGINT AS dp,
              |  greatest(max(-num), 0)::BIGINT AS dm
              |  FROM dev GROUP BY 1)
              |SELECT n,
              |  round(dp::DOUBLE / (n * $KuiperBins), 6) AS dplus_r,
              |  round(dm::DOUBLE / (n * $KuiperBins), 6) AS dminus_r,
              |  round((dp + dm)::DOUBLE / (n * $KuiperBins), 6) AS v_r,
              |  round((dp + dm)::DOUBLE / (n * $KuiperBins)
              |    * (sqrt(n::DOUBLE) + 0.155 + 0.24 / sqrt(n::DOUBLE)),
              |    6) AS vstar_r
              |FROM agg""".stripMargin),
      (s, d) => Circular.kuiperUniform(events(s, d), "ts", KuiperBins)),

    // Per-type circular summary on the 96-cell clock: resultant
    // length, circular mean direction, Rayleigh z + small-sample p,
    // von-Mises kappa (Best–Fisher three-piece approximation).
    Q("q464_clock_stats",
      Some(s"""WITH cnt AS (
              |  SELECT event_type,
              |    ((epoch_us(ts) % 86400000000) // 900000000)
              |      ::BIGINT AS b,
              |    count(*)::BIGINT AS x
              |  FROM events GROUP BY 1, 2),
              |wt(b, c, sn) AS (VALUES
              |    ${Circular.clockWeightValues(ClockBins)}),
              |agg AS (SELECT event_type, sum(x)::BIGINT AS n,
              |  sum(round(x * c, 12)::DECIMAL(28,12))::DOUBLE AS sc,
              |  sum(round(x * sn, 12)::DECIMAL(28,12))::DOUBLE AS ss
              |  FROM cnt JOIN wt USING (b) GROUP BY 1),
              |r AS (SELECT event_type, n, sc, ss,
              |  round(sqrt(sc * sc + ss * ss) / n, 12) AS rb FROM agg)
              |SELECT event_type, n,
              |  round(rb, 6) AS rbar_r,
              |  round(atan2(ss, sc), 6) AS mean_dir_r,
              |  round(n * rb * rb, 6) AS rayleigh_z_r,
              |  round(exp(-(n * rb * rb)) * (1.0
              |    + (2.0 * (n * rb * rb) - (n * rb * rb) * (n * rb * rb))
              |      / (4.0 * n)), 6) AS rayleigh_p_r,
              |  round(CASE
              |    WHEN rb < 0.53 THEN 2.0 * rb + rb * rb * rb
              |      + 5.0 * (rb * rb * rb * rb * rb) / 6
              |    WHEN rb < 0.85 THEN -0.4 + 1.39 * rb
              |      + 0.43 / (1.0 - rb)
              |    ELSE 1.0 / greatest(rb * rb * rb - 4.0 * (rb * rb)
              |      + 3.0 * rb, 1e-12) END, 6) AS kappa_r
              |FROM r ORDER BY event_type""".stripMargin),
      (s, d) => Circular.clockStats(events(s, d), "event_type", "ts",
          ClockBins)
        .orderBy("event_type")),

    // Lomb–Scargle periodogram of the daily order-count series at
    // trial periods 3..10 days, observed days only (no zero-fill —
    // LS is the irregular-sampling spectral estimator), in the
    // τ-free normal-equations form.
    Q("q465_lomb_scargle",
      Some(s"""WITH daily AS (
              |  SELECT o_orderdate::DATE AS day, count(*)::BIGINT AS x
              |  FROM orders GROUP BY 1),
              |d0 AS (SELECT min(day) AS d0 FROM daily),
              |base AS (SELECT (day - d0)::BIGINT AS t, x::DOUBLE AS y
              |  FROM daily, d0),
              |wt(period, r, c, sn) AS (VALUES
              |    ${TimeSeries.lsWeightValues(LsPeriods)}),
              |j AS (SELECT w.period, b.y, w.c, w.sn
              |  FROM base b JOIN wt w ON b.t % w.period = w.r),
              |agg AS (SELECT period, count(*)::BIGINT AS n_days,
              |  sum(round(y, 12)::DECIMAL(28,12))::DOUBLE AS sy,
              |  sum(round(y * y, 12)::DECIMAL(28,12))::DOUBLE AS sy2,
              |  sum(round(c, 12)::DECIMAL(28,12))::DOUBLE AS swc,
              |  sum(round(sn, 12)::DECIMAL(28,12))::DOUBLE AS sws,
              |  sum(round(y * c, 12)::DECIMAL(28,12))::DOUBLE AS syc,
              |  sum(round(y * sn, 12)::DECIMAL(28,12))::DOUBLE AS sys,
              |  sum(round(c * c, 12)::DECIMAL(28,12))::DOUBLE AS scc,
              |  sum(round(sn * sn, 12)::DECIMAL(28,12))::DOUBLE AS sss,
              |  sum(round(c * sn, 12)::DECIMAL(28,12))::DOUBLE AS scs
              |  FROM j GROUP BY 1),
              |f AS (SELECT period, n_days,
              |  syc - sy / n_days * swc AS fc,
              |  sys - sy / n_days * sws AS fs,
              |  scc * sss - scs * scs AS det,
              |  (sy2 - n_days * (sy / n_days) * (sy / n_days))
              |    / (n_days - 1) AS vary,
              |  scc, sss, scs
              |  FROM agg)
              |SELECT period, n_days,
              |  CASE WHEN n_days >= 3 AND abs(det) > 1e-9
              |    THEN round((fc * fc * sss - 2.0 * fc * fs * scs
              |      + fs * fs * scc) / det / 2, 6) END AS power_r,
              |  CASE WHEN n_days >= 3 AND abs(det) > 1e-9 AND vary > 0
              |    THEN round((fc * fc * sss - 2.0 * fc * fs * scs
              |      + fs * fs * scc) / det / 2 / vary, 6) END
              |    AS pnorm_r
              |FROM f ORDER BY period""".stripMargin),
      (s, d) => {
        val daily = orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(count(lit(1)).as("x"))
        TimeSeries.lombScargle(daily, "day", "x", LsPeriods)
          .orderBy("period")
      }),

    // I-MR control chart on daily event counts with Western Electric
    // run rules 1–4: exact integer σ-band indicators (the
    // cross-multiplied form), rolling run windows on the day grain.
    Q("q466_imr_chart",
      Some("""WITH daily AS (
             |  SELECT ts::DATE AS day, count(*)::BIGINT AS x
             |  FROM events GROUP BY 1),
             |mr AS (SELECT day, x,
             |  abs(x - lag(x) OVER (ORDER BY day)) AS mrv FROM daily),
             |tot AS (SELECT count(*)::BIGINT AS n,
             |  sum(x)::BIGINT AS sx, sum(mrv)::BIGINT AS smr FROM mr),
             |f AS (SELECT day, x, n, sx, smr,
             |  CASE WHEN 1128 * (n - 1) * abs(n * x - sx)
             |    > 3000 * n * smr THEN 1 ELSE 0 END AS b3,
             |  (CASE WHEN 1128 * (n - 1) * abs(n * x - sx)
             |    > 2000 * n * smr THEN 1 ELSE 0 END)
             |   * (CASE WHEN n * x - sx > 0 THEN 1 ELSE 0 END) AS b2p,
             |  (CASE WHEN 1128 * (n - 1) * abs(n * x - sx)
             |    > 2000 * n * smr THEN 1 ELSE 0 END)
             |   * (CASE WHEN n * x - sx < 0 THEN 1 ELSE 0 END) AS b2n,
             |  (CASE WHEN 1128 * (n - 1) * abs(n * x - sx)
             |    > 1000 * n * smr THEN 1 ELSE 0 END)
             |   * (CASE WHEN n * x - sx > 0 THEN 1 ELSE 0 END) AS b1p,
             |  (CASE WHEN 1128 * (n - 1) * abs(n * x - sx)
             |    > 1000 * n * smr THEN 1 ELSE 0 END)
             |   * (CASE WHEN n * x - sx < 0 THEN 1 ELSE 0 END) AS b1n,
             |  CASE WHEN n * x - sx > 0 THEN 1
             |    WHEN n * x - sx < 0 THEN -1 ELSE 0 END AS side
             |  FROM mr, tot),
             |runs AS (SELECT n, sx, smr, b3,
             |  CASE WHEN count(x) OVER w3 = 3 AND
             |    (sum(b2p) OVER w3 >= 2 OR sum(b2n) OVER w3 >= 2)
             |    THEN 1 ELSE 0 END AS r2,
             |  CASE WHEN count(x) OVER w5 = 5 AND
             |    (sum(b1p) OVER w5 >= 4 OR sum(b1n) OVER w5 >= 4)
             |    THEN 1 ELSE 0 END AS r3,
             |  CASE WHEN count(x) OVER w8 = 8 AND
             |    (sum(side) OVER w8 >= 8 OR sum(side) OVER w8 <= -8)
             |    THEN 1 ELSE 0 END AS r4
             |  FROM f
             |  WINDOW w3 AS (ORDER BY day
             |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
             |    w5 AS (ORDER BY day
             |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
             |    w8 AS (ORDER BY day
             |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
             |SELECT n AS n_days,
             |  round(sx::DOUBLE / n::DOUBLE, 6) AS xbar_r,
             |  round(smr::DOUBLE / (n - 1)::DOUBLE, 6) AS mrbar_r,
             |  round(smr::DOUBLE / (n - 1)::DOUBLE / 1.128, 6)
             |    AS sigma_r,
             |  sum(b3)::BIGINT AS rule1, sum(r2)::BIGINT AS rule2,
             |  sum(r3)::BIGINT AS rule3, sum(r4)::BIGINT AS rule4
             |FROM runs GROUP BY n, sx, smr""".stripMargin),
      (s, d) => Control.imrChart(events(s, d), "ts")),

    // Taylor's variance–mean power law over (event_type, ISO week)
    // cells of daily counts: fitted exponent ≈ 1 for Poisson-like
    // arrivals, → 2 for clumped/bursty ones.
    Q("q467_taylor_law",
      Some("""WITH daily AS (
             |  SELECT event_type, ts::DATE AS day,
             |    count(*)::BIGINT AS x
             |  FROM events GROUP BY 1, 2),
             |c2 AS (SELECT count(*)::BIGINT AS cn,
             |  sum(x)::BIGINT AS cs, sum(x * x)::BIGINT AS cs2
             |  FROM daily
             |  GROUP BY event_type, date_trunc('week', day)
             |  HAVING count(*) >= 2),
             |mv AS (SELECT cs::DOUBLE / cn::DOUBLE AS m,
             |  (cn * cs2 - cs * cs)::DOUBLE
             |    / (cn * (cn - 1))::DOUBLE AS v FROM c2),
             |lx AS (SELECT ln(m) AS lx, ln(v) AS ly FROM mv
             |  WHERE m > 0 AND v > 0),
             |agg AS (SELECT count(*)::BIGINT AS n_cells,
             |  sum(round(lx, 12)::DECIMAL(28,12))::DOUBLE AS sx,
             |  sum(round(ly, 12)::DECIMAL(28,12))::DOUBLE AS sy,
             |  sum(round(lx * lx, 12)::DECIMAL(28,12))::DOUBLE AS sxx,
             |  sum(round(lx * ly, 12)::DECIMAL(28,12))::DOUBLE AS sxy,
             |  sum(round(ly * ly, 12)::DECIMAL(28,12))::DOUBLE AS syy
             |  FROM lx),
             |cen AS (SELECT n_cells, sx, sy,
             |  sxx - sx * sx / n_cells AS cxx,
             |  sxy - sx * sy / n_cells AS cxy,
             |  syy - sy * sy / n_cells AS cyy
             |  FROM agg)
             |SELECT n_cells,
             |  CASE WHEN n_cells >= 3 AND cxx > 0
             |    THEN round(cxy / cxx, 6) END AS slope_r,
             |  CASE WHEN n_cells >= 3 AND cxx > 0
             |    THEN round(sy / n_cells - cxy / cxx * sx / n_cells, 6)
             |    END AS intercept_r,
             |  CASE WHEN n_cells >= 3 AND cxx > 0 AND cyy > 0
             |    THEN round(cxy * cxy / (cxx * cyy), 6) END AS r2_r
             |FROM cen""".stripMargin),
      (s, d) => TimeSeries.taylorLaw(events(s, d), "event_type", "ts")))
}
