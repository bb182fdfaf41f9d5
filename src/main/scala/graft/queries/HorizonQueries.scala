package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Forecast
import graft.util.Tables._

/** Round-12 forecasting batch: Brown double smoothing, Croston
  * intermittent demand, the Theta method, and the seasonal/trend
  * strength of the q327 decomposition. SES kernels use α = 0.5 —
  * deliberately: 0.5^o weights are exact binary doubles, so pow() is
  * bit-identical across engines (the ewmaDaily precedent; a 0.7 kernel
  * would ride libm-vs-JVM pow ulps). */
object HorizonQueries {

  private val Alpha = 0.5
  private val KernelW = 28
  private val Horizon = 7
  private val CrostonPart = 1L

  /** Daily revenue cents + one truncated-SES pass (the ewmaDaily
    * explode shape) producing s<sfx>(day, s) from src(day, v). */
  private def sesSql(name: String, src: String, vCol: String): String =
    s"""${name}c AS MATERIALIZED (
       |  SELECT day + o::INT AS day,
       |    round($vCol * $Alpha * pow(${1.0 - Alpha}, o), 12)
       |      ::DECIMAL(28,12) AS wv,
       |    round($Alpha * pow(${1.0 - Alpha}, o), 12)
       |      ::DECIMAL(28,12) AS w
       |  FROM $src, unnest(generate_series(0, ${KernelW - 1}))
       |    AS s(o)),
       |$name AS MATERIALIZED (
       |  SELECT c.day, sum(wv)::DOUBLE / sum(w)::DOUBLE AS s
       |  FROM ${name}c c JOIN (SELECT day FROM daily) dd USING (day)
       |  GROUP BY 1)""".stripMargin

  /** Daily revenue in 1e8-cent UNITS (the q414/q415 scaling): SES
    * kernels ride the 12-dp DECIMAL grid, which is meaningless at
    * 1e9-cent magnitudes (double ulp exceeds the grid) — measured as a
    * q426 round-6 boundary flip before the rescale. */
  private val dailySql =
    """WITH daily AS MATERIALIZED (
      |  SELECT o_orderdate::DATE AS day,
      |    round(sum(round(o_totalprice * 100))::BIGINT / 1e8, 12) AS y
      |  FROM orders GROUP BY 1)""".stripMargin

  val all: Seq[Q] = Seq(

    // Brown's double exponential smoothing of daily revenue +
    // 7-step linear forecast from the last day.
    Q("q426_brown_double",
      Some(s"""$dailySql,
              |${sesSql("s1", "daily", "y")},
              |${sesSql("s2", "(SELECT day, s AS v FROM s1)", "v")},
              |lastd AS (SELECT max(day) AS day FROM daily),
              |l AS (
              |  SELECT day, s1v, s2v, 2.0 * s1v - s2v AS a,
              |    ${Alpha / (1.0 - Alpha)} * (s1v - s2v) AS b
              |  FROM (SELECT s1.day, round(s1.s, 12) AS s1v,
              |          round(s2.s, 12) AS s2v
              |        FROM s1 JOIN s2 USING (day)
              |        JOIN lastd USING (day)) t)
              |SELECT h, day, round(s1v, 6) AS s1_r,
              |  round(s2v, 6) AS s2_r, round(a, 6) AS a_r,
              |  round(b, 6) AS b_r,
              |  round(a + h::DOUBLE * b, 6) AS forecast_r
              |FROM l, unnest(generate_series(1, $Horizon)) AS g(h)
              |ORDER BY h""".stripMargin),
      (s, d) => Forecast.brownDouble(
        orders(s, d).groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(round(sum(round(col("o_totalprice") * 100)
            .cast("long")) / 1e8, 12).as("y")),
        "day", "y", Alpha, KernelW, Horizon)),

    // Croston's intermittent-demand estimate for one slow part's
    // daily quantity — size and interval smoothed separately.
    Q("q427_croston",
      Some(s"""WITH dd AS MATERIALIZED (
              |  SELECT l_shipdate::DATE AS day, sum(l_quantity) AS y
              |  FROM lineitem WHERE l_partkey = $CrostonPart
              |  GROUP BY 1),
              |k AS MATERIALIZED (
              |  SELECT day, y, row_number() OVER (ORDER BY day) AS k,
              |    datediff('day', lag(day) OVER (ORDER BY day), day)
              |      ::DOUBLE AS gap
              |  FROM dd WHERE y > 0),
              |c AS (SELECT count(*)::BIGINT AS n_demands,
              |      max(k)::BIGINT AS kmax FROM k),
              |zz AS (
              |  SELECT sum(round(v * w, 12)::DECIMAL(28,12))::DOUBLE
              |    / sum(round(w, 12)::DECIMAL(28,12))::DOUBLE AS z
              |  FROM (SELECT y::DOUBLE AS v,
              |          $Alpha * pow(${1.0 - Alpha},
              |            (kmax - k)::DOUBLE) AS w
              |        FROM k, c WHERE k > kmax - $KernelW) t),
              |pp AS (
              |  SELECT sum(round(v * w, 12)::DECIMAL(28,12))::DOUBLE
              |    / sum(round(w, 12)::DECIMAL(28,12))::DOUBLE AS p
              |  FROM (SELECT gap AS v,
              |          $Alpha * pow(${1.0 - Alpha},
              |            (kmax - k)::DOUBLE) AS w
              |        FROM k, c
              |        WHERE k > kmax - $KernelW AND gap IS NOT NULL) t)
              |SELECT n_demands, round(z, 6) AS z_r, round(p, 6) AS p_r,
              |  round(z / p, 6) AS rate_r
              |FROM c, zz, pp""".stripMargin),
      (s, d) => Forecast.croston(
        lineitem(s, d).where(col("l_partkey") === CrostonPart)
          .groupBy(to_date(col("l_shipdate")).as("day"))
          .agg(sum(col("l_quantity")).as("y")),
        "day", "y", Alpha, KernelW)),

    // Theta method (SES + half the OLS drift) on daily revenue —
    // the M3 baseline next to q247's seasonal-naive backtest.
    Q("q428_theta_forecast",
      Some(s"""$dailySql,
              |mn AS (SELECT min(day) AS d0 FROM daily),
              |g AS MATERIALIZED (
              |  SELECT day, datediff('day', d0, day)::DOUBLE AS x,
              |    y::DOUBLE AS yv
              |  FROM daily, mn),
              |ols AS (
              |  SELECT round((n * sxy - sx * sy)
              |    / (n * sxx - sx * sx), 12) AS b
              |  FROM (
              |    SELECT count(*)::DOUBLE AS n,
              |      sum(round(x, 12)::DECIMAL(28,12))::DOUBLE AS sx,
              |      sum(round(yv, 12)::DECIMAL(28,12))::DOUBLE AS sy,
              |      sum(round(x * x, 12)::DECIMAL(28,12))::DOUBLE
              |        AS sxx,
              |      sum(round(x * yv, 12)::DECIMAL(28,12))::DOUBLE
              |        AS sxy
              |    FROM g) t),
              |${sesSql("s1", "(SELECT day, yv AS v FROM g)", "v")},
              |lastd AS (SELECT max(day) AS day FROM daily),
              |l AS (SELECT s1.day, round(s1.s, 12) AS s
              |      FROM s1 JOIN lastd USING (day))
              |SELECT h, day, round(l.s, 6) AS ses_r,
              |  round(ols.b, 6) AS slope_r,
              |  round(l.s + h::DOUBLE * ols.b / 2.0, 6) AS forecast_r
              |FROM l, ols, unnest(generate_series(1, $Horizon)) AS gh(h)
              |ORDER BY h""".stripMargin),
      (s, d) => Forecast.thetaForecast(
        orders(s, d).groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(round(sum(round(col("o_totalprice") * 100)
            .cast("long")) / 1e8, 12).as("y")),
        "day", "y", Alpha, KernelW, Horizon)),

    // Seasonal / trend strength of the q327 decomposition — the one-
    // row "is there a weekly cycle worth modeling" readout.
    Q("q429_seasonal_strength",
      Some(s"""WITH daily AS MATERIALIZED (
              |  SELECT o_orderdate::DATE AS day,
              |    sum(round(o_totalprice * 100))::BIGINT AS y
              |  FROM orders GROUP BY 1),
              |bounds AS (SELECT min(day) AS d0, max(day) AS d1
              |           FROM daily),
              |spine AS (
              |  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))
              |    ::DATE AS day FROM bounds),
              |f AS (
              |  SELECT s.day, coalesce(g.y, 0)::BIGINT AS y
              |  FROM spine s LEFT JOIN daily g USING (day)),
              |ma AS (
              |  SELECT day, y, sum(y) OVER w AS s7, count(*) OVER w
              |    AS c7
              |  FROM f WINDOW w AS (ORDER BY day
              |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
              |det AS MATERIALIZED (
              |  SELECT day, s7::DOUBLE / 7 / 1e8 AS t,
              |    (y::DOUBLE - s7::DOUBLE / 7) / 1e8 AS det
              |  FROM ma WHERE c7 = 7),
              |seas AS (
              |  SELECT dayofweek(day)::BIGINT AS dow,
              |    sum(round(det, 12)::DECIMAL(28,12))::DOUBLE
              |      / count(*) AS sraw
              |  FROM det GROUP BY 1),
              |m AS (SELECT sum(round(sraw, 12)::DECIMAL(28,12))::DOUBLE
              |      / count(*) AS sm FROM seas),
              |parts AS MATERIALIZED (
              |  SELECT det.det, det.t, sn.s, det.det - sn.s AS r
              |  FROM det
              |  JOIN (SELECT dow, sraw - sm AS s FROM seas, m) sn
              |    ON dayofweek(det.day)::BIGINT = sn.dow),
              |agg AS (
              |  SELECT count(*)::DOUBLE AS n,
              |    sum(round(det, 12)::DECIMAL(28,12))::DOUBLE AS sd,
              |    sum(round(det * det, 12)::DECIMAL(28,12))::DOUBLE
              |      AS sdd,
              |    sum(round(r, 12)::DECIMAL(28,12))::DOUBLE AS sr,
              |    sum(round(r * r, 12)::DECIMAL(28,12))::DOUBLE AS srr,
              |    sum(round(t + r, 12)::DECIMAL(28,12))::DOUBLE AS str,
              |    sum(round((t + r) * (t + r), 12)::DECIMAL(28,12))
              |      ::DOUBLE AS strr
              |  FROM parts)
              |SELECT n::BIGINT AS n_days,
              |  round(sdd / n - (sd / n) * (sd / n), 6)
              |    AS var_detrended_r,
              |  round(srr / n - (sr / n) * (sr / n), 6)
              |    AS var_remainder_r,
              |  round(greatest(0.0, 1.0 - (srr / n - (sr / n) * (sr / n))
              |    / nullif(sdd / n - (sd / n) * (sd / n), 0.0)), 6)
              |    AS f_seasonal_r,
              |  round(greatest(0.0, 1.0 - (srr / n - (sr / n) * (sr / n))
              |    / nullif(strr / n - (str / n) * (str / n), 0.0)), 6)
              |    AS f_trend_r
              |FROM agg""".stripMargin),
      (s, d) => Forecast.seasonalStrength(
        orders(s, d).groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long"))
            .as("y")),
        "day", "y", scale = 1e8))
  )
}
