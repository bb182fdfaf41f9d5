package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Nonparam
import graft.util.Tables._

/** Round-9 nonparametric / distribution-free statistics batch over the
  * order-revenue and event grains ([[graft.ops.Nonparam]]): Kendall
  * τ-b + Somers' D, Mann–Whitney U + Cliff's δ, Jarque–Bera normality,
  * Durbin–Watson residual autocorrelation, the Friedman blocked rank
  * test, Goodman–Kruskal λ + Theil's U, and the Hodges–Lehmann
  * pseudo-median. Revenue enters as exact cents
  * (`round(price·100)::BIGINT`, the CausalQueries convention) so every
  * rank/concordance comparison is integer-exact cross-engine.
  */
object NonparamQueries {

  private def dailyOrdersSql: String =
    """WITH grain AS (
      |  SELECT o_orderdate::DATE AS day, count(*)::BIGINT AS x,
      |    sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS y
      |  FROM orders GROUP BY 1)""".stripMargin

  private def dailyOrders(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("x"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("y"))

  val all: Seq[Q] = Seq(

    // Kendall τ-b + Somers' D between daily order count and daily
    // revenue cents: ordinal association robust to the heavy right
    // tail that would dominate Pearson (q94) — "do busier days bring
    // more revenue, monotonically". Pairwise concordance on the
    // ~|days| grain (bounded spec-table self-join, the theilSen
    // class); tie-pair corrections exact BIGINT.
    Q("q301_kendall_tau",
      Some(s"""$dailyOrdersSql,
              |p AS (
              |  SELECT (CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x
              |      THEN -1 ELSE 0 END
              |    * CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y
              |      THEN -1 ELSE 0 END)::BIGINT AS s
              |  FROM grain a JOIN grain b ON a.day < b.day),
              |cd AS (
              |  SELECT sum(CASE WHEN s > 0 THEN 1 ELSE 0 END)::BIGINT
              |      AS concordant,
              |    sum(CASE WHEN s < 0 THEN 1 ELSE 0 END)::BIGINT
              |      AS discordant
              |  FROM p),
              |nn AS (SELECT count(*)::BIGINT AS n FROM grain),
              |tx AS (SELECT coalesce(sum(t * (t - 1) / 2), 0) AS tiex
              |  FROM (SELECT count(*)::BIGINT AS t FROM grain
              |        GROUP BY x)),
              |ty AS (SELECT coalesce(sum(t * (t - 1) / 2), 0) AS tiey
              |  FROM (SELECT count(*)::BIGINT AS t FROM grain
              |        GROUP BY y))
              |SELECT n, concordant, discordant,
              |  CASE WHEN (n * (n - 1) / 2 - tiex)
              |      * (n * (n - 1) / 2 - tiey) > 0 THEN
              |    round((concordant - discordant)::DOUBLE
              |      / sqrt((n * (n - 1) / 2 - tiex)
              |        * (n * (n - 1) / 2 - tiey)), 6) END AS tau_b_r,
              |  CASE WHEN n * (n - 1) / 2 - tiex > 0 THEN
              |    round((concordant - discordant)::DOUBLE
              |      / (n * (n - 1) / 2 - tiex), 6) END AS somers_d_r
              |FROM cd, nn, tx, ty""".stripMargin),
      (s, d) => Nonparam.kendallTau(dailyOrders(s, d), "day", "x", "y")),

    // Mann–Whitney U: do URGENT orders carry a different number of
    // line items than LOW-priority ones? Midrank ties (the value is a
    // small integer — ties are the norm), tie-corrected variance,
    // ±0.5 continuity-corrected z, Cliff's δ effect size. One corpus
    // hash-agg to per-value class counts; no corpus sort.
    Q("q302_mann_whitney",
      Some("""WITH cnt AS (
             |  SELECT l_orderkey, count(*)::BIGINT AS v FROM lineitem
             |  GROUP BY 1),
             |j AS (
             |  SELECT o_orderpriority AS g, v
             |  FROM orders JOIN cnt ON o_orderkey = l_orderkey
             |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
             |per AS (
             |  SELECT v,
             |    sum(CASE WHEN g = '1-URGENT' THEN 1 ELSE 0 END)
             |      ::BIGINT AS na,
             |    sum(CASE WHEN g = '5-LOW' THEN 1 ELSE 0 END)
             |      ::BIGINT AS nb
             |  FROM j GROUP BY 1),
             |c AS (
             |  SELECT v, na, nb,
             |    coalesce(sum(nb) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |      0)::BIGINT AS cumb
             |  FROM per),
             |a AS (
             |  SELECT sum(na)::BIGINT AS n_a, sum(nb)::BIGINT AS n_b,
             |    sum(na * (2 * cumb + nb))::BIGINT AS u2,
             |    sum((na + nb) * (na + nb) * (na + nb)
             |      - (na + nb))::BIGINT AS tieterm
             |  FROM c),
             |z AS (
             |  SELECT n_a, n_b, u2,
             |    (u2 - n_a * n_b)::DOUBLE AS diff,
             |    sqrt(n_a::DOUBLE * n_b::DOUBLE / 12.0
             |      * ((n_a::DOUBLE + n_b::DOUBLE + 1)
             |        - tieterm::DOUBLE
             |          / ((n_a::DOUBLE + n_b::DOUBLE)
             |            * (n_a::DOUBLE + n_b::DOUBLE - 1))))
             |      AS sigma
             |  FROM a)
             |SELECT n_a, n_b, u2,
             |  CASE WHEN sigma > 0 AND diff <> 0 THEN
             |      round((diff - sign(diff)) / (2.0 * sigma), 6)
             |    WHEN sigma > 0 THEN 0.0 END AS z_r,
             |  round(u2::DOUBLE / (n_a::DOUBLE * n_b::DOUBLE) - 1, 6)
             |    AS cliffs_r
             |FROM z""".stripMargin),
      (s, d) => {
        val cnt = lineitem(s, d).groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("v"))
        val j = orders(s, d)
          .join(cnt, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderpriority"), col("v"))
        Nonparam.mannWhitney(j, "v", "o_orderpriority",
          "1-URGENT", "5-LOW")
      }),

    // Jarque–Bera normality per return flag over price cents: skew,
    // excess kurtosis and JB from exact DECIMAL power sums — "how far
    // from Gaussian is the price distribution each flag sees" (q88's
    // z-score outliers assume the answer is 'not very').
    Q("q303_jarque_bera",
      Some("""WITH c AS (
             |  SELECT l_returnflag,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS c
             |  FROM lineitem),
             |a AS (
             |  SELECT l_returnflag, count(*)::BIGINT AS n,
             |    sum(c::HUGEINT) AS s1, sum(c::HUGEINT * c) AS s2,
             |    sum(c::HUGEINT * c * c) AS s3,
             |    sum(c::HUGEINT * c * c * c) AS s4
             |  FROM c GROUP BY 1),
             |r AS (
             |  SELECT l_returnflag, n, s1::DOUBLE / n::DOUBLE AS mu,
             |    s2::DOUBLE / n::DOUBLE AS r2,
             |    s3::DOUBLE / n::DOUBLE AS r3,
             |    s4::DOUBLE / n::DOUBLE AS r4
             |  FROM a),
             |m AS (
             |  SELECT l_returnflag, n, r2 - mu * mu AS m2,
             |    r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
             |    r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
             |      - 3.0 * mu * mu * mu * mu AS m4
             |  FROM r),
             |k AS (
             |  SELECT l_returnflag, n, m2,
             |    m3 / sqrt(m2 * m2 * m2) AS skew,
             |    m4 / (m2 * m2) - 3.0 AS exk
             |  FROM m)
             |SELECT l_returnflag, n,
             |  CASE WHEN m2 > 0 THEN round(skew, 6) END AS skew_r,
             |  CASE WHEN m2 > 0 THEN round(exk, 6) END AS exkurt_r,
             |  CASE WHEN m2 > 0 THEN round(n::DOUBLE / 6.0
             |    * (skew * skew + exk * exk / 4.0), 6) END AS jb_r
             |FROM k ORDER BY l_returnflag""".stripMargin),
      (s, d) => Nonparam.jarqueBera(
          lineitem(s, d).select(col("l_returnflag"),
            round(col("l_extendedprice") * 100).cast("long").as("_c")),
          "l_returnflag", "_c")
        .orderBy("l_returnflag")),

    // Durbin–Watson on the residuals of the daily-revenue straight
    // line: is the linear trend (q127's model class) leaving serially
    // correlated errors? Exact integer OLS sums; residual terms
    // 6-dp-DECIMAL-summed.
    Q("q304_durbin_watson",
      Some(s"""$dailyOrdersSql,
              |t AS (
              |  SELECT (day - (SELECT min(day) FROM grain))::BIGINT
              |    AS t, y FROM grain),
              |s AS (
              |  SELECT count(*)::BIGINT AS n, sum(t)::BIGINT AS st,
              |    sum(t::HUGEINT * t) AS stt, sum(y::HUGEINT) AS sy,
              |    sum(t::HUGEINT * y) AS sty
              |  FROM t),
              |f AS (
              |  SELECT n, st, sy,
              |    (n::DOUBLE * sty::DOUBLE - st::DOUBLE * sy::DOUBLE)
              |      / (n::DOUBLE * stt::DOUBLE - st::DOUBLE
              |        * st::DOUBLE) AS b
              |  FROM s),
              |f2 AS (
              |  SELECT n, b,
              |    (sy::DOUBLE - b * st::DOUBLE) / n::DOUBLE AS a
              |  FROM f),
              |e AS (
              |  SELECT t.t, f2.n, f2.b,
              |    t.y::DOUBLE - f2.a - f2.b * t.t::DOUBLE AS e
              |  FROM t, f2),
              |terms AS (
              |  SELECT n, b, round(e * e, 6)::DECIMAL(38,6) AS e2,
              |    round((e - lag(e) OVER (ORDER BY t))
              |      * (e - lag(e) OVER (ORDER BY t)), 6)
              |      ::DECIMAL(38,6) AS d2
              |  FROM e),
              |agg AS (
              |  SELECT n, b, sum(e2) AS den, sum(d2) AS num
              |  FROM terms GROUP BY 1, 2)
              |SELECT n AS n_days, round(b, 6) AS slope_r,
              |  CASE WHEN den > 0 THEN
              |    round(num::DOUBLE / den::DOUBLE, 6) END AS dw_r
              |FROM agg""".stripMargin),
      (s, d) => {
        val daily0 = dailyOrders(s, d)
        val d0 = daily0.agg(min(col("day")).as("_d0"))
        val daily = daily0.crossJoin(broadcast(d0))
          .select(datediff(col("day"), col("_d0")).cast("long").as("t"),
            col("y"))
        Nonparam.durbinWatson(daily, "t", "y")
      }),

    // Friedman blocked rank test: rank the 7 weekdays WITHIN each
    // complete calendar week of daily revenue — the repeated-measures
    // seasonality test (blocks absorb week-to-week level shifts that
    // q295's pooled ANOVA mixes into the error term). Monday-anchored
    // integer week index; midranks on exact cents.
    Q("q305_friedman_dow",
      Some(s"""$dailyOrdersSql,
              |cells AS (
              |  SELECT (day - DATE '1990-01-01') // 7 AS blk,
              |    dayofweek(day)::BIGINT AS dow, y
              |  FROM grain),
              |kk AS (SELECT count(DISTINCT dow)::BIGINT AS k
              |       FROM cells),
              |comp AS (SELECT blk FROM cells GROUP BY blk
              |         HAVING count(*) = (SELECT k FROM kk)),
              |ib AS (SELECT c.blk, c.dow, c.y FROM cells c
              |       JOIN comp USING (blk)),
              |r AS (
              |  SELECT dow,
              |    rank() OVER (PARTITION BY blk ORDER BY y)::DOUBLE
              |      + (count(*) OVER (PARTITION BY blk, y)::DOUBLE - 1)
              |        / 2 AS r
              |  FROM ib),
              |pt AS (
              |  SELECT dow, count(*)::BIGINT AS n_blocks,
              |    sum(r) AS rsum, sum(r * r) AS rsq
              |  FROM r GROUP BY 1),
              |tot AS (SELECT max(n_blocks)::BIGINT AS b,
              |        sum(rsq) AS a FROM pt),
              |ss AS (
              |  SELECT sum((rsum - b::DOUBLE
              |      * ((SELECT k FROM kk)::DOUBLE + 1) / 2.0)
              |    * (rsum - b::DOUBLE
              |      * ((SELECT k FROM kk)::DOUBLE + 1) / 2.0)) AS ss
              |  FROM pt, tot)
              |SELECT dow, n_blocks, round(rsum, 2) AS rank_sum_r,
              |  round(rsum / n_blocks, 6) AS mean_rank_r,
              |  CASE WHEN a - b::DOUBLE * (SELECT k FROM kk)::DOUBLE
              |      * ((SELECT k FROM kk)::DOUBLE + 1)
              |      * ((SELECT k FROM kk)::DOUBLE + 1) / 4.0 > 0 THEN
              |    round(((SELECT k FROM kk)::DOUBLE - 1) * ss
              |      / (a - b::DOUBLE * (SELECT k FROM kk)::DOUBLE
              |        * ((SELECT k FROM kk)::DOUBLE + 1)
              |        * ((SELECT k FROM kk)::DOUBLE + 1) / 4.0), 6)
              |    END AS chi2_r
              |FROM pt, tot, ss ORDER BY dow""".stripMargin),
      (s, d) => {
        val cells = dailyOrders(s, d).select(
          floor(datediff(col("day"), lit("1990-01-01").cast("date"))
            / 7).as("blk"),
          (dayofweek(col("day")) - 1).cast("long").as("dow"), col("y"))
        Nonparam.friedman(cells, "blk", "dow", "y").orderBy("dow")
      }),

    // Goodman–Kruskal λ + Theil's U between event type and weekday:
    // "does knowing the weekday help predict what users do" — λ as
    // modal-error reduction (exact integer ratio), U as entropy
    // reduction, both directions from the one 5×7 joint table.
    Q("q306_assoc_measures",
      Some("""WITH j AS (
             |  SELECT event_type AS x, dayofweek(ts::DATE)::BIGINT
             |      AS y, count(*)::BIGINT AS nxy
             |  FROM events GROUP BY 1, 2),
             |nx AS (SELECT x, sum(nxy)::BIGINT AS m FROM j GROUP BY 1),
             |ny AS (SELECT y, sum(nxy)::BIGINT AS m FROM j GROUP BY 1),
             |tot AS (SELECT sum(nxy)::BIGINT AS n FROM j),
             |smx AS (SELECT sum(mx)::BIGINT AS summaxinx
             |  FROM (SELECT x, max(nxy) AS mx FROM j GROUP BY 1)),
             |smy AS (SELECT sum(my)::BIGINT AS summaxiny
             |  FROM (SELECT y, max(nxy) AS my FROM j GROUP BY 1)),
             |mx AS (SELECT max(m)::BIGINT AS maxx FROM nx),
             |my AS (SELECT max(m)::BIGINT AS maxy FROM ny),
             |hx AS (SELECT sum(-(m::DOUBLE / (SELECT n FROM tot)
             |    ::DOUBLE) * ln(m::DOUBLE / (SELECT n FROM tot)
             |    ::DOUBLE)) AS hx FROM nx),
             |hy AS (SELECT sum(-(m::DOUBLE / (SELECT n FROM tot)
             |    ::DOUBLE) * ln(m::DOUBLE / (SELECT n FROM tot)
             |    ::DOUBLE)) AS hy FROM ny),
             |hyx AS (SELECT sum(-(j.nxy::DOUBLE / (SELECT n FROM tot)
             |    ::DOUBLE) * ln(j.nxy::DOUBLE / nx.m::DOUBLE))
             |    AS hygx FROM j JOIN nx USING (x))
             |SELECT n,
             |  CASE WHEN n - maxy > 0 THEN
             |    round((summaxinx - maxy)::DOUBLE
             |      / (n - maxy)::DOUBLE, 6) END AS lambda_yx_r,
             |  CASE WHEN n - maxx > 0 THEN
             |    round((summaxiny - maxx)::DOUBLE
             |      / (n - maxx)::DOUBLE, 6) END AS lambda_xy_r,
             |  CASE WHEN hy > 0 THEN round((hy - hygx) / hy, 6) END
             |    AS u_yx_r,
             |  CASE WHEN hx > 0 THEN round((hy - hygx) / hx, 6) END
             |    AS u_xy_r
             |FROM tot, smx, smy, mx, my, hx, hy, hyx""".stripMargin),
      (s, d) => Nonparam.assocMeasures(
        events(s, d).select(col("event_type"),
          (dayofweek(to_date(col("ts"))) - 1).cast("long").as("dow")),
        "event_type", "dow")),

    // Hodges–Lehmann pseudo-median of daily event counts per type:
    // median of all Walsh averages — the robust location estimate the
    // median underuses and the mean can't survive outliers with.
    // Pair join on the bounded daily grain; quantile_cont parity via
    // the exactQuantiles machinery.
    Q("q307_hodges_lehmann",
      Some("""WITH grain AS (
             |  SELECT event_type, ts::DATE AS day,
             |    count(*)::BIGINT AS x
             |  FROM events GROUP BY 1, 2),
             |w AS (
             |  SELECT a.event_type, (a.x + b.x)::DOUBLE / 2 AS w
             |  FROM grain a JOIN grain b
             |    ON a.event_type = b.event_type AND a.day <= b.day)
             |SELECT event_type, count(*)::BIGINT AS n_pairs,
             |  round(quantile_cont(w, 0.5), 6) AS hl_r
             |FROM w GROUP BY 1 ORDER BY event_type""".stripMargin),
      (s, d) => Nonparam.hodgesLehmann(
          events(s, d)
            .groupBy(col("event_type"), to_date(col("ts")).as("day"))
            .agg(count(lit(1)).as("x")),
          "event_type", "day", "x")
        .orderBy("event_type")),

    // Partial correlation of daily order count and revenue CONTROLLING
    // for the day index: how much of q301's association is just "both
    // grow over time"? r_xy.t = (r_xy − r_xt·r_yt)/√((1−r_xt²)(1−r_yt²))
    // from exact integer moments — one hash-agg, three Pearson rs, one
    // closed form.
    Q("q334_partial_correlation",
      Some(s"""$dailyOrdersSql,
              |g2 AS (
              |  SELECT (day - (SELECT min(day) FROM grain))::BIGINT
              |    AS t, x, y FROM grain),
              |s AS (
              |  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
              |    sum(y)::BIGINT AS sy, sum(t)::BIGINT AS st,
              |    sum(x::HUGEINT * x) AS sxx, sum(y::HUGEINT * y)
              |      AS syy,
              |    sum(t::HUGEINT * t) AS stt, sum(x::HUGEINT * y)
              |      AS sxy,
              |    sum(x::HUGEINT * t) AS sxt, sum(y::HUGEINT * t)
              |      AS syt
              |  FROM g2),
              |r AS (
              |  SELECT n,
              |    (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
              |      / (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE
              |          * sx::DOUBLE)
              |        * sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE
              |          * sy::DOUBLE)) AS rxy,
              |    (n::DOUBLE * sxt::DOUBLE - sx::DOUBLE * st::DOUBLE)
              |      / (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE
              |          * sx::DOUBLE)
              |        * sqrt(n::DOUBLE * stt::DOUBLE - st::DOUBLE
              |          * st::DOUBLE)) AS rxt,
              |    (n::DOUBLE * syt::DOUBLE - sy::DOUBLE * st::DOUBLE)
              |      / (sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE
              |          * sy::DOUBLE)
              |        * sqrt(n::DOUBLE * stt::DOUBLE - st::DOUBLE
              |          * st::DOUBLE)) AS ryt
              |  FROM s)
              |SELECT n AS n_days, round(rxy, 6) AS r_xy_r,
              |  round(rxt, 6) AS r_xt_r, round(ryt, 6) AS r_yt_r,
              |  CASE WHEN (1 - rxt * rxt) * (1 - ryt * ryt) > 0 THEN
              |    round((rxy - rxt * ryt)
              |      / sqrt((1 - rxt * rxt) * (1 - ryt * ryt)), 6) END
              |    AS partial_r
              |FROM r""".stripMargin),
      (s, d) => {
        val daily0 = dailyOrders(s, d)
        val d0 = daily0.agg(min(col("day")).as("_d0"))
        val g2 = daily0.crossJoin(broadcast(d0))
          .select(datediff(col("day"), col("_d0")).cast("long").as("t"),
            col("x"), col("y"))
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        val a = g2.agg(count(lit(1)).as("n"), sum(col("x")).as("_sx"),
          sum(col("y")).as("_sy"), sum(col("t")).as("_st"),
          sum(dec(col("x")) * col("x")).as("_sxx"),
          sum(dec(col("y")) * col("y")).as("_syy"),
          sum(dec(col("t")) * col("t")).as("_stt"),
          sum(dec(col("x")) * col("y")).as("_sxy"),
          sum(dec(col("x")) * col("t")).as("_sxt"),
          sum(dec(col("y")) * col("t")).as("_syt"))
        def dd(c: String) = col(c).cast("double")
        val nD = dd("n")
        def pearson(sab: String, a: String, b: String, saa: String,
            sbb: String) =
          (nD * dd(sab) - dd(a) * dd(b)) /
            (sqrt(nD * dd(saa) - dd(a) * dd(a)) *
              sqrt(nD * dd(sbb) - dd(b) * dd(b)))
        val rxy = pearson("_sxy", "_sx", "_sy", "_sxx", "_syy")
        val rxt = pearson("_sxt", "_sx", "_st", "_sxx", "_stt")
        val ryt = pearson("_syt", "_sy", "_st", "_syy", "_stt")
        a.select(col("n").as("n_days"), round(rxy, 6).as("r_xy_r"),
          round(rxt, 6).as("r_xt_r"), round(ryt, 6).as("r_yt_r"),
          round(when((lit(1.0) - rxt * rxt) * (lit(1.0) - ryt * ryt)
            > 0, (rxy - rxt * ryt) /
            sqrt((lit(1.0) - rxt * rxt) * (lit(1.0) - ryt * ryt))), 6)
            .as("partial_r"))
      }))
}
