package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Behavior, Diagnostics, Fit, Infer, Ranks}
import graft.util.Tables._

/** Round-10 diagnostics batch: regression residual tests
  * ([[graft.ops.Diagnostics]] — Breusch–Pagan, Chow, Granger),
  * distribution fits ([[graft.ops.Fit]] — Weibull median-rank,
  * power-law α, GPD peaks-over-threshold), resampling-free inference
  * ([[graft.ops.Infer.jackknifeRatio]]), and operational audits
  * ([[graft.ops.Behavior]] — Little's law, eventual-follow;
  * order-total consistency). Revenue enters as exact cents; every
  * residual/ln product is rounded to its grid before an
  * order-independent DECIMAL sum (the q304 conventions).
  */
object DiagQueries {

  /** Day-index grain of orders: t (days since first order day), daily
    * order count x and exact revenue cents y — the q304 spine with the
    * count column added. */
  private[queries] val GrainSql =
    """WITH grain AS (
      |  SELECT o_orderdate::DATE AS day, count(*)::BIGINT AS x,
      |    sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS y
      |  FROM orders GROUP BY 1),
      |t AS (
      |  SELECT (day - (SELECT min(day) FROM grain))::BIGINT AS t,
      |    day, x, y FROM grain)""".stripMargin

  private[queries] def grain(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val daily = orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("x"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
    val d0 = daily.agg(min(col("day")).as("_d0"))
    daily.crossJoin(broadcast(d0))
      .select(datediff(col("day"), col("_d0")).cast("long").as("t"),
        col("day"), col("x"), col("y"))
  }

  /** The simple-OLS (a, b) CTE chain shared by the q339/q340 oracles
    * — mirrors Diagnostics.fitAb's parenthesization on a moment table
    * `m(n, st, stt, sy, sty)` (extra key columns pass through). */
  private def fitSql(keys: String) = {
    val k = if (keys.isEmpty) "" else s"$keys, "
    s"""f AS (
       |  SELECT ${k}n, st, stt, sy,
       |    (n::DOUBLE * sty::DOUBLE - st::DOUBLE * sy::DOUBLE)
       |      / nullif(n::DOUBLE * stt::DOUBLE
       |        - st::DOUBLE * st::DOUBLE, 0) AS b
       |  FROM m),
       |f2 AS (
       |  SELECT ${k}n, st, stt, b,
       |    (sy::DOUBLE - b * st::DOUBLE) / n::DOUBLE AS a
       |  FROM f)""".stripMargin
  }

  private val ChowBreakT = 1200L
  private val PowerlawXmin = 60L

  val all: Seq[Q] = Seq(

    // Breusch–Pagan/Koenker heteroscedasticity: does the VARIANCE of
    // daily revenue trend with time (q304 tested the residual
    // autocorrelation; this tests their spread) — LM = n·R² of the
    // squared-dollar-residual regression.
    Q("q339_breusch_pagan",
      Some(s"""$GrainSql,
              |m AS (
              |  SELECT count(*)::BIGINT AS n, sum(t)::BIGINT AS st,
              |    sum(t::HUGEINT * t) AS stt, sum(y::HUGEINT) AS sy,
              |    sum(t::HUGEINT * y) AS sty
              |  FROM t),
              |${fitSql("")},
              |e AS (
              |  SELECT t.t, f2.n, f2.st, f2.stt, f2.b,
              |    (t.y::DOUBLE - f2.a - f2.b * t.t::DOUBLE) / 100.0
              |      AS e
              |  FROM t, f2),
              |terms AS (
              |  SELECT n, st, stt, b,
              |    round(e * e, 6)::DECIMAL(38,6) AS g,
              |    round(t::DOUBLE * (e * e), 6)::DECIMAL(38,6) AS tg,
              |    round((e * e) * (e * e), 0)::DECIMAL(38,0) AS gg
              |  FROM e),
              |agg AS (
              |  SELECT n, st, stt, b, sum(g) AS sg, sum(tg) AS stg,
              |    sum(gg) AS sgg
              |  FROM terms GROUP BY 1, 2, 3, 4),
              |r AS (
              |  SELECT n, b,
              |    n::DOUBLE * stg::DOUBLE - st::DOUBLE * sg::DOUBLE
              |      AS num,
              |    n::DOUBLE * stt::DOUBLE - st::DOUBLE * st::DOUBLE
              |      AS dent,
              |    n::DOUBLE * sgg::DOUBLE - sg::DOUBLE * sg::DOUBLE
              |      AS deng
              |  FROM agg)
              |SELECT n AS n_days, round(b, 6) AS slope_r,
              |  CASE WHEN deng > 0 THEN round(n::DOUBLE
              |    * (num * num / nullif(dent * deng, 0)), 6) END
              |    AS bp_lm_r,
              |  CASE WHEN deng > 0 THEN
              |    round(num * num / nullif(dent * deng, 0), 6) END
              |    AS r2_aux_r
              |FROM r""".stripMargin),
      (s, d) => Diagnostics.breuschPagan(grain(s, d), "t", "y")),

    // Chow structural-break F at the fixed midpoint day 1200: did the
    // revenue trend CHANGE regime — pooled vs per-segment OLS.
    Q("q340_chow_break",
      Some(s"""$GrainSql,
              |sg AS (
              |  SELECT CASE WHEN t >= $ChowBreakT THEN 1 ELSE 0 END
              |    AS seg, t, y FROM t),
              |m AS (
              |  SELECT seg, count(*)::BIGINT AS n,
              |    sum(t)::BIGINT AS st, sum(t::HUGEINT * t) AS stt,
              |    sum(y::HUGEINT) AS sy, sum(t::HUGEINT * y) AS sty
              |  FROM sg GROUP BY 1),
              |fs AS (
              |  SELECT seg, n,
              |    (n::DOUBLE * sty::DOUBLE - st::DOUBLE * sy::DOUBLE)
              |      / nullif(n::DOUBLE * stt::DOUBLE
              |        - st::DOUBLE * st::DOUBLE, 0) AS b,
              |    st, sy FROM m),
              |fs2 AS (
              |  SELECT seg, n, b,
              |    (sy::DOUBLE - b * st::DOUBLE) / n::DOUBLE AS a
              |  FROM fs),
              |pm AS (
              |  SELECT sum(n)::BIGINT AS n, sum(st)::BIGINT AS st,
              |    sum(stt) AS stt, sum(sy) AS sy, sum(sty) AS sty
              |  FROM m),
              |pf AS (
              |  SELECT n,
              |    (n::DOUBLE * sty::DOUBLE - st::DOUBLE * sy::DOUBLE)
              |      / nullif(n::DOUBLE * stt::DOUBLE
              |        - st::DOUBLE * st::DOUBLE, 0) AS bp,
              |    st, sy FROM pm),
              |pf2 AS (
              |  SELECT bp, (sy::DOUBLE - bp * st::DOUBLE) / n::DOUBLE
              |    AS ap FROM pf),
              |terms AS (
              |  SELECT sg.seg,
              |    round(((sg.y::DOUBLE - fs2.a - fs2.b
              |      * sg.t::DOUBLE) / 100.0) * ((sg.y::DOUBLE - fs2.a
              |      - fs2.b * sg.t::DOUBLE) / 100.0), 6)
              |      ::DECIMAL(38,6) AS s2,
              |    round(((sg.y::DOUBLE - pf2.ap - pf2.bp
              |      * sg.t::DOUBLE) / 100.0) * ((sg.y::DOUBLE - pf2.ap
              |      - pf2.bp * sg.t::DOUBLE) / 100.0), 6)
              |      ::DECIMAL(38,6) AS p2
              |  FROM sg JOIN fs2 ON fs2.seg = sg.seg, pf2),
              |byseg AS (
              |  SELECT seg, count(*)::BIGINT AS n, sum(s2) AS ssr,
              |    sum(p2) AS ssrp
              |  FROM terms GROUP BY 1),
              |roll AS (
              |  SELECT sum(ssr) AS ssr12, sum(ssrp) AS ssrp,
              |    sum(n)::BIGINT AS n,
              |    sum(CASE WHEN seg = 0 THEN n ELSE 0 END)::BIGINT
              |      AS n1,
              |    sum(CASE WHEN seg = 1 THEN n ELSE 0 END)::BIGINT
              |      AS n2
              |  FROM byseg)
              |SELECT n1, n2,
              |  (SELECT round(b, 6) FROM fs2 WHERE seg = 0) AS b1_r,
              |  (SELECT round(b, 6) FROM fs2 WHERE seg = 1) AS b2_r,
              |  CASE WHEN n1 > 2 AND n2 > 2 AND ssr12 > 0 THEN
              |    round(((ssrp::DOUBLE - ssr12::DOUBLE) / 2.0)
              |      / nullif(ssr12::DOUBLE / (n::DOUBLE - 4), 0), 6)
              |    END AS f_r
              |FROM roll""".stripMargin),
      (s, d) => Diagnostics.chowTest(grain(s, d), "t", "y",
        ChowBreakT)),

    // Granger 1-lag: does yesterday's ORDER COUNT predict today's
    // revenue beyond revenue's own lag — the F of the nested OLS pair.
    Q("q341_granger",
      Some(s"""$GrainSql,
              |lagged AS (
              |  SELECT t, y, x,
              |    lag(y) OVER (ORDER BY t) AS ylag,
              |    lag(x) OVER (ORDER BY t) AS xlag,
              |    lag(t) OVER (ORDER BY t) AS tlag
              |  FROM t
              |  QUALIFY ylag IS NOT NULL AND t = tlag + 1),
              |m AS (
              |  SELECT count(*)::BIGINT AS n,
              |    sum(ylag::HUGEINT) AS s1, sum(xlag::HUGEINT) AS s2,
              |    sum(y::HUGEINT) AS sy,
              |    sum(ylag::HUGEINT * ylag) AS s11,
              |    sum(xlag::HUGEINT * xlag) AS s22,
              |    sum(ylag::HUGEINT * xlag) AS s12,
              |    sum(ylag::HUGEINT * y) AS s1y,
              |    sum(xlag::HUGEINT * y) AS s2y
              |  FROM lagged),
              |c AS (
              |  SELECT n,
              |    (n::DOUBLE * s1y::DOUBLE - s1::DOUBLE * sy::DOUBLE)
              |      / nullif(n::DOUBLE * s11::DOUBLE
              |        - s1::DOUBLE * s1::DOUBLE, 0) AS br,
              |    n::DOUBLE * (s11::DOUBLE * s22::DOUBLE
              |        - s12::DOUBLE * s12::DOUBLE)
              |      - s1::DOUBLE * (s1::DOUBLE * s22::DOUBLE
              |        - s12::DOUBLE * s2::DOUBLE)
              |      + s2::DOUBLE * (s1::DOUBLE * s12::DOUBLE
              |        - s11::DOUBLE * s2::DOUBLE) AS det0,
              |    s1::DOUBLE AS s1d, s2::DOUBLE AS s2d,
              |    sy::DOUBLE AS syd, s11::DOUBLE AS s11d,
              |    s22::DOUBLE AS s22d, s12::DOUBLE AS s12d,
              |    s1y::DOUBLE AS s1yd, s2y::DOUBLE AS s2yd
              |  FROM m),
              |c2 AS (
              |  SELECT n, br, (syd - br * s1d) / n::DOUBLE AS ar,
              |    (syd * (s11d * s22d - s12d * s12d)
              |      - s1d * (s1yd * s22d - s12d * s2yd)
              |      + s2d * (s1yd * s12d - s11d * s2yd))
              |      / nullif(det0, 0) AS b0,
              |    (n::DOUBLE * (s1yd * s22d - s12d * s2yd)
              |      - syd * (s1d * s22d - s12d * s2d)
              |      + s2d * (s1d * s2yd - s1yd * s2d))
              |      / nullif(det0, 0) AS b1,
              |    (n::DOUBLE * (s11d * s2yd - s1yd * s12d)
              |      - s1d * (s1d * s2yd - s1yd * s2d)
              |      + syd * (s1d * s12d - s11d * s2d))
              |      / nullif(det0, 0) AS b2
              |  FROM c),
              |terms AS (
              |  SELECT c2.n, c2.b1, c2.b2,
              |    round(((l.y::DOUBLE - c2.ar - c2.br
              |      * l.ylag::DOUBLE) / 100.0) * ((l.y::DOUBLE - c2.ar
              |      - c2.br * l.ylag::DOUBLE) / 100.0), 6)
              |      ::DECIMAL(38,6) AS r2t,
              |    round(((l.y::DOUBLE - c2.b0 - c2.b1
              |        * l.ylag::DOUBLE - c2.b2 * l.xlag::DOUBLE)
              |      / 100.0) * ((l.y::DOUBLE - c2.b0 - c2.b1
              |        * l.ylag::DOUBLE - c2.b2 * l.xlag::DOUBLE)
              |      / 100.0), 6)::DECIMAL(38,6) AS u2t
              |  FROM lagged l, c2),
              |agg AS (
              |  SELECT n, b1, b2, sum(r2t) AS ssrr, sum(u2t) AS ssru
              |  FROM terms GROUP BY 1, 2, 3)
              |SELECT n AS n_pairs, round(b1, 6) AS b_ylag_r,
              |  round(b2, 6) AS b_xlag_r,
              |  CASE WHEN ssru > 0 AND n > 3 THEN
              |    round((ssrr::DOUBLE - ssru::DOUBLE)
              |      / nullif(ssru::DOUBLE / (n::DOUBLE - 3), 0), 6)
              |    END AS f_r
              |FROM agg""".stripMargin),
      (s, d) => Diagnostics.granger(grain(s, d), "t", "y", "x")),

    // Weibull median-rank fit of the signup→purchase durations: shape
    // k < 1 means the conversion hazard DECREASES with wait (convert
    // fast or never) — the parametric readout on q316's hazard curve.
    Q("q342_weibull_fit",
      Some(s"""${SurvivalQueries.SubjSql},
              |obs AS (
              |  SELECT t, count(*)::BIGINT AS m FROM subj
              |  WHERE observed AND t >= 1 GROUP BY 1),
              |tot AS (SELECT sum(m)::BIGINT AS n FROM obs),
              |ranked AS (
              |  SELECT t, m, sum(m) OVER (ORDER BY t ROWS BETWEEN
              |    UNBOUNDED PRECEDING AND CURRENT ROW) - m AS o
              |  FROM obs),
              |rws AS (
              |  SELECT r.t, r.o + g.i AS i, tot.n
              |  FROM ranked r, tot,
              |    unnest(generate_series(1, r.m::INTEGER)) AS g(i)),
              |terms AS (
              |  SELECT n, ln(t::DOUBLE) AS x,
              |    ln(-ln(1 - (i::DOUBLE - 0.3) / (n::DOUBLE + 0.4)))
              |      AS z
              |  FROM rws),
              |s AS (
              |  SELECT n, count(*)::BIGINT AS cnt,
              |    sum(round(x, 12)::DECIMAL(28,12))::DOUBLE AS sx,
              |    sum(round(z, 12)::DECIMAL(28,12))::DOUBLE AS sz,
              |    sum(round(x * x, 12)::DECIMAL(28,12))::DOUBLE
              |      AS sxx,
              |    sum(round(x * z, 12)::DECIMAL(28,12))::DOUBLE
              |      AS sxz,
              |    sum(round(z * z, 12)::DECIMAL(28,12))::DOUBLE
              |      AS szz
              |  FROM terms GROUP BY 1),
              |r AS (
              |  SELECT n, n::DOUBLE * sxx - sx * sx AS cxx,
              |    n::DOUBLE * sxz - sx * sz AS cxz,
              |    n::DOUBLE * szz - sz * sz AS czz, sx, sz
              |  FROM s),
              |r2 AS (
              |  SELECT n, cxx, cxz, czz,
              |    cxz / nullif(cxx, 0) AS k, sx, sz FROM r),
              |r3 AS (
              |  SELECT n, cxx, cxz, czz, k,
              |    (sz - k * sx) / n::DOUBLE AS a FROM r2)
              |SELECT n,
              |  CASE WHEN n >= 2 AND cxx > 0 THEN round(k, 6) END
              |    AS shape_r,
              |  CASE WHEN n >= 2 AND cxx > 0 THEN
              |    round(exp(-a / k), 6) END AS scale_days_r,
              |  CASE WHEN n >= 2 AND cxx > 0 AND czz > 0 THEN
              |    round(cxz * cxz / (cxx * czz), 6) END AS r2_r
              |FROM r3""".stripMargin),
      (s, d) => Fit.weibullMedianRank(SurvivalQueries.subj(s, d), "t",
        "observed")),

    // Delete-one-week jackknife of mean order value: the closed-form,
    // RNG-free SE the q183 bootstrap approximates by resampling.
    Q("q343_jackknife_aov",
      Some("""WITH blocks AS (
             |  SELECT date_trunc('week', o_orderdate)::DATE AS wk,
             |    sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |      ::BIGINT AS y,
             |    count(*)::BIGINT AS n
             |  FROM orders GROUP BY 1),
             |tot AS (
             |  SELECT sum(y)::BIGINT AS sy, sum(n)::BIGINT AS sn,
             |    count(*)::BIGINT AS b
             |  FROM blocks),
             |mean AS (
             |  SELECT sum(round((tot.sy - y)::DOUBLE
             |      / (tot.sn - n)::DOUBLE, 12)::DECIMAL(28,12))
             |      ::DOUBLE / first(tot.b)::DOUBLE AS thbar
             |  FROM blocks, tot),
             |dev AS (
             |  SELECT sum(round(((tot.sy - y)::DOUBLE
             |        / (tot.sn - n)::DOUBLE - mean.thbar)
             |      * ((tot.sy - y)::DOUBLE / (tot.sn - n)::DOUBLE
             |        - mean.thbar), 12)::DECIMAL(28,12))::DOUBLE AS ss
             |  FROM blocks, tot, mean)
             |SELECT tot.b AS n_blocks,
             |  round(tot.sy::DOUBLE / tot.sn::DOUBLE, 6) AS theta_r,
             |  CASE WHEN tot.b >= 2 THEN
             |    round(tot.b::DOUBLE * (tot.sy::DOUBLE
             |      / tot.sn::DOUBLE) - (tot.b::DOUBLE - 1)
             |      * mean.thbar, 6) END AS theta_jack_r,
             |  CASE WHEN tot.b >= 2 THEN
             |    round(sqrt((tot.b::DOUBLE - 1) / tot.b::DOUBLE
             |      * dev.ss), 6) END AS se_jack_r
             |FROM tot, mean, dev""".stripMargin),
      (s, d) => Infer.jackknifeRatio(
        orders(s, d).select(
          date_trunc("week", col("o_orderdate")).cast("date").as("wk"),
          round(col("o_totalprice") * 100).cast("long").as("y"),
          lit(1L).as("one")),
        "wk", "y", "one")),

    // Monthly Little's-law audit of the order pipeline (arrival =
    // order date, completion = last item ship date): L vs λW per
    // month — ratio drift from 1 is cross-month backlog.
    Q("q344_littles_law",
      Some("""WITH iv AS (
             |  SELECT o.o_orderdate::DATE AS s,
             |    max(l.l_shipdate)::DATE AS e
             |  FROM orders o JOIN lineitem l
             |    ON l.l_orderkey = o.o_orderkey
             |  GROUP BY o.o_orderkey, o.o_orderdate),
             |bym AS (
             |  SELECT s, e, unnest(generate_series(
             |      date_trunc('month', s), date_trunc('month', e),
             |      INTERVAL 1 MONTH))::DATE AS m0
             |  FROM iv WHERE e >= s),
             |ov AS (
             |  SELECT m0, last_day(m0) AS m1,
             |    (datediff('day', greatest(s, m0),
             |      least(e, last_day(m0))) + 1)::BIGINT AS ovd
             |  FROM bym),
             |l AS (
             |  SELECT m0 AS month, sum(ovd)::BIGINT AS ovdays,
             |    (datediff('day', min(m0), max(m1)) + 1)::BIGINT
             |      AS mdays
             |  FROM ov GROUP BY 1),
             |arr AS (
             |  SELECT date_trunc('month', s)::DATE AS month,
             |    count(*)::BIGINT AS n_arrivals,
             |    sum(datediff('day', s, e) + 1)::BIGINT AS durdays
             |  FROM iv WHERE e >= s GROUP BY 1)
             |SELECT l.month, coalesce(arr.n_arrivals, 0)::BIGINT
             |    AS n_arrivals,
             |  round(ovdays::DOUBLE / mdays::DOUBLE, 6) AS l_avg_r,
             |  CASE WHEN arr.n_arrivals > 0 THEN
             |    round(arr.n_arrivals::DOUBLE / mdays::DOUBLE, 6) END
             |    AS lambda_r,
             |  CASE WHEN arr.n_arrivals > 0 THEN
             |    round(arr.durdays::DOUBLE
             |      / arr.n_arrivals::DOUBLE, 6) END AS w_days_r,
             |  CASE WHEN arr.n_arrivals > 0 THEN
             |    round((ovdays::DOUBLE / mdays::DOUBLE)
             |      / ((arr.n_arrivals::DOUBLE / mdays::DOUBLE)
             |        * (arr.durdays::DOUBLE
             |          / arr.n_arrivals::DOUBLE)), 6) END
             |    AS littles_ratio_r
             |FROM l LEFT JOIN arr USING (month)
             |ORDER BY month""".stripMargin),
      (s, d) => {
        val iv = orders(s, d).join(lineitem(s, d),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"))
          .agg(max(col("l_shipdate")).as("e"))
          .select(col("o_orderdate").as("s"), col("e"))
        Behavior.littlesLawMonthly(iv, "s", "e").orderBy("month")
      }),

    // Order-total consistency audit: o_totalprice vs the per-item
    // recomputation Σ round(extprice·(1−disc)·(1+tax)·100) — the DQ
    // rule every warehouse runs on a star schema it didn't produce.
    // Per-ITEM cents rounding makes the sum order-independent.
    Q("q345_order_consistency",
      Some("""WITH items AS (
             |  SELECT l_orderkey, CAST(round(l_extendedprice
             |      * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)
             |    AS c
             |  FROM lineitem),
             |po AS (
             |  SELECT l_orderkey, sum(c)::BIGINT AS recomputed
             |  FROM items GROUP BY 1),
             |j AS (
             |  SELECT CAST(round(o_totalprice * 100) AS BIGINT)
             |      AS stated, recomputed
             |  FROM orders JOIN po ON l_orderkey = o_orderkey),
             |d AS (SELECT abs(stated - recomputed)::BIGINT AS ad
             |      FROM j)
             |SELECT count(*)::BIGINT AS n_orders,
             |  sum(CASE WHEN ad = 0 THEN 1 ELSE 0 END)::BIGINT
             |    AS n_exact,
             |  sum(CASE WHEN ad <= 100 THEN 1 ELSE 0 END)::BIGINT
             |    AS n_within_dollar,
             |  max(ad)::BIGINT AS max_absdiff_cents,
             |  round(sum(CASE WHEN ad = 0 THEN 1 ELSE 0 END)::DOUBLE
             |    / count(*)::DOUBLE, 6) AS exact_r
             |FROM d""".stripMargin),
      (s, d) => {
        val items = lineitem(s, d).select(col("l_orderkey"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax")) * 100).cast("long").as("c"))
        val po = items.groupBy(col("l_orderkey"))
          .agg(sum(col("c")).as("recomputed"))
        val j = orders(s, d).join(po,
            col("l_orderkey") === col("o_orderkey"))
          .select(abs(round(col("o_totalprice") * 100).cast("long")
            - col("recomputed")).as("ad"))
        j.agg(count(lit(1)).as("n_orders"),
          sum(when(col("ad") === 0, 1L).otherwise(0L)).as("n_exact"),
          sum(when(col("ad") <= 100, 1L).otherwise(0L))
            .as("n_within_dollar"),
          max(col("ad")).as("max_absdiff_cents"),
          round(sum(when(col("ad") === 0, 1L).otherwise(0L))
            .cast("double") / count(lit(1)).cast("double"), 6)
            .as("exact_r"))
      }),

    // Eventual-follow matrix over event types: "does a view EVER lead
    // to a purchase for this user", however many steps intervene —
    // the transitive complement of q90's adjacent-step transitions.
    Q("q346_eventual_follow",
      Some("""WITH g AS (
             |  SELECT user_id, event_type, min(ts) AS f, max(ts) AS l
             |  FROM events GROUP BY 1, 2)
             |SELECT a.event_type AS type_a, b.event_type AS type_b,
             |  count(*)::BIGINT AS n_both,
             |  sum(CASE WHEN a.f < b.l THEN 1 ELSE 0 END)::BIGINT
             |    AS n_follow,
             |  round(sum(CASE WHEN a.f < b.l THEN 1 ELSE 0 END)
             |    ::DOUBLE / count(*)::DOUBLE, 6) AS follow_r
             |FROM g a JOIN g b ON a.user_id = b.user_id
             |  AND a.event_type <> b.event_type
             |GROUP BY 1, 2 ORDER BY type_a, type_b""".stripMargin),
      (s, d) => Behavior.eventualFollow(events(s, d), "user_id",
        "event_type", "ts").orderBy("type_a", "type_b")),

    // Power-law tail exponent of per-user event counts (CSN
    // continuous-MLE approximation at xmin = 60): how heavy is the
    // activity tail the q162 key-skew profile measures descriptively.
    Q("q347_powerlaw_alpha",
      Some(s"""WITH c AS (
              |  SELECT count(*)::BIGINT AS x FROM events
              |  GROUP BY user_id),
              |tail AS (SELECT x FROM c WHERE x >= $PowerlawXmin),
              |s AS (
              |  SELECT count(*)::BIGINT AS n,
              |    sum(round(ln(x::DOUBLE / ${PowerlawXmin - 0.5}),
              |      12)::DECIMAL(28,12))::DOUBLE AS sl
              |  FROM tail)
              |SELECT n AS n_tail,
              |  CASE WHEN n >= 2 THEN
              |    round(1.0 + n::DOUBLE / nullif(sl, 0), 6) END
              |    AS alpha_r,
              |  CASE WHEN n >= 2 THEN
              |    round((1.0 + n::DOUBLE / nullif(sl, 0) - 1)
              |      / sqrt(n::DOUBLE), 6) END AS se_r
              |FROM s""".stripMargin),
      (s, d) => Fit.powerlawAlpha(
        events(s, d).groupBy(col("user_id"))
          .agg(count(lit(1)).as("x")),
        "x", PowerlawXmin)),

    // GPD peaks-over-threshold on daily revenue above its own exact
    // P75: the tail-shape ξ the q336 block-maxima Gumbel assumes away
    // (ξ > 0 would mean revenue spikes are genuinely heavy-tailed).
    Q("q348_gpd_pot",
      Some(s"""$GrainSql,
              |u AS (
              |  SELECT floor(quantile_cont(y, 0.75))::BIGINT
              |    AS u_cents FROM t),
              |z AS (
              |  SELECT u.u_cents, (y - u.u_cents)::BIGINT AS z
              |  FROM t, u WHERE y > u.u_cents),
              |s AS (
              |  SELECT u_cents, count(*)::BIGINT AS n,
              |    sum(z::HUGEINT) AS sz, sum(z::HUGEINT * z) AS szz
              |  FROM z GROUP BY 1),
              |r AS (
              |  SELECT u_cents, n, sz::DOUBLE / n::DOUBLE AS m,
              |    (szz::DOUBLE - sz::DOUBLE * sz::DOUBLE
              |      / n::DOUBLE) / (n::DOUBLE - 1) AS s2
              |  FROM s)
              |SELECT u_cents, n AS n_exceed,
              |  CASE WHEN n >= 3 AND s2 > 0 THEN round(m, 6) END
              |    AS mean_r,
              |  CASE WHEN n >= 3 AND s2 > 0 THEN
              |    round((1.0 - m * m / nullif(s2, 0)) / 2, 6) END
              |    AS xi_r,
              |  CASE WHEN n >= 3 AND s2 > 0 THEN
              |    round(m * (1.0 + m * m / nullif(s2, 0)) / 2, 6) END
              |    AS beta_r
              |FROM r""".stripMargin),
      (s, d) => {
        val g = grain(s, d)
        val u = Ranks.exactQuantiles(g.withColumn("_g", lit(0)),
            "_g", "y", "day", bandWidth = 1.0e7, nums = Seq(3),
            den = 4)
          .select(floor(col("q_val")).cast("long").as("u_cents"))
        Fit.gpdExceedances(g, "y", u)
      }),

    // Heaps'-law vocabulary-growth fit: V = K·N^β over the doc stream
    // — β near 1 = the corpus keeps minting types (ids/hashes), near
    // 0 = it repeats itself; the growth-curve view of q329's OOV.
    Q("q349_heaps_law",
      Some(s"""WITH toks AS (
              |  SELECT doc_id, string_split(${TextQueries.normSql},
              |    ' ') AS t
              |  FROM documents),
              |perdoc AS (
              |  SELECT doc_id, len(t)::BIGINT AS ntok FROM toks),
              |fd AS (
              |  SELECT w, min(doc_id) AS doc_id FROM (
              |    SELECT DISTINCT doc_id, t.w FROM (
              |      SELECT doc_id, unnest(t) AS w FROM toks) t)
              |  GROUP BY 1),
              |nn AS (
              |  SELECT doc_id, count(*)::BIGINT AS nnew FROM fd
              |  GROUP BY 1),
              |j AS (
              |  SELECT p.doc_id, p.ntok,
              |    coalesce(nn.nnew, 0)::BIGINT AS nnew
              |  FROM perdoc p LEFT JOIN nn USING (doc_id)),
              |cum AS (
              |  SELECT doc_id, sum(ntok) OVER w AS ncum,
              |    sum(nnew) OVER w AS vcum
              |  FROM j WINDOW w AS (ORDER BY doc_id ROWS BETWEEN
              |    UNBOUNDED PRECEDING AND CURRENT ROW)),
              |filt AS (SELECT ncum::BIGINT AS ncum,
              |  vcum::BIGINT AS vcum FROM cum
              |  WHERE ncum >= 1 AND vcum >= 1),
              |s AS (
              |  SELECT count(*)::BIGINT AS n,
              |    max(ncum)::BIGINT AS n_tokens,
              |    max(vcum)::BIGINT AS n_types,
              |    sum(round(ln(ncum::DOUBLE), 12)::DECIMAL(28,12))
              |      ::DOUBLE AS sx,
              |    sum(round(ln(vcum::DOUBLE), 12)::DECIMAL(28,12))
              |      ::DOUBLE AS sy,
              |    sum(round(ln(ncum::DOUBLE) * ln(ncum::DOUBLE), 12)
              |      ::DECIMAL(28,12))::DOUBLE AS sxx,
              |    sum(round(ln(ncum::DOUBLE) * ln(vcum::DOUBLE), 12)
              |      ::DECIMAL(28,12))::DOUBLE AS sxy,
              |    sum(round(ln(vcum::DOUBLE) * ln(vcum::DOUBLE), 12)
              |      ::DECIMAL(28,12))::DOUBLE AS syy
              |  FROM filt),
              |r AS (
              |  SELECT n, n_tokens, n_types,
              |    n::DOUBLE * sxx - sx * sx AS cxx,
              |    n::DOUBLE * sxy - sx * sy AS cxy,
              |    n::DOUBLE * syy - sy * sy AS cyy, sx, sy
              |  FROM s),
              |r2 AS (
              |  SELECT n, n_tokens, n_types, cxx, cxy, cyy,
              |    cxy / nullif(cxx, 0) AS beta, sx, sy FROM r)
              |SELECT n AS n_docs, n_tokens, n_types,
              |  CASE WHEN n >= 2 AND cxx > 0 THEN round(beta, 6) END
              |    AS beta_r,
              |  CASE WHEN n >= 2 AND cxx > 0 THEN
              |    round(exp((sy - beta * sx) / n::DOUBLE), 6) END
              |    AS k_r,
              |  CASE WHEN n >= 2 AND cxx > 0 AND cyy > 0 THEN
              |    round(cxy * cxy / (cxx * cyy), 6) END AS r2_r
              |FROM r2""".stripMargin),
      (s, d) => graft.ops.TextOps.heapsLaw(documents(s, d), "doc_id",
        "text")),

    // Embedding-isotropy audit: mean pairwise cosine over ALL pairs
    // in closed form (‖Σv̂‖² − Σ‖v̂‖²)/(n(n−1)) — the anisotropy/
    // "cone" pathology detector; one pass, no pair join.
    Q("q350_isotropy",
      Some("""WITH pre AS (
             |  SELECT embedding::DOUBLE[] AS e,
             |    sqrt(list_reduce(list_transform(embedding::DOUBLE[],
             |      y -> y * y), (a, b) -> a + b)) AS nrm
             |  FROM embeddings),
             |nz AS (SELECT e, nrm FROM pre WHERE nrm > 0),
             |comp AS (
             |  SELECT g.i - 1 AS dim, e[g.i] / nrm AS v
             |  FROM nz, unnest(generate_series(1, 64)) AS g(i)),
             |dimsums AS (
             |  SELECT dim, sum(round(v, 12)::DECIMAL(28,12))::DOUBLE
             |    AS s
             |  FROM comp GROUP BY 1),
             |ss AS (
             |  SELECT sum(round(s * s, 12)::DECIMAL(28,12))::DOUBLE
             |    AS ss FROM dimsums),
             |nn AS (
             |  SELECT count(*)::BIGINT AS n,
             |    sum(round(list_reduce(list_transform(
             |        list_transform(e, y -> y / nrm), y -> y * y),
             |      (a, b) -> a + b), 12)::DECIMAL(28,12))::DOUBLE
             |      AS nn
             |  FROM nz)
             |SELECT n, round(ss, 6) AS sum_sq_r,
             |  CASE WHEN n >= 2 THEN round((ss - nn)
             |    / (n::DOUBLE * (n::DOUBLE - 1)), 6) END
             |    AS mean_pair_cos_r
             |FROM nn, ss""".stripMargin),
      (s, d) => graft.ops.Similarity.isotropyAudit(embeddings(s, d))),

    // Participation-ratio effective dimensionality: tr(M)²/‖M‖_F²
    // of the uncentered second-moment matrix — 1 = rank collapse,
    // d = isotropic; catches dead dimensions before retrieval does.
    Q("q351_participation_ratio",
      Some("""WITH pre AS (
             |  SELECT embedding::DOUBLE[] AS e FROM embeddings),
             |prods AS (
             |  SELECT gj.i AS j, gk.i AS k, e[gj.i] * e[gk.i] AS p
             |  FROM pre, unnest(generate_series(1, 64)) AS gj(i),
             |    unnest(generate_series(1, 64)) AS gk(i)),
             |m AS (
             |  SELECT j, k, sum(round(p, 12)::DECIMAL(28,12))::DOUBLE
             |    AS m
             |  FROM prods GROUP BY 1, 2),
             |tr AS (
             |  SELECT sum(round(m, 12)::DECIMAL(28,12))::DOUBLE
             |    AS tr, count(*)::BIGINT AS d
             |  FROM m WHERE j = k),
             |fro AS (
             |  SELECT sum(round(m * m, 12)::DECIMAL(28,12))::DOUBLE
             |    AS f2 FROM m)
             |SELECT d, round(tr, 6) AS trace_r,
             |  round(f2, 6) AS fro2_r,
             |  CASE WHEN f2 > 0 THEN round(tr * tr / f2, 6) END
             |    AS pr_r
             |FROM tr, fro""".stripMargin),
      (s, d) => graft.ops.Similarity.participationRatio(
        embeddings(s, d))),

    // Best single mean-shift changepoint (binary segmentation step 1)
    // on daily revenue: exhaustive SSE scan from exact prefix moments
    // — q191's CUSUM alarms on drift; this LOCATES the break.
    Q("q352_best_break",
      Some(s"""$GrainSql,
              |pre AS (
              |  SELECT t.t, count(*) OVER w AS cn,
              |    sum(y::HUGEINT) OVER w AS cy,
              |    sum(y::HUGEINT * y) OVER w AS cyy
              |  FROM t WINDOW w AS (ORDER BY t.t ROWS BETWEEN
              |    UNBOUNDED PRECEDING AND CURRENT ROW)),
              |tot AS (
              |  SELECT max(cn)::BIGINT AS n, arg_max(cy, t) AS sy,
              |    arg_max(cyy, t) AS syy, max(t)::BIGINT AS tmax
              |  FROM pre),
              |cand AS (
              |  SELECT t, cn, cy, n, sy,
              |    cyy::DOUBLE - cy::DOUBLE * cy::DOUBLE / cn::DOUBLE
              |      AS ssel,
              |    (syy - cyy)::DOUBLE - (sy - cy)::DOUBLE
              |      * (sy - cy)::DOUBLE / (n - cn)::DOUBLE AS sser,
              |    syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE
              |      AS sse0
              |  FROM pre, tot WHERE t < tmax),
              |best AS (
              |  SELECT * FROM cand
              |  ORDER BY (sse0 - (ssel + sser)) DESC, t LIMIT 1)
              |SELECT n AS n_days, (t + 1)::BIGINT AS break_t,
              |  cn::BIGINT AS n_left,
              |  round(cy::DOUBLE / cn::DOUBLE, 6) AS mean_left_r,
              |  round((sy - cy)::DOUBLE / (n - cn)::DOUBLE, 6)
              |    AS mean_right_r,
              |  CASE WHEN n > 2 AND ssel + sser > 0 THEN
              |    round((sse0 - (ssel + sser))
              |      / ((ssel + sser) / (n::DOUBLE - 2)), 6) END
              |    AS f_r
              |FROM best""".stripMargin),
      (s, d) => graft.ops.TimeSeries.bestMeanShift(grain(s, d), "t",
        "y")),

    // Exponentiality KS of inter-event gaps vs the exponential(λ̂)
    // null: are per-user arrivals Poisson, or bursty — the
    // distributional sharpening of q292's dispersion index.
    Q("q353_exponentiality_ks",
      Some("""WITH g AS (
             |  SELECT epoch_us(ts) AS cur,
             |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS prev
             |  FROM events),
             |gaps AS (
             |  SELECT (cur - prev)::BIGINT AS gus FROM g
             |  WHERE prev IS NOT NULL),
             |grain AS (
             |  SELECT gus, count(*)::BIGINT AS c FROM gaps
             |  GROUP BY 1),
             |cum AS (
             |  SELECT gus, c, sum(c) OVER (ORDER BY gus ROWS BETWEEN
             |    UNBOUNDED PRECEDING AND CURRENT ROW) AS rs
             |  FROM grain),
             |tot AS (
             |  SELECT count(*)::BIGINT AS n, sum(gus)::BIGINT AS sg
             |  FROM gaps),
             |d AS (
             |  SELECT max(greatest(
             |      abs(rs::DOUBLE / n::DOUBLE
             |        - (1.0 - exp(-(n::DOUBLE / (sg::DOUBLE / 1e6))
             |          * (gus::DOUBLE / 1e6)))),
             |      abs((1.0 - exp(-(n::DOUBLE / (sg::DOUBLE / 1e6))
             |          * (gus::DOUBLE / 1e6)))
             |        - (rs - c)::DOUBLE / n::DOUBLE))) AS dd
             |  FROM cum, tot)
             |SELECT n AS n_gaps,
             |  round(sg::DOUBLE / 1e6 / n::DOUBLE, 6)
             |    AS mean_gap_s_r,
             |  round(dd, 6) AS d_ks_r
             |FROM tot, d""".stripMargin),
      (s, d) => graft.ops.Nonparam.exponentialityKs(events(s, d),
        "user_id", "ts", "event_id"))
  )
}
