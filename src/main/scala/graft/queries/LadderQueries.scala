package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Agreement, Attribution, Skew, TimeSeries}
import graft.util.Tables._

/** Round-14 ladder-completion batch: each query is the missing rung
  * of an existing family — exact Shapley values complete the
  * attribution ladder (q205 heuristics / q252 decay / q366-family
  * Markov removal), the Allan-variance ladder completes the
  * count-stability family (Taylor law / dispersion), the Lorenz
  * asymmetry coefficient gives the DIRECTION the Gini magnitude
  * can't, Lin's CCC is the paired-continuous agreement the
  * categorical kappas can't express, and Gwet's AC1 resolves the
  * kappa paradox on the SAME rater frame as q443's Fleiss kappa.
  */
object LadderQueries {

  private val AllanTaus = Seq(1, 2, 4, 8)

  private val coalitionValues =
    (0 to 15).map(m => s"($m)").mkString(", ")
  private val shapleyWeightValues = Attribution.ShapleyWeights
    .map { case (c, s, sc, w) => s"('$c', $s, $sc, $w)" }
    .mkString(",\n    ")

  val all: Seq[Q] = Seq(

    // Exact Shapley attribution over the 2^4 channel-coalition
    // lattice: v(S) = converters whose touched-set ⊆ S; phi reported
    // as the exact 24-scaled integer + the /24 double.
    Q("q527_shapley_attribution",
      Some(s"""WITH e AS (
              |  SELECT user_id, event_type, epoch_us(ts) AS us
              |  FROM events),
              |c AS (SELECT user_id,
              |    min(CASE WHEN event_type = 'purchase' THEN us END)
              |      AS conv_us
              |  FROM e GROUP BY 1),
              |t AS (SELECT e.user_id, e.event_type
              |  FROM e JOIN c USING (user_id)
              |  WHERE e.event_type <> 'purchase'
              |    AND (c.conv_us IS NULL OR e.us < c.conv_us)),
              |m AS (SELECT user_id,
              |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              |  + max(CASE WHEN event_type = 'error' THEN 2 ELSE 0 END)
              |  + max(CASE WHEN event_type = 'signup' THEN 4 ELSE 0
              |      END)
              |  + max(CASE WHEN event_type = 'view' THEN 8 ELSE 0 END)
              |    AS mask
              |  FROM t GROUP BY 1),
              |cm AS (SELECT coalesce(m.mask, 0) AS mask,
              |    count(*)::BIGINT AS u
              |  FROM c LEFT JOIN m USING (user_id)
              |  WHERE c.conv_us IS NOT NULL GROUP BY 1),
              |s(smask) AS (VALUES $coalitionValues),
              |v AS (SELECT s.smask,
              |    coalesce(sum(cm.u), 0)::BIGINT AS v
              |  FROM s LEFT JOIN cm ON (cm.mask & s.smask) = cm.mask
              |  GROUP BY 1),
              |w(channel, smask, scmask, wt) AS (VALUES
              |    $shapleyWeightValues)
              |SELECT w.channel,
              |  sum(w.wt * (vc.v - vs.v))::BIGINT AS phi24,
              |  sum(w.wt * (vc.v - vs.v))::DOUBLE / 24.0 AS phi_r
              |FROM w JOIN v vs ON vs.smask = w.smask
              |  JOIN v vc ON vc.smask = w.scmask
              |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => Attribution.shapleyAttribution(events(s, d), "user_id",
        "event_type", "ts", convType = "purchase")),

    // Allan variance ladder of the daily count stream at tau =
    // 1/2/4/8 days: the slope across taus names the noise type
    // (white ~ 1/tau, random walk ~ tau).
    Q("q528_allan_variance",
      Some("""WITH daily AS (SELECT ts::DATE AS day,
             |  count(*)::BIGINT AS x FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
             |spine AS (SELECT b.d0,
             |  unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY))
             |    ::DATE AS day FROM b),
             |f AS (SELECT (s.day - s.d0)::BIGINT AS t,
             |  coalesce(d.x, 0)::BIGINT AS x
             |  FROM spine s LEFT JOIN daily d USING (day)),
             |tt(tau_days) AS (VALUES (1), (2), (4), (8)),
             |bl AS (SELECT tt.tau_days, f.t // tt.tau_days AS blk,
             |  count(*)::BIGINT AS cnt, sum(f.x)::BIGINT AS s
             |  FROM f CROSS JOIN tt GROUP BY 1, 2),
             |cb AS (SELECT tau_days, blk, s FROM bl
             |  WHERE cnt = tau_days),
             |df AS (SELECT tau_days,
             |  s - lag(s) OVER (PARTITION BY tau_days ORDER BY blk)
             |    AS d FROM cb),
             |ag AS (SELECT tau_days, count(*)::BIGINT AS n_blocks,
             |  coalesce(sum(d::HUGEINT * d), 0)::DECIMAL(38,0) AS num
             |  FROM df GROUP BY 1)
             |SELECT tau_days, n_blocks,
             |  round(num::DOUBLE / (2.0 * (n_blocks::DOUBLE - 1.0)
             |    * tau_days::DOUBLE * tau_days::DOUBLE), 6) AS avar_r
             |FROM ag ORDER BY tau_days""".stripMargin),
      (s, d) => TimeSeries.allanVariance(events(s, d), "ts",
        AllanTaus)),

    // Lorenz asymmetry of order totals: S = F(mu) + L(mu) — which
    // side of the distribution drives the inequality the Gini only
    // sizes. Exact integer below-mean predicate (n·x < total).
    Q("q529_lorenz_asymmetry",
      Some("""WITH c AS MATERIALIZED (
             |  SELECT cast(round(o_totalprice * 100) AS BIGINT) AS c
             |  FROM orders
             |  WHERE cast(round(o_totalprice * 100) AS BIGINT) > 0),
             |t AS (SELECT count(*)::BIGINT AS n, sum(c)::BIGINT AS tot
             |  FROM c),
             |a AS (SELECT t.n, t.tot,
             |  sum(CASE WHEN c.c * t.n < t.tot THEN 1 ELSE 0 END)
             |    ::BIGINT AS n_below,
             |  coalesce(sum(CASE WHEN c.c * t.n < t.tot THEN c.c END),
             |    0)::BIGINT AS below_mass
             |  FROM c, t GROUP BY 1, 2)
             |SELECT n, n_below,
             |  round(n_below::DOUBLE / n::DOUBLE, 6) AS f_mu_r,
             |  round(below_mass::DOUBLE / tot::DOUBLE, 6) AS l_mu_r,
             |  round(n_below::DOUBLE / n::DOUBLE
             |    + below_mass::DOUBLE / tot::DOUBLE, 6) AS s_r
             |FROM a""".stripMargin),
      (s, d) => Skew.lorenzAsymmetry(orders(s, d), "o_totalprice")),

    // Lin's concordance of this week's daily counts vs 7 days prior
    // on the zero-filled spine: agreement with the 45° line (CCC =
    // r · Cb), penalizing the level/scale shift plain week-over-week
    // correlation ignores.
    Q("q530_weekly_ccc",
      Some("""WITH daily AS (SELECT ts::DATE AS day,
             |  count(*)::BIGINT AS x FROM events GROUP BY 1),
             |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
             |spine AS (SELECT b.d0,
             |  unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY))
             |    ::DATE AS day FROM b),
             |f AS (SELECT (s.day - s.d0)::BIGINT AS t,
             |  coalesce(d.x, 0)::BIGINT AS x
             |  FROM spine s LEFT JOIN daily d USING (day)),
             |p AS (SELECT a.x AS x, pb.x AS y
             |  FROM f a JOIN f pb ON pb.t = a.t - 7),
             |ag AS (SELECT count(*)::BIGINT AS n,
             |  sum(x::HUGEINT)::HUGEINT AS sx,
             |  sum(y::HUGEINT)::HUGEINT AS sy,
             |  sum(x::HUGEINT * y)::HUGEINT AS sxy,
             |  sum(x::HUGEINT * x)::HUGEINT AS sxx,
             |  sum(y::HUGEINT * y)::HUGEINT AS syy
             |  FROM p)
             |SELECT n AS n_pairs,
             |  round(((n::HUGEINT * sxy - sx * sy) * 2)::DOUBLE
             |    / ((n::HUGEINT * sxx - sx * sx)::DOUBLE
             |      + (n::HUGEINT * syy - sy * sy)::DOUBLE
             |      + ((sx - sy) * (sx - sy))::DOUBLE), 6) AS ccc_r,
             |  round(CASE WHEN (n::HUGEINT * sxx - sx * sx)::DOUBLE > 0
             |      AND (n::HUGEINT * syy - sy * sy)::DOUBLE > 0 THEN
             |    (((n::HUGEINT * sxy - sx * sy) * 2)::DOUBLE / 2.0)
             |      / (sqrt((n::HUGEINT * sxx - sx * sx)::DOUBLE)
             |        * sqrt((n::HUGEINT * syy - sy * sy)::DOUBLE))
             |    END, 6) AS pearson_r,
             |  round(CASE WHEN (n::HUGEINT * sxx - sx * sx)::DOUBLE > 0
             |      AND (n::HUGEINT * syy - sy * sy)::DOUBLE > 0 THEN
             |    (((n::HUGEINT * sxy - sx * sy) * 2)::DOUBLE
             |      / ((n::HUGEINT * sxx - sx * sx)::DOUBLE
             |        + (n::HUGEINT * syy - sy * sy)::DOUBLE
             |        + ((sx - sy) * (sx - sy))::DOUBLE))
             |    / ((((n::HUGEINT * sxy - sx * sy) * 2)::DOUBLE / 2.0)
             |      / (sqrt((n::HUGEINT * sxx - sx * sx)::DOUBLE)
             |        * sqrt((n::HUGEINT * syy - sy * sy)::DOUBLE)))
             |    END, 6) AS cb_r
             |FROM ag""".stripMargin),
      (s, d) => {
        val daily = events(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("x"))
        val spine = daily.agg(min(col("day")).as("_d0"),
            max(col("day")).as("_d1"))
          .select(col("_d0"),
            explode(sequence(col("_d0"), col("_d1"))).as("day"))
        val f = spine.join(daily, Seq("day"), "left")
          .select(datediff(col("day"), col("_d0")).as("_t"),
            coalesce(col("x"), lit(0L)).as("x"))
        val pairs = f.as("a").join(f.select(col("_t").as("_tb"),
            col("x").as("y")),
          col("_tb") === col("_t") - 7)
        Agreement.linCcc(pairs, "x", "y")
      }),

    // Gwet's AC1 on the SAME three-heuristic rater frame as q443's
    // Fleiss kappa: the chance model that survives skewed prevalence
    // (the kappa paradox), exact integers end to end.
    Q("q531_gwet_ac1",
      Some(s"""${AgreementQueries.ratersSql},
              |a AS (SELECT count(DISTINCT doc_id)::BIGINT AS ni,
              |  sum(n::HUGEINT * (n - 1))::HUGEINT AS anum FROM g),
              |tcat AS (SELECT cat, sum(n)::BIGINT AS t FROM g
              |  GROUP BY 1),
              |cc AS (SELECT sum(t::HUGEINT * (a.ni * 3 - t))::HUGEINT
              |    AS cnum FROM tcat, a),
              |fin AS (SELECT a.ni AS n_items,
              |  a.anum::DECIMAL(38,0) AS av,
              |  (a.ni::HUGEINT * 6)::DECIMAL(38,0) AS bv,
              |  cc.cnum::DECIMAL(38,0) AS cv,
              |  ((a.ni::HUGEINT * 3) * (a.ni::HUGEINT * 3))
              |    ::DECIMAL(38,0) AS dv
              |  FROM a, cc)
              |SELECT n_items,
              |  round(av::DOUBLE / bv::DOUBLE, 6) AS po_r,
              |  round(cv::DOUBLE / dv::DOUBLE, 6) AS pe_r,
              |  round((av::DOUBLE * dv::DOUBLE
              |      - cv::DOUBLE * bv::DOUBLE)
              |    / (bv::DOUBLE * (dv::DOUBLE - cv::DOUBLE)), 6)
              |    AS ac1_r
              |FROM fin""".stripMargin),
      (s, d) => Agreement.gwetAc1(AgreementQueries.raters(s, d),
        "doc_id", "cat", m = 3, k = 2))
  )
}
