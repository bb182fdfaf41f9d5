package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Contingency
import graft.util.Tables._

/** Round-13 contingency-grid batch: the χ²-family effect sizes,
  * per-cell residual diagnostics, the G² deviance, ordinal γ, and
  * IPF raking — the grid-association completions next to q167's
  * per-term χ², Profile.mutualInfo's NMI, and assocMeasures' λ/U.
  */
object ContingencyQueries {

  /** The (event_type × isodow) zero-filled grid with marginals —
    * the shared oracle trunk (mirrors Contingency.grid). */
  private val GridCte =
    """src AS (SELECT event_type AS x, isodow(ts)::INT AS y FROM events),
      |jd AS (SELECT x, y, count(*)::BIGINT AS o FROM src GROUP BY 1, 2),
      |mx AS (SELECT x, sum(o)::BIGINT AS mx FROM jd GROUP BY 1),
      |my AS (SELECT y, sum(o)::BIGINT AS my FROM jd GROUP BY 1),
      |tot AS (SELECT sum(o)::BIGINT AS n,
      |  count(DISTINCT x)::BIGINT AS r,
      |  count(DISTINCT y)::BIGINT AS c FROM jd),
      |g AS (
      |  SELECT mx.x, my.y, coalesce(o, 0)::BIGINT AS o, mx, my, n, r, c
      |  FROM mx CROSS JOIN my LEFT JOIN jd USING (x, y)
      |  CROSS JOIN tot)""".stripMargin

  private def eventsXY(s: org.apache.spark.sql.SparkSession, d: String) =
    events(s, d).select(col("event_type"),
      (((dayofweek(col("ts")) + 5) % 7) + 1).cast("int").as("dow"))

  /** Unrolled IPF CTE chain: `iters` sweeps of row-scale then
    * col-scale, each margin a 12-dp decimal fold (the powerSql
    * pattern — the oracle walks the exact driver-local trajectory). */
  private def ipfSql(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      val prev = if (i == 1) "i0" else s"w${i - 1}"
      s"""v$i AS (SELECT x, sum(round(m, 12)::DECIMAL(28,12))::DOUBLE
         |  AS s FROM $prev GROUP BY 1),
         |h$i AS (SELECT $prev.x, y,
         |  CASE WHEN s = 0 THEN m ELSE m * (tr / s) END AS m
         |  FROM $prev JOIN v$i USING (x), tgt),
         |u$i AS (SELECT y, sum(round(m, 12)::DECIMAL(28,12))::DOUBLE
         |  AS s FROM h$i GROUP BY 1),
         |w$i AS (SELECT x, h$i.y,
         |  CASE WHEN s = 0 THEN m ELSE m * (tc / s) END AS m
         |  FROM h$i JOIN u$i USING (y), tgt)""".stripMargin
    }.mkString(",\n")
    s"""i0 AS (SELECT x, y, o::DOUBLE AS m FROM g),
       |tgt AS (SELECT n::DOUBLE / r::DOUBLE AS tr,
       |  n::DOUBLE / c::DOUBLE AS tc FROM tot),
       |$steps""".stripMargin
  }

  private val IpfIters = 3

  val all: Seq[Q] = Seq(

    // Pearson χ² of (event_type × isodow) independence with its
    // effect sizes: Cramér's V, Tschuprow's T, contingency C —
    // the bounded strengths raw χ² (which scales with n) is not.
    Q("q502_chi2_effect_sizes",
      Some(s"""WITH $GridCte,
              |a AS (SELECT n, r, c,
              |  sum(round((o::DOUBLE - (mx * my)::DOUBLE / n::DOUBLE)
              |    * (o::DOUBLE - (mx * my)::DOUBLE / n::DOUBLE)
              |    / ((mx * my)::DOUBLE / n::DOUBLE), 12)
              |    ::DECIMAL(28,12))::DOUBLE AS chi2
              |  FROM g GROUP BY 1, 2, 3)
              |SELECT n, ((r - 1) * (c - 1))::BIGINT AS dof,
              |  round(chi2, 6) AS chi2_r,
              |  round(sqrt(chi2 / (n::DOUBLE
              |    * (least(r, c) - 1)::DOUBLE)), 6) AS v_r,
              |  round(sqrt(chi2 / (n::DOUBLE
              |    * sqrt(((r - 1) * (c - 1))::DOUBLE))), 6) AS t_r,
              |  round(sqrt(chi2 / (chi2 + n::DOUBLE)), 6) AS c_r
              |FROM a""".stripMargin),
      (s, d) => Contingency.chiSquareGrid(eventsXY(s, d),
        "event_type", "dow")),

    // Standardized Pearson residuals per (event_type, isodow) cell:
    // which cells drive the χ² — |resid| > 2 ≈ significant at 5%.
    Q("q503_pearson_residuals",
      Some(s"""WITH $GridCte,
              |e AS (SELECT x, y, o, mx, my, n,
              |  (mx * my)::DOUBLE / n::DOUBLE AS e FROM g)
              |SELECT x AS event_type, y AS dow, o AS n_xy,
              |  round(e, 6) AS e_r,
              |  round((o::DOUBLE - e) / sqrt(e
              |    * (1.0 - mx::DOUBLE / n::DOUBLE)
              |    * (1.0 - my::DOUBLE / n::DOUBLE)), 6) AS resid_r
              |FROM e ORDER BY event_type, dow""".stripMargin),
      (s, d) => Contingency.pearsonResiduals(eventsXY(s, d),
          "event_type", "dow")
        .orderBy("event_type", "dow")),

    // Likelihood-ratio G² of independence with ΔAIC/ΔBIC vs the
    // saturated model — the deviance complement of q502's χ².
    Q("q504_g2_independence",
      Some(s"""WITH $GridCte,
              |a AS (SELECT n, r, c,
              |  sum(round(CASE WHEN o > 0 THEN 2.0 * o::DOUBLE
              |      * ln(o::DOUBLE / ((mx * my)::DOUBLE / n::DOUBLE))
              |    ELSE 0.0 END, 12)::DECIMAL(28,12))::DOUBLE AS g2
              |  FROM g GROUP BY 1, 2, 3)
              |SELECT n, ((r - 1) * (c - 1))::BIGINT AS dof,
              |  round(g2, 6) AS g2_r,
              |  round(g2 - 2.0 * ((r - 1) * (c - 1))::DOUBLE, 6)
              |    AS aic_delta_r,
              |  round(g2 - ln(n::DOUBLE) * ((r - 1) * (c - 1))::DOUBLE,
              |    6) AS bic_delta_r
              |FROM a""".stripMargin),
      (s, d) => Contingency.gSquare(eventsXY(s, d),
        "event_type", "dow")),

    // Goodman–Kruskal γ between the hour-of-day quarter and the value
    // band (both ordinal): concordance the order-blind χ² cannot see.
    // Pair counts are exact DECIMAL(38,0) products on the bounded
    // 4×4 grid — never a row-level pair join.
    Q("q505_gk_gamma",
      Some("""WITH src AS (
             |  SELECT (extract(hour FROM ts) // 6)::BIGINT AS x,
             |    least(CAST(round(value * 100) AS BIGINT) // 5000,
             |      3)::BIGINT AS y
             |  FROM events),
             |jd AS (SELECT x, y, count(*)::BIGINT AS m FROM src
             |  GROUP BY 1, 2),
             |conc AS (SELECT coalesce(sum(a.m::DECIMAL(19,0)
             |    * b.m::DECIMAL(19,0)), 0)::DECIMAL(38,0) AS concordant
             |  FROM jd a CROSS JOIN jd b
             |  WHERE a.x < b.x AND a.y < b.y),
             |disc AS (SELECT coalesce(sum(a.m::DECIMAL(19,0)
             |    * b.m::DECIMAL(19,0)), 0)::DECIMAL(38,0) AS discordant
             |  FROM jd a CROSS JOIN jd b
             |  WHERE a.x < b.x AND a.y > b.y),
             |tot AS (SELECT sum(m)::BIGINT AS n FROM jd),
             |mc AS (SELECT n, concordant, discordant,
             |  CASE WHEN (concordant + discordant) = 0
             |    THEN CAST(NULL AS BIGINT)
             |  WHEN concordant >= discordant THEN CAST(
             |    ((concordant - discordant)::HUGEINT * 2000000
             |      + (concordant + discordant)::HUGEINT)
             |    // ((concordant + discordant)::HUGEINT * 2) AS BIGINT)
             |  ELSE -CAST(
             |    ((discordant - concordant)::HUGEINT * 2000000
             |      + (concordant + discordant)::HUGEINT)
             |    // ((concordant + discordant)::HUGEINT * 2) AS BIGINT)
             |  END AS micro
             |  FROM tot, conc, disc)
             |SELECT n, concordant, discordant,
             |  micro::DOUBLE / 1000000.0 AS gamma_r
             |FROM mc""".stripMargin),
      (s, d) => Contingency.gkGamma(
        events(s, d).select(
          expr("hour(ts) div 6").as("hq"),
          expr("least(cast(round(value * 100) as bigint) div 5000, 3L)")
            .as("vband")),
        "hq", "vband")),

    // IPF raking of the (event_type × isodow) table to uniform
    // margins, 3 sweeps — the survey/curation reweighting step. The
    // engine recursion is driver-local on the bounded grid; the
    // oracle unrolls the identical 12-dp trajectory.
    Q("q506_ipf_raking",
      Some(s"""WITH $GridCte,
              |${ipfSql(IpfIters)}
              |SELECT g.x AS event_type, g.y AS dow, g.o AS n_xy,
              |  round(w$IpfIters.m, 6) AS fitted_r
              |FROM g JOIN w$IpfIters ON g.x = w$IpfIters.x
              |  AND g.y = w$IpfIters.y
              |ORDER BY event_type, dow""".stripMargin),
      (s, d) => Contingency.ipfRaking(eventsXY(s, d),
          "event_type", "dow", IpfIters)
        .orderBy("event_type", "dow")))
}
