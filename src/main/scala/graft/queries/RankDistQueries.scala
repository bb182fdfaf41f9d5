package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.RankDist
import graft.util.Tables._

/** Round-13 ranking-distance + decomposition batch: footrule/Kendall
  * distance and rank-turbulence contributions between the two brand
  * leaderboards (revenue vs quantity), the Oaxaca–Blinder gap
  * decomposition, and the split-conformal daily-count interval —
  * next to q276's top-k membership drift and q247's point backtests.
  */
object RankDistQueries {

  /** Brand scores under both metrics + the two rankings — the shared
    * oracle trunk (mirrors RankDist.ranks over brandScores). */
  private val RanksCte =
    """b AS (
      |  SELECT p_brand AS item,
      |    sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
      |      AS rev,
      |    sum(CAST(round(l_quantity) AS BIGINT))::BIGINT AS qty
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1),
      |r AS (SELECT item,
      |  CAST(row_number() OVER (ORDER BY rev DESC, item) AS BIGINT)
      |    AS ra,
      |  CAST(row_number() OVER (ORDER BY qty DESC, item) AS BIGINT)
      |    AS rb
      |  FROM b)""".stripMargin

  private def brandScores(s: org.apache.spark.sql.SparkSession,
      d: String) =
    lineitem(s, d)
      .join(part(s, d), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("item"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
        .as("rev"),
        sum(round(col("l_quantity")).cast("long")).as("qty"))

  val all: Seq[Q] = Seq(

    // Spearman footrule between the revenue and quantity brand
    // leaderboards: total + max displacement, normalized by the
    // permutation maximum ⌊n²/2⌋.
    Q("q507_footrule",
      Some(s"""WITH $RanksCte
              |SELECT count(*)::BIGINT AS n_items,
              |  sum(abs(ra - rb))::BIGINT AS footrule,
              |  max(abs(ra - rb))::BIGINT AS max_disp,
              |  round(sum(abs(ra - rb))::DOUBLE
              |    / ((count(*) * count(*)) // 2)::DOUBLE, 6)
              |    AS footrule_norm_r
              |FROM r""".stripMargin),
      (s, d) => RankDist.footrule(brandScores(s, d),
        "item", "rev", "qty")),

    // Rank-turbulence contributions |1/r_rev − 1/r_qty| per brand —
    // which brands drive the leaderboard disagreement (top-rank moves
    // dominate; footrule's absolute displacements over-weight the
    // tail).
    Q("q508_rank_turbulence",
      Some(s"""WITH $RanksCte
              |SELECT item, ra, rb,
              |  round(abs(1.0 / ra::DOUBLE - 1.0 / rb::DOUBLE), 6)
              |    AS rtd_r
              |FROM r ORDER BY rtd_r DESC, item""".stripMargin),
      (s, d) => RankDist.rankTurbulence(brandScores(s, d),
          "item", "rev", "qty")
        .orderBy(desc("rtd_r"), col("item"))),

    // Kendall distance between the two leaderboards: exact discordant
    // pairs on the bounded brand grid plus τ_a (permutations have no
    // ties, so C = n_pairs − D).
    Q("q509_kendall_distance",
      Some(s"""WITH $RanksCte,
              |d AS (SELECT count(*)::BIGINT AS discordant
              |  FROM r a CROSS JOIN r b
              |  WHERE a.ra < b.ra AND a.rb > b.rb),
              |n AS (SELECT count(*)::BIGINT AS n_items FROM r)
              |SELECT n_items,
              |  (n_items * (n_items - 1) // 2)::BIGINT AS n_pairs,
              |  discordant,
              |  round((n_items * (n_items - 1) // 2
              |    - 2 * discordant)::DOUBLE
              |    / (n_items * (n_items - 1) // 2)::DOUBLE, 6)
              |    AS tau_a_r
              |FROM n, d""".stripMargin),
      (s, d) => RankDist.kendallDistance(brandScores(s, d),
        "item", "rev", "qty")),

    // Oaxaca–Blinder twofold decomposition of the click-vs-error mean
    // value gap with the hour-of-day covariate (reference = error):
    // how much of the gap is hour mix (explained) vs rate (unexplained).
    Q("q510_oaxaca_blinder",
      Some("""WITH src AS (
             |  SELECT event_type AS g,
             |    extract(hour FROM ts)::DOUBLE AS x, value AS y
             |  FROM events WHERE event_type IN ('click', 'error')),
             |m AS (SELECT g, count(*)::BIGINT AS n,
             |  sum(round(x, 12)::DECIMAL(28,12))::DOUBLE AS sx,
             |  sum(round(y, 12)::DECIMAL(28,12))::DOUBLE AS sy,
             |  sum(round(x * x, 12)::DECIMAL(28,12))::DOUBLE AS sxx,
             |  sum(round(x * y, 12)::DECIMAL(28,12))::DOUBLE AS sxy
             |  FROM src GROUP BY 1),
             |a AS (SELECT * FROM m WHERE g = 'click'),
             |bb AS (SELECT * FROM m WHERE g = 'error')
             |SELECT a.n AS n_a, bb.n AS n_b,
             |  round(a.sy / a.n::DOUBLE - bb.sy / bb.n::DOUBLE, 6)
             |    AS gap_r,
             |  round(((bb.sxy - bb.sx * bb.sy / bb.n::DOUBLE)
             |      / (bb.sxx - bb.sx * bb.sx / bb.n::DOUBLE))
             |    * (a.sx / a.n::DOUBLE - bb.sx / bb.n::DOUBLE), 6)
             |    AS explained_r,
             |  round((a.sy / a.n::DOUBLE - bb.sy / bb.n::DOUBLE)
             |    - ((bb.sxy - bb.sx * bb.sy / bb.n::DOUBLE)
             |      / (bb.sxx - bb.sx * bb.sx / bb.n::DOUBLE))
             |    * (a.sx / a.n::DOUBLE - bb.sx / bb.n::DOUBLE), 6)
             |    AS unexplained_r
             |FROM a, bb""".stripMargin),
      (s, d) => RankDist.oaxacaBlinder(
        events(s, d).select(col("event_type"),
          hour(col("ts")).cast("double").as("x"),
          col("value").as("y")),
        "event_type", "click", "error", "x", "y")),

    // Diebold–Mariano adjudication between the lag-7 seasonal-naïve
    // and naïve-1 forecasts of per-type daily counts: does the
    // seasonal forecaster actually beat the trivial one? (q496's
    // scorecard scores ONE forecaster; q384's conformal bands one —
    // this TESTS the pair.) Exact integer loss differentials on the
    // shared zero-filled spine.
    Q("q511_diebold_mariano",
      Some("""WITH daily AS (
             |  SELECT event_type AS k, ts::DATE AS day,
             |    count(*)::BIGINT AS x
             |  FROM events GROUP BY 1, 2),
             |spine AS (
             |  SELECT k, unnest(generate_series(min(day), max(day),
             |    INTERVAL 1 DAY))::DATE AS day
             |  FROM daily GROUP BY k),
             |filled AS (
             |  SELECT s.k, s.day, coalesce(d.x, 0)::BIGINT AS x
             |  FROM spine s LEFT JOIN daily d
             |    ON d.k = s.k AND d.day = s.day),
             |j AS (
             |  SELECT f.k,
             |    (abs(f.x - p7.x) - abs(f.x - p1.x))::BIGINT AS d
             |  FROM filled f
             |  JOIN filled p7 ON p7.k = f.k AND p7.day = f.day - 7
             |  JOIN filled p1 ON p1.k = f.k AND p1.day = f.day - 1),
             |a AS (SELECT k, count(*)::BIGINT AS n_days,
             |  sum(d)::BIGINT AS sd, sum(d * d)::BIGINT AS sdd
             |  FROM j GROUP BY 1)
             |SELECT k AS event_type, n_days,
             |  round(sd::DOUBLE / n_days::DOUBLE, 6) AS mean_d_r,
             |  round(CASE WHEN n_days > 1 AND
             |      (sdd::DOUBLE - sd::DOUBLE * sd::DOUBLE
             |        / n_days::DOUBLE) / (n_days::DOUBLE - 1) > 0
             |    THEN (sd::DOUBLE / n_days::DOUBLE)
             |      / sqrt(((sdd::DOUBLE - sd::DOUBLE * sd::DOUBLE
             |        / n_days::DOUBLE) / (n_days::DOUBLE - 1))
             |        / n_days::DOUBLE)
             |    END, 6) AS dm_r
             |FROM a ORDER BY event_type""".stripMargin),
      (s, d) => graft.ops.Forecast.dieboldMariano(
          events(s, d).select(col("event_type"), col("ts")),
          "event_type", "ts", 7)
        .orderBy("event_type")))
}
