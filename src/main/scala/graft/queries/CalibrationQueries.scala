package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Calibrate
import graft.util.Tables._

/** Round-12 calibration/policy batch: Hosmer–Lemeshow and ECE/MCE on
  * a deterministic in-query risk score, IPS/SNIPS off-policy value of
  * "always purchase" under hour-stratified logging propensities,
  * Bowker's symmetry of first→last event-type transitions, and
  * NRI/IDI comparing the click-based score against the view-based
  * one.
  *
  * The "model" is a pair of deterministic share scores computed
  * identically in both engines: p1 = the user's view share, p2 = the
  * click share (pure rationals pinned to the 12-dp grid — no engine
  * transcendentals), against the label "purchase-heavy user"
  * (purchase share > 1/5, i.e. above the uniform-type expectation).
  * A binary every-user-purchased label degenerates at small scales
  * (users carry ~130 events each); share thresholds split the
  * population at every scale.
  */
object CalibrationQueries {

  /** Per-user label + the two share scores. */
  private val UserSql =
    """u AS (SELECT user_id,
      |  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |    ::BIGINT AS views,
      |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |    ::BIGINT AS clicks,
      |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |    ::BIGINT AS purch,
      |  count(*)::BIGINT AS tot
      |  FROM events GROUP BY 1),
      |p AS (SELECT
      |  CASE WHEN 5 * purch > tot THEN 1 ELSE 0 END AS y,
      |  round(views::DOUBLE / tot::DOUBLE, 12) AS p1,
      |  round(clicks::DOUBLE / tot::DOUBLE, 12) AS p2
      |  FROM u)""".stripMargin

  private def userSpark(s: org.apache.spark.sql.SparkSession,
      d: String) = {
    events(s, d).groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("views"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("clicks"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("purch"),
        count(lit(1)).as("tot"))
      .select(
        when(lit(5) * col("purch") > col("tot"), 1).otherwise(0)
          .as("y"),
        round(col("views").cast("double") / col("tot").cast("double"),
          12).as("p1"),
        round(col("clicks").cast("double")
          / col("tot").cast("double"), 12).as("p2"))
  }

  val all: Seq[Q] = Seq(

    // Hosmer–Lemeshow calibration χ² of the view-based score against
    // observed purchase, equal-width 10-bin variant.
    Q("q478_hosmer_lemeshow",
      Some(s"""WITH $UserSql,
              |per AS (SELECT least(floor(p1 * 10), 9)::BIGINT AS b,
              |  count(*)::BIGINT AS ng,
              |  sum(y)::BIGINT AS o1,
              |  sum(round(p1, 12)::DECIMAL(28,12))::DOUBLE AS e1
              |  FROM p GROUP BY 1),
              |f AS (SELECT * FROM per
              |  WHERE e1 > 0 AND ng::DOUBLE - e1 > 0)
              |SELECT sum(ng)::BIGINT AS n,
              |  count(*)::BIGINT AS n_bins_used,
              |  round(sum(round(
              |    (o1::DOUBLE - e1) * (o1::DOUBLE - e1) / e1
              |    + ((ng - o1)::DOUBLE - (ng::DOUBLE - e1))
              |      * ((ng - o1)::DOUBLE - (ng::DOUBLE - e1))
              |      / (ng::DOUBLE - e1), 12)::DECIMAL(28,12))
              |    ::DOUBLE, 6) AS hl_r,
              |  count(*) - 2 AS df
              |FROM f""".stripMargin),
      (s, d) => Calibrate.hosmerLemeshow(userSpark(s, d), "p1", "y")),

    // Reliability-diagram summary: expected + maximum calibration
    // error of the same score.
    Q("q479_ece_mce",
      Some(s"""WITH $UserSql,
              |per AS (SELECT least(floor(p1 * 10), 9)::BIGINT AS b,
              |  count(*)::BIGINT AS ng,
              |  sum(y)::BIGINT AS o1,
              |  sum(round(p1, 12)::DECIMAL(28,12))::DOUBLE AS sp
              |  FROM p GROUP BY 1)
              |SELECT sum(ng)::BIGINT AS n,
              |  round(sum(round(ng::DOUBLE
              |      * abs(o1::DOUBLE / ng::DOUBLE
              |        - sp::DOUBLE / ng::DOUBLE), 12)
              |      ::DECIMAL(28,12))::DOUBLE
              |    / sum(ng)::DOUBLE, 6) AS ece_r,
              |  round(max(round(abs(o1::DOUBLE / ng::DOUBLE
              |    - sp::DOUBLE / ng::DOUBLE), 12)), 6) AS mce_r
              |FROM per""".stripMargin),
      (s, d) => Calibrate.eceMce(userSpark(s, d), "p1", "y")),

    // Off-policy value of "always purchase" from the logged event
    // stream, hour-of-day-stratified empirical propensities.
    Q("q480_ips_snips",
      Some("""WITH src AS (SELECT
             |  ((epoch_us(ts) % 86400000000) // 3600000000)
             |    ::BIGINT AS ctx,
             |  event_type AS a, value AS r FROM events),
             |byctx AS (SELECT ctx, count(*)::BIGINT AS nc,
             |  sum(CASE WHEN a = 'purchase' THEN 1 ELSE 0 END)
             |    ::BIGINT AS nt
             |  FROM src GROUP BY 1 HAVING nt > 0),
             |scored AS (SELECT
             |  CASE WHEN a = 'purchase'
             |    THEN nc::DOUBLE / nt::DOUBLE ELSE 0.0 END AS w,
             |  CASE WHEN a = 'purchase'
             |    THEN least(nc::DOUBLE / nt::DOUBLE, 10.0)
             |    ELSE 0.0 END AS wc,
             |  r::DOUBLE AS r
             |  FROM src JOIN byctx USING (ctx))
             |SELECT count(*)::BIGINT AS n,
             |  round(sum(round(w * r, 12)::DECIMAL(28,12))::DOUBLE
             |    / count(*)::DOUBLE, 6) AS v_ips_r,
             |  round(sum(round(w * r, 12)::DECIMAL(28,12))::DOUBLE
             |    / sum(round(w, 12)::DECIMAL(28,12))::DOUBLE, 6)
             |    AS v_snips_r,
             |  round(sum(round(wc * r, 12)::DECIMAL(28,12))::DOUBLE
             |    / count(*)::DOUBLE, 6) AS v_clip_r,
             |  round(sum(round(w, 12)::DECIMAL(28,12))::DOUBLE
             |    * sum(round(w, 12)::DECIMAL(28,12))::DOUBLE
             |    / sum(round(w * w, 12)::DECIMAL(28,12))::DOUBLE, 6)
             |    AS ess_r
             |FROM scored""".stripMargin),
      (s, d) => Calibrate.ipsSnips(
        events(s, d).select(
          ((unix_micros(col("ts")) % 86400000000L)
            / lit(3600000000L)).cast("bigint").as("ctx"),
          col("event_type"), col("value")),
        "ctx", "event_type", "value", "purchase", 10.0)),

    // Bowker symmetry of the first→last event-type transition per
    // user (≥2 events): do sessions END the way they START?
    Q("q481_bowker_symmetry",
      Some("""WITH k AS (SELECT user_id, event_type,
             |  lpad(epoch_us(ts)::VARCHAR, 20, '0')
             |    || lpad(event_id::VARCHAR, 12, '0') AS ord
             |  FROM events),
             |fl AS (SELECT user_id,
             |  arg_min(event_type, ord) AS f,
             |  arg_max(event_type, ord) AS l,
             |  count(*)::BIGINT AS ne
             |  FROM k GROUP BY 1),
             |pairs AS (SELECT f, l FROM fl WHERE ne >= 2),
             |cells AS (SELECT f AS i, l AS j, count(*)::BIGINT AS n
             |  FROM pairs GROUP BY 1, 2),
             |up AS (SELECT i, j, n AS nij FROM cells WHERE i < j),
             |lo AS (SELECT j AS i, i AS j, n AS nji FROM cells
             |  WHERE i > j),
             |d AS (SELECT coalesce(nij, 0)::BIGINT AS a,
             |  coalesce(nji, 0)::BIGINT AS b
             |  FROM up FULL OUTER JOIN lo USING (i, j)
             |  WHERE coalesce(nij, 0) + coalesce(nji, 0) > 0),
             |tot AS (SELECT count(*)::BIGINT AS n_pairs FROM pairs)
             |SELECT n_pairs,
             |  round(sum(round((a - b)::DOUBLE * (a - b)::DOUBLE
             |    / (a + b)::DOUBLE, 12)::DECIMAL(28,12))::DOUBLE, 6)
             |    AS chi2_r,
             |  count(*)::BIGINT AS df
             |FROM d, tot GROUP BY n_pairs""".stripMargin),
      (s, d) => {
        val k = events(s, d).select(col("user_id"), col("event_type"),
          concat(lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
            lpad(col("event_id").cast("string"), 12, "0")).as("ord"))
        val fl = k.groupBy(col("user_id"))
          .agg(min_by(col("event_type"), col("ord")).as("f"),
            max_by(col("event_type"), col("ord")).as("l"),
            count(lit(1)).as("ne"))
          .where(col("ne") >= 2)
        Calibrate.bowker(fl, "f", "l")
      }),

    // NRI/IDI: does the click-based score reclassify purchasers
    // upward vs the view-based one? Risk classes at 1/3 and 2/3.
    Q("q482_nri_idi",
      Some(s"""WITH $UserSql
              |SELECT sum(y)::BIGINT AS n_events,
              |  sum(1 - y)::BIGINT AS n_nonevents,
              |  CASE WHEN sum(y) > 0 AND sum(1 - y) > 0 THEN
              |  round((sum(CASE WHEN y = 1 AND
              |      (CASE WHEN p2 >= ${1.0 / 3} THEN 1 ELSE 0 END
              |       + CASE WHEN p2 >= ${2.0 / 3} THEN 1 ELSE 0 END) >
              |      (CASE WHEN p1 >= ${1.0 / 3} THEN 1 ELSE 0 END
              |       + CASE WHEN p1 >= ${2.0 / 3} THEN 1 ELSE 0 END)
              |      THEN 1 ELSE 0 END)
              |    - sum(CASE WHEN y = 1 AND
              |      (CASE WHEN p2 >= ${1.0 / 3} THEN 1 ELSE 0 END
              |       + CASE WHEN p2 >= ${2.0 / 3} THEN 1 ELSE 0 END) <
              |      (CASE WHEN p1 >= ${1.0 / 3} THEN 1 ELSE 0 END
              |       + CASE WHEN p1 >= ${2.0 / 3} THEN 1 ELSE 0 END)
              |      THEN 1 ELSE 0 END))::DOUBLE / sum(y)::DOUBLE
              |  - (sum(CASE WHEN y = 0 AND
              |      (CASE WHEN p2 >= ${1.0 / 3} THEN 1 ELSE 0 END
              |       + CASE WHEN p2 >= ${2.0 / 3} THEN 1 ELSE 0 END) >
              |      (CASE WHEN p1 >= ${1.0 / 3} THEN 1 ELSE 0 END
              |       + CASE WHEN p1 >= ${2.0 / 3} THEN 1 ELSE 0 END)
              |      THEN 1 ELSE 0 END)
              |    - sum(CASE WHEN y = 0 AND
              |      (CASE WHEN p2 >= ${1.0 / 3} THEN 1 ELSE 0 END
              |       + CASE WHEN p2 >= ${2.0 / 3} THEN 1 ELSE 0 END) <
              |      (CASE WHEN p1 >= ${1.0 / 3} THEN 1 ELSE 0 END
              |       + CASE WHEN p1 >= ${2.0 / 3} THEN 1 ELSE 0 END)
              |      THEN 1 ELSE 0 END))::DOUBLE
              |    / sum(1 - y)::DOUBLE, 6) END AS nri_r,
              |  CASE WHEN sum(y) > 0 AND sum(1 - y) > 0 THEN
              |  round(sum(CASE WHEN y = 1
              |      THEN round(p2 - p1, 12)::DECIMAL(28,12)
              |      ELSE 0::DECIMAL(28,12) END)::DOUBLE
              |      / sum(y)::DOUBLE
              |    - sum(CASE WHEN y = 0
              |      THEN round(p2 - p1, 12)::DECIMAL(28,12)
              |      ELSE 0::DECIMAL(28,12) END)::DOUBLE
              |      / sum(1 - y)::DOUBLE, 6) END AS idi_r
              |FROM p""".stripMargin),
      (s, d) => Calibrate.nriIdi(userSpark(s, d), "p1", "p2", "y",
        Seq(1.0 / 3, 2.0 / 3))))
}
