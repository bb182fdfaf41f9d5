package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Infer
import graft.util.Tables._

/** Reliability / effect-size batch ([[graft.ops.Infer]] round-9
  * additions): Bartlett's variance homogeneity (the parametric twin of
  * q296), ICC(1) measurement reliability, Cronbach's α internal
  * consistency over the user × event-type grid, and Cohen's d /
  * Hedges' g — the effect size that belongs next to q198/q231's
  * significance tests. All from exact integer moments with 12-dp
  * DECIMAL cross-cell sums.
  */
object ReliabilityQueries {

  val all: Seq[Q] = Seq(

    // Bartlett χ² across day-of-week cells of daily counts per type:
    // "do weekdays differ in volatility" under normality — publish
    // next to q296's robust Brown–Forsythe.
    Q("q320_bartlett",
      Some("""WITH daily AS (
             |  SELECT event_type, ts::DATE AS day, count(*)::BIGINT
             |    AS x
             |  FROM events GROUP BY 1, 2),
             |u AS (SELECT event_type, dayofweek(day) AS dow, x
             |      FROM daily),
             |cell AS (
             |  SELECT event_type, dow, count(*)::BIGINT AS nc,
             |    sum(x)::BIGINT AS sc, sum(x::HUGEINT * x) AS ssc
             |  FROM u GROUP BY 1, 2 HAVING count(*) > 1),
             |c2 AS (
             |  SELECT event_type, nc, sc, ssc,
             |    (ssc::DOUBLE - sc::DOUBLE * sc::DOUBLE / nc::DOUBLE)
             |      / (nc::DOUBLE - 1) AS s2
             |  FROM cell),
             |g AS (
             |  SELECT event_type, sum(nc)::BIGINT AS n,
             |    count(*)::BIGINT AS k, sum(ssc) AS ss,
             |    sum(round(sc::DOUBLE * sc::DOUBLE / nc::DOUBLE, 12)
             |      ::DECIMAL(28,12)) AS t12,
             |    sum(CASE WHEN s2 > 0 THEN
             |      round((nc::DOUBLE - 1) * ln(s2), 12)
             |        ::DECIMAL(28,12) END) AS lt,
             |    sum(round(1.0 / (nc::DOUBLE - 1), 12)
             |      ::DECIMAL(28,12)) AS inv,
             |    min(s2) AS mins2
             |  FROM c2 GROUP BY 1)
             |SELECT event_type, n, k,
             |  CASE WHEN k > 1 AND n > k AND mins2 > 0
             |      AND ss::DOUBLE - t12::DOUBLE > 0 THEN
             |    round(((n::DOUBLE - k::DOUBLE)
             |        * ln((ss::DOUBLE - t12::DOUBLE)
             |          / (n::DOUBLE - k::DOUBLE)) - lt::DOUBLE)
             |      / (1.0 + (inv::DOUBLE
             |          - 1.0 / (n::DOUBLE - k::DOUBLE))
             |        / (3.0 * (k::DOUBLE - 1))), 6) END AS chi2_r
             |FROM g ORDER BY event_type""".stripMargin),
      (s, d) => Infer.bartlett(
          events(s, d)
            .groupBy(col("event_type"), to_date(col("ts")).as("day"))
            .agg(count(lit(1)).as("x"))
            .select(col("event_type"),
              (dayofweek(col("day")) - 1).as("dow"), col("x")),
          "event_type", "dow", "x")
        .orderBy("event_type")),

    // ICC(1) per event type with users as cells: how much of the
    // daily-count variance is BETWEEN users — "is one day enough to
    // characterize a user's rate".
    Q("q321_icc",
      Some("""WITH grid AS (
             |  SELECT event_type, user_id, ts::DATE AS day,
             |    count(*)::BIGINT AS x
             |  FROM events GROUP BY 1, 2, 3),
             |cell AS (
             |  SELECT event_type, user_id, count(*)::BIGINT AS nc,
             |    sum(x)::BIGINT AS sc, sum(x::HUGEINT * x) AS ssc
             |  FROM grid GROUP BY 1, 2),
             |g AS (
             |  SELECT event_type, sum(nc)::BIGINT AS n,
             |    count(*)::BIGINT AS k, sum(sc)::BIGINT AS s,
             |    sum(ssc) AS ss, sum(nc::HUGEINT * nc) AS nc2,
             |    sum(round(sc::DOUBLE * sc::DOUBLE / nc::DOUBLE, 12)
             |      ::DECIMAL(28,12)) AS t12
             |  FROM cell GROUP BY 1)
             |SELECT event_type, n, k,
             |  CASE WHEN k > 1 AND n > k THEN
             |    round((n::DOUBLE - nc2::DOUBLE / n::DOUBLE)
             |      / (k::DOUBLE - 1), 6) END AS n0_r,
             |  CASE WHEN k > 1 AND n > k
             |      AND (t12::DOUBLE - s::DOUBLE * s::DOUBLE
             |          / n::DOUBLE) / (k::DOUBLE - 1)
             |        + ((n::DOUBLE - nc2::DOUBLE / n::DOUBLE)
             |            / (k::DOUBLE - 1) - 1)
             |          * ((ss::DOUBLE - t12::DOUBLE)
             |            / (n::DOUBLE - k::DOUBLE)) > 0 THEN
             |    round(((t12::DOUBLE - s::DOUBLE * s::DOUBLE
             |          / n::DOUBLE) / (k::DOUBLE - 1)
             |        - (ss::DOUBLE - t12::DOUBLE)
             |          / (n::DOUBLE - k::DOUBLE))
             |      / ((t12::DOUBLE - s::DOUBLE * s::DOUBLE
             |          / n::DOUBLE) / (k::DOUBLE - 1)
             |        + ((n::DOUBLE - nc2::DOUBLE / n::DOUBLE)
             |            / (k::DOUBLE - 1) - 1)
             |          * ((ss::DOUBLE - t12::DOUBLE)
             |            / (n::DOUBLE - k::DOUBLE))), 6) END AS icc_r
             |FROM g ORDER BY event_type""".stripMargin),
      (s, d) => Infer.icc1(
          events(s, d)
            .groupBy(col("event_type"), col("user_id"),
              to_date(col("ts")).as("day"))
            .agg(count(lit(1)).as("x")),
          "event_type", "user_id", "x")
        .orderBy("event_type")),

    // Cronbach's α of the 5 event-type counts as one "activity scale"
    // per user (zero-filled grid): do the item counts co-vary enough
    // to summarize as a single score.
    Q("q322_cronbach_alpha",
      Some("""WITH users AS (SELECT DISTINCT user_id FROM events),
             |types AS (SELECT DISTINCT event_type FROM events),
             |cnt AS (
             |  SELECT user_id, event_type, count(*)::BIGINT AS x
             |  FROM events GROUP BY 1, 2),
             |grid AS (
             |  SELECT u.user_id, t.event_type,
             |    coalesce(c.x, 0)::BIGINT AS x
             |  FROM users u CROSS JOIN types t
             |  LEFT JOIN cnt c ON c.user_id = u.user_id
             |    AND c.event_type = t.event_type),
             |item AS (
             |  SELECT event_type, count(*)::BIGINT AS n,
             |    sum(x)::BIGINT AS s, sum(x::HUGEINT * x) AS ss
             |  FROM grid GROUP BY 1),
             |items AS (
             |  SELECT count(*)::BIGINT AS k_items,
             |    sum(round(ss::DOUBLE / n::DOUBLE
             |      - (s::DOUBLE / n::DOUBLE) * (s::DOUBLE / n::DOUBLE),
             |      12)::DECIMAL(28,12))::DOUBLE AS sumvar
             |  FROM item),
             |subj AS (SELECT user_id, sum(x)::BIGINT AS tot FROM grid
             |         GROUP BY 1),
             |tots AS (
             |  SELECT count(*)::BIGINT AS n_subjects,
             |    sum(tot)::BIGINT AS ts, sum(tot::HUGEINT * tot) AS tss
             |  FROM subj)
             |SELECT n_subjects, k_items,
             |  round(sumvar, 6) AS sum_item_var_r,
             |  round(tss::DOUBLE / n_subjects::DOUBLE
             |    - (ts::DOUBLE / n_subjects::DOUBLE)
             |      * (ts::DOUBLE / n_subjects::DOUBLE), 6)
             |    AS total_var_r,
             |  CASE WHEN k_items > 1
             |      AND tss::DOUBLE / n_subjects::DOUBLE
             |        - (ts::DOUBLE / n_subjects::DOUBLE)
             |          * (ts::DOUBLE / n_subjects::DOUBLE) > 0 THEN
             |    round(k_items::DOUBLE / (k_items::DOUBLE - 1)
             |      * (1.0 - sumvar / (tss::DOUBLE
             |          / n_subjects::DOUBLE
             |        - (ts::DOUBLE / n_subjects::DOUBLE)
             |          * (ts::DOUBLE / n_subjects::DOUBLE))), 6) END
             |    AS alpha_r
             |FROM tots, items""".stripMargin),
      (s, d) => {
        val ev = events(s, d)
        val users = ev.select(col("user_id")).distinct()
        val types = ev.select(col("event_type")).distinct()
        val cnt = ev.groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("_x"))
        val grid = users.crossJoin(broadcast(types))
          .join(cnt, Seq("user_id", "event_type"), "left")
          .select(col("user_id"), col("event_type"),
            coalesce(col("_x"), lit(0L)).as("x"))
        Infer.cronbachAlpha(grid, "user_id", "event_type", "x")
      }),

    // Cohen's d + Hedges' g of per-user event volume between the md5
    // arms (q274's assignment): the effect-size companion to the A/B
    // significance readouts.
    Q("q323_cohens_d",
      Some("""WITH u AS (
             |  SELECT user_id, count(*)::BIGINT AS x,
             |    ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT
             |      % 100 >= 50 AS armb
             |  FROM events GROUP BY 1),
             |a AS (
             |  SELECT
             |    sum(CASE WHEN armb THEN 1 ELSE 0 END)::BIGINT AS n_t,
             |    sum(CASE WHEN armb THEN x END)::BIGINT AS st,
             |    sum(CASE WHEN armb THEN x::HUGEINT * x END) AS sst,
             |    sum(CASE WHEN NOT armb THEN 1 ELSE 0 END)::BIGINT
             |      AS n_c,
             |    sum(CASE WHEN NOT armb THEN x END)::BIGINT AS sc,
             |    sum(CASE WHEN NOT armb THEN x::HUGEINT * x END) AS ssc
             |  FROM u),
             |p AS (
             |  SELECT n_t, n_c,
             |    st::DOUBLE / n_t::DOUBLE AS mt,
             |    sc::DOUBLE / n_c::DOUBLE AS mc,
             |    (sst::DOUBLE - st::DOUBLE * st::DOUBLE / n_t::DOUBLE
             |      + ssc::DOUBLE - sc::DOUBLE * sc::DOUBLE
             |        / n_c::DOUBLE)
             |      / (n_t::DOUBLE + n_c::DOUBLE - 2) AS pooled
             |  FROM a)
             |SELECT n_t, n_c,
             |  CASE WHEN n_t > 0 THEN round(mt, 6) END AS mean_t_r,
             |  CASE WHEN n_c > 0 THEN round(mc, 6) END AS mean_c_r,
             |  CASE WHEN n_t > 1 AND n_c > 1 AND pooled > 0 THEN
             |    round((mt - mc) / sqrt(pooled), 6) END AS d_r,
             |  CASE WHEN n_t > 1 AND n_c > 1 AND pooled > 0 THEN
             |    round((mt - mc) / sqrt(pooled)
             |      * (1.0 - 3.0 / (4.0 * (n_t::DOUBLE + n_c::DOUBLE)
             |        - 9)), 6) END AS g_r
             |FROM p""".stripMargin),
      (s, d) => Infer.cohensD(
        events(s, d).groupBy(col("user_id"))
          .agg(count(lit(1)).as("x"))
          .withColumn("armb",
            conv(substring(md5(col("user_id").cast("string")), 1, 8),
              16, 10).cast("long") % 100 >= 50),
        col("armb"), "x")))
}
