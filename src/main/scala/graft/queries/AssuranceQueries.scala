package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Behavior, Dedup, Infer}
import graft.util.Tables._

/** Round-11 assurance batch: guarantees and their audits — the last-k
  * trail enrichment on `ListState` (q383), split-conformal intervals
  * with measured coverage (q384), the positivity/overlap precondition
  * every IPW estimator assumes (q385), the MinHash estimator-bias
  * calibration table (q386), and Aalen–Johansen cumulative incidence
  * under competing risks (q387).
  */
object AssuranceQueries {

  val all: Seq[Q] = Seq(

    // transformWithState ListState enrichment: each purchase with its
    // <=3 most recent PRIOR purchase ids — bounded per-key state (at
    // most k longs per user, never the history), the "recent context"
    // a recommender join keeps hot.
    Q("q383_tws_trail",
      Some("""SELECT user_id, event_id,
             |  count(*) OVER w3 AS n_prior,
             |  coalesce(string_agg(event_id::VARCHAR, ',') OVER w3, '')
             |    AS trail
             |FROM events WHERE event_type = 'purchase'
             |WINDOW w3 AS (PARTITION BY user_id ORDER BY ts, event_id
             |  ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
             |ORDER BY user_id, event_id""".stripMargin),
      (s, d) => graft.streaming.StatefulTws.lastKTrail(s, d, 3)
        .orderBy("user_id", "event_id")),

    // Split-conformal interval for the lag-1 daily-revenue forecast:
    // q-hat from the md5-parity calibration half, coverage measured on
    // the test half — the finite-sample >=90% guarantee made a number.
    Q("q384_conformal",
      Some("""WITH daily AS MATERIALIZED (
             |  SELECT l_shipdate AS t,
             |    sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             |      ::BIGINT AS cents
             |  FROM lineitem GROUP BY 1),
             |lagd AS MATERIALIZED (
             |  SELECT t, cents, lag(cents) OVER (ORDER BY t) AS yp,
             |    lag(t) OVER (ORDER BY t) AS tp
             |  FROM daily),
             |sc AS MATERIALIZED (
             |  SELECT t, abs(cents - yp)::BIGINT AS s,
             |    ('0x' || substr(md5(t::VARCHAR), 1, 15))::BIGINT % 2 = 0
             |      AS cal
             |  FROM lagd
             |  WHERE yp IS NOT NULL AND date_diff('day', tp, t) = 1),
             |nc AS (SELECT count(*)::BIGINT AS n_cal FROM sc WHERE cal),
             |q AS (
             |  SELECT x.s AS qhat FROM (
             |    SELECT s, row_number() OVER (ORDER BY s, t) AS rn
             |    FROM sc WHERE cal) x, nc
             |  WHERE x.rn = (9 * (nc.n_cal + 1) + 9) // 10)
             |SELECT nc.n_cal, count(*)::BIGINT AS n_test, q.qhat,
             |  round(sum(CASE WHEN s <= q.qhat THEN 1 ELSE 0 END)::DOUBLE
             |    / count(*), 6) AS coverage_r,
             |  round(1.0 - 1.0 / 10, 6) AS target_r
             |FROM sc, nc, q WHERE NOT cal
             |GROUP BY nc.n_cal, q.qhat""".stripMargin),
      (s, d) => {
        val daily = lineitem(s, d)
          .groupBy(col("l_shipdate").as("_t"))
          .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
            .as("_cents"))
        Infer.conformalLag1(daily, "_t", "_cents", 1, 10)
      }),

    // Positivity / overlap audit over activity strata: propensity of
    // the (synthetic parity) treatment per n-events bin, IPW effective
    // sample size, and the out-of-[5%,95%] overlap flags.
    Q("q385_positivity",
      Some("""WITH u AS MATERIALIZED (
             |  SELECT user_id, count(*)::BIGINT AS ne
             |  FROM events GROUP BY 1),
             |b AS MATERIALIZED (
             |  SELECT least(ne // 10, 9)::BIGINT AS bin,
             |    user_id % 2 = 0 AS tr
             |  FROM u),
             |g AS (
             |  SELECT bin, count(*)::BIGINT AS n,
             |    sum(CASE WHEN tr THEN 1 ELSE 0 END)::BIGINT AS n_treated
             |  FROM b GROUP BY 1),
             |c AS (
             |  SELECT bin, n, n_treated,
             |    n_treated::DOUBLE / n::DOUBLE AS p
             |  FROM g),
             |e AS (
             |  SELECT bin, n, n_treated, p,
             |    n_treated::DOUBLE / p
             |      + (n - n_treated)::DOUBLE / (1.0 - p) AS sw,
             |    n_treated::DOUBLE / (p * p)
             |      + (n - n_treated)::DOUBLE / ((1.0 - p) * (1.0 - p))
             |      AS sw2
             |  FROM c)
             |SELECT bin, n, n_treated, round(p, 6) AS p_r,
             |  round(CASE WHEN n_treated > 0 AND n_treated < n
             |    THEN sw * sw / sw2 END, 6) AS ess_r,
             |  (p < 0.05 OR p > 0.95) AS low_overlap
             |FROM e ORDER BY bin""".stripMargin),
      (s, d) => {
        val u = events(s, d).groupBy(col("user_id"))
          .agg(count(lit(1)).as("_ne"))
          .select(least(expr("_ne div 10"), lit(9L)).as("_bin"),
            (col("user_id") % 2 === 0).as("_tr"))
        Behavior.positivityAudit(u, "_bin", col("_tr"))
      }),

    // MinHash estimator-bias calibration: signature-agreement estimate
    // vs exact shingle Jaccard on the LSH candidates, per agreement
    // count — what an LSH threshold MEANS in exact-Jaccard terms here.
    Q("q386_minhash_bias",
      Some(s"""${TextQueries.bandsCte},
              |counts AS (
              |  SELECT doc_id, count(*) AS n FROM hashed GROUP BY doc_id),
              |inter AS (
              |  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
              |  FROM cand c
              |  JOIN hashed ha ON ha.doc_id = c.doc_a
              |  JOIN hashed hb ON hb.doc_id = c.doc_b AND hb.h = ha.h
              |  GROUP BY c.doc_a, c.doc_b),
              |ex AS MATERIALIZED (
              |  SELECT i.doc_a, i.doc_b,
              |    CAST(n_inter AS DOUBLE) / (ca.n + cb.n - n_inter) AS j
              |  FROM inter i
              |   JOIN counts ca ON ca.doc_id = i.doc_a
              |   JOIN counts cb ON cb.doc_id = i.doc_b),
              |m AS MATERIALIZED (
              |  SELECT e.j,
              |    (${(0 until Dedup.NumHashes).map(i =>
                     s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END")
                     .mkString(" + ")})::BIGINT AS est16
              |  FROM ex e JOIN sig a ON a.doc_id = e.doc_a
              |    JOIN sig b ON b.doc_id = e.doc_b)
              |SELECT est16, count(*)::BIGINT AS n_pairs,
              |  round(est16::DOUBLE / ${Dedup.NumHashes}, 6) AS est_r,
              |  round(sum(round(j, 12)::DECIMAL(28,12))::DOUBLE
              |    / count(*), 6) AS mean_exact_r,
              |  round(sum(round(est16::DOUBLE / ${Dedup.NumHashes} - j,
              |    12)::DECIMAL(28,12))::DOUBLE / count(*), 6)
              |    AS mean_bias_r
              |FROM m GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => Dedup.minhashBiasAuditOnShingles(docShingleTable(s, d),
        "doc_id")),

    // Aalen-Johansen cumulative incidence: from signup, FIRST purchase
    // (cause 1) vs FIRST error (cause 2) compete; 1 - KM(all-cause)
    // is NOT "P(purchase by t)" under competing risks — the CIF is.
    Q("q387_aalen_johansen",
      Some("""WITH su AS MATERIALIZED (
             |  SELECT user_id, min(ts) AS t0 FROM events
             |  WHERE event_type = 'signup' GROUP BY 1),
             |fe AS MATERIALIZED (
             |  SELECT user_id, ts, event_type FROM (
             |    SELECT e.user_id, e.ts, e.event_id, e.event_type,
             |      row_number() OVER (PARTITION BY e.user_id
             |        ORDER BY e.ts, e.event_id) AS rn
             |    FROM events e JOIN su USING (user_id)
             |    WHERE e.event_type IN ('purchase', 'error')
             |      AND e.ts >= su.t0) x
             |  WHERE rn = 1),
             |mx AS (SELECT max(ts) AS tmax FROM events),
             |subj AS MATERIALIZED (
             |  SELECT CASE WHEN fe.ts IS NOT NULL
             |      THEN datediff('day', su.t0::DATE, fe.ts::DATE)
             |      ELSE datediff('day', su.t0::DATE, mx.tmax::DATE)
             |    END::BIGINT AS t,
             |    CASE WHEN fe.ts IS NULL THEN 0
             |      WHEN fe.event_type = 'purchase' THEN 1 ELSE 2
             |    END AS cause
             |  FROM su LEFT JOIN fe USING (user_id), mx),
             |perT AS MATERIALIZED (
             |  SELECT t,
             |    sum(CASE WHEN cause = 1 THEN 1 ELSE 0 END)::BIGINT AS d1,
             |    sum(CASE WHEN cause = 2 THEN 1 ELSE 0 END)::BIGINT AS d2,
             |    count(*)::BIGINT AS alln
             |  FROM subj GROUP BY 1),
             |tot AS (SELECT sum(alln)::BIGINT AS n FROM perT),
             |w AS MATERIALIZED (
             |  SELECT t, d1, d2,
             |    (n - coalesce(sum(alln) OVER (ORDER BY t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      )::BIGINT AS n_risk,
             |    alln
             |  FROM perT, tot),
             |f AS MATERIALIZED (
             |  SELECT t, d1, d2, n_risk,
             |    CASE WHEN (n_risk - d1 - d2)::DOUBLE / n_risk > 0
             |      THEN ln((n_risk - d1 - d2)::DOUBLE / n_risk)
             |      ELSE 0.0 END AS lnf
             |  FROM w),
             |sm AS MATERIALIZED (
             |  SELECT t, d1, d2, n_risk,
             |    exp(coalesce(sum(lnf) OVER (ORDER BY t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |      0.0)) AS s_minus
             |  FROM f),
             |cif AS MATERIALIZED (
             |  SELECT t, d1, d2, n_risk, s_minus,
             |    sum(round(s_minus * d1::DOUBLE / n_risk::DOUBLE, 12)
             |      ::DECIMAL(28,12)) OVER (ORDER BY t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      ::DOUBLE AS c1,
             |    sum(round(s_minus * d2::DOUBLE / n_risk::DOUBLE, 12)
             |      ::DECIMAL(28,12)) OVER (ORDER BY t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      ::DOUBLE AS c2
             |  FROM sm)
             |SELECT t, n_risk, d1, d2, round(s_minus, 6) AS s_minus_r,
             |  round(c1, 6) AS cif1_r, round(c2, 6) AS cif2_r
             |FROM cif WHERE d1 + d2 > 0 ORDER BY t""".stripMargin),
      (s, d) => {
        val ev = events(s, d)
        val su = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("_t0"))
        val fe = ev.join(su, Seq("user_id"))
          .where(col("event_type").isin("purchase", "error") &&
            col("ts") >= col("_t0"))
          .groupBy(col("user_id"))
          .agg(min(struct(col("ts"), col("event_id"),
            col("event_type"))).as("_f"))
        val mx = ev.agg(max(col("ts")).as("_tmax"))
        val subj = su.join(fe, Seq("user_id"), "left")
          .crossJoin(broadcast(mx))
          .select(
            when(col("_f").isNotNull,
              datediff(col("_f.ts").cast("date"), col("_t0").cast("date")))
              .otherwise(
                datediff(col("_tmax").cast("date"), col("_t0").cast("date")))
              .cast("long").as("_t"),
            when(col("_f").isNull, 0)
              .when(col("_f.event_type") === "purchase", 1)
              .otherwise(2).as("_cause"))
        Behavior.aalenJohansen(subj, "_t", "_cause").orderBy("t")
      })
  )
}
