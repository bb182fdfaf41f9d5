package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Infer, TimeSeries}
import graft.util.Tables._

/** Statistical-inference batch: Welch's unequal-variance t-test,
  * Benjamini–Hochberg FDR control over a segment screen, and
  * time-weighted averaging of irregularly-sampled metrics — the
  * "is this difference real" layer over the engine's aggregates
  * ([[graft.ops.Infer]], [[graft.ops.TimeSeries.timeWeightedAvg]]).
  */
object InferQueries {

  private val BhAlpha = 0.05
  private val normSql = TextQueries.normSql

  val all: Seq[Q] = Seq(

    // Welch t-test per return flag: does the mean extended price (in
    // exact cents) differ between low-discount (arm A, ≤ 5%) and
    // high-discount (arm B) lines? Moments are exact integer sums
    // (Σv² as DECIMAL(38,0)/HUGEINT — overflow-proof), every statistic
    // is one shared double parenthesization, p from the shared A&S
    // normal tail.
    Q("q231_welch_ttest",
      Some(s"""WITH v AS (
              |  SELECT l_returnflag,
              |    l_discount > 0.05 AS armb,
              |    CAST(round(l_extendedprice * 100) AS BIGINT) AS c
              |  FROM lineitem),
              |a AS (
              |  SELECT l_returnflag,
              |    sum(CASE WHEN NOT armb THEN 1 ELSE 0 END)::BIGINT AS n_a,
              |    sum(CASE WHEN NOT armb THEN c END)::DOUBLE AS s_a,
              |    sum(CASE WHEN NOT armb THEN c::HUGEINT * c END)::DOUBLE
              |      AS ss_a,
              |    sum(CASE WHEN armb THEN 1 ELSE 0 END)::BIGINT AS n_b,
              |    sum(CASE WHEN armb THEN c END)::DOUBLE AS s_b,
              |    sum(CASE WHEN armb THEN c::HUGEINT * c END)::DOUBLE
              |      AS ss_b
              |  FROM v GROUP BY 1),
           |m AS (
           |  SELECT l_returnflag, n_a, n_b,
           |    s_a / n_a AS ma, s_b / n_b AS mb,
           |    (ss_a - s_a * s_a / n_a) / (n_a - 1) AS va,
           |    (ss_b - s_b * s_b / n_b) / (n_b - 1) AS vb
           |  FROM a),
           |t AS (
           |  SELECT l_returnflag, n_a, n_b, ma, mb, va, vb,
           |    va / n_a + vb / n_b AS se2,
           |    n_a >= 2 AND n_b >= 2 AND va / n_a + vb / n_b > 0 AS ok,
           |    (mb - ma) / sqrt(va / n_a + vb / n_b) AS tt,
           |    ((n_a - 1) * va + (n_b - 1) * vb) / (n_a + n_b - 2)
           |      AS pooled
           |  FROM m)
           |SELECT l_returnflag, n_a, n_b,
           |  CASE WHEN n_a > 0 THEN round(ma, 6) END AS mean_a_r,
           |  CASE WHEN n_b > 0 THEN round(mb, 6) END AS mean_b_r,
           |  CASE WHEN ok AND pooled > 0
           |    THEN round((mb - ma) / sqrt(pooled), 6) END AS cohen_d_r,
           |  CASE WHEN ok THEN round(tt, 6) END AS t_r,
           |  CASE WHEN ok THEN round(se2 * se2 /
           |      (va / n_a * (va / n_a) / (n_a - 1)
           |       + vb / n_b * (vb / n_b) / (n_b - 1)), 6) END AS df_r,
           |  CASE WHEN ok THEN round(2.0 * (1.0 -
           |      ${Infer.normalCdfSql("abs(tt)")}), 6) END AS p_r
           |FROM t ORDER BY l_returnflag""".stripMargin),
      (s, d) => Infer.welchTTest(
          lineitem(s, d).select(col("l_returnflag"),
            (col("l_discount") > 0.05).as("_arm"),
            round(col("l_extendedprice") * 100).cast("long").as("_c")),
          "l_returnflag", col("_arm"), col("_c"))
        .orderBy("l_returnflag")),

    // Segment screen with FDR control: per event type, a one-sample z
    // of its mean value (1e-6-grid integers) against the global mean,
    // then BH step-up at α=0.05 over the 5-hypothesis table. The BH
    // rank/threshold/discovery columns come from the op; p is flagged
    // UNROUNDED on both engines.
    Q("q232_bh_fdr",
      Some(s"""WITH v AS (
              |  SELECT event_type,
              |    CAST(round(value * 1000000) AS BIGINT) AS v6
              |  FROM events),
              |g AS (
              |  SELECT count(*)::BIGINT AS n, sum(v6)::DOUBLE AS s,
              |    sum(v6::HUGEINT * v6)::DOUBLE AS ss
              |  FROM v),
              |t AS (
              |  SELECT event_type, count(*)::BIGINT AS n_g,
              |    sum(v6)::DOUBLE AS s_g
              |  FROM v GROUP BY 1),
              |z AS (
              |  SELECT event_type, n_g,
              |    (s_g / n_g - s / n)
              |      / sqrt(((ss - s * s / n) / (n - 1)) / n_g) AS z
              |  FROM t, g WHERE (ss - s * s / n) / (n - 1) > 0),
              |p AS (
              |  SELECT event_type, n_g, z,
              |    2.0 * (1.0 - ${Infer.normalCdfSql("abs(z)")}) AS p
              |  FROM z),
              |r AS (
              |  SELECT event_type, n_g, z, p,
              |    row_number() OVER (ORDER BY p, event_type) AS bh_rank,
              |    count(*) OVER () AS m
              |  FROM p)
              |SELECT event_type, n_g, round(z, 6) AS z_r,
              |  round(p, 6) AS p_r, bh_rank,
              |  round(bh_rank * $BhAlpha / m, 6) AS bh_thresh_r,
              |  coalesce(bh_rank <= max(CASE WHEN p <= bh_rank * $BhAlpha / m
              |      THEN bh_rank END) OVER (), false) AS discovery
              |FROM r ORDER BY bh_rank""".stripMargin),
      (s, d) => {
        val v = events(s, d).select(col("event_type"),
          round(col("value") * lit(1000000.0)).cast("long").as("_v6"))
        val g = v.agg(count(lit(1)).as("n"),
          sum(col("_v6")).cast("double").as("s"),
          sum(col("_v6").cast("decimal(38,0)") * col("_v6"))
            .cast("double").as("ss"))
        val t = v.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_g"),
            sum(col("_v6")).cast("double").as("s_g"))
        val vg = (col("ss") - col("s") * col("s") / col("n")) /
          (col("n") - lit(1))
        val z = t.crossJoin(broadcast(g))
          .where(vg > 0)
          .withColumn("z", (col("s_g") / col("n_g") - col("s") / col("n"))
            / sqrt(vg / col("n_g")))
        val p = z.select(col("event_type"), col("n_g"), col("z"),
          (lit(2.0) * (lit(1.0) - Infer.normalCdf(abs(col("z")))))
            .as("p"))
        Infer.bhFdr(p, "p", "event_type", BhAlpha)
          .select(col("event_type"), col("n_g"),
            round(col("z"), 6).as("z_r"), round(col("p"), 6).as("p_r"),
            col("bh_rank"), col("bh_thresh_r"), col("discovery"))
          .orderBy("bh_rank")
      }),

    // Time-weighted average event value per user: piecewise-constant
    // hold, exact DECIMAL(38,0)/HUGEINT v·Δt integration over epoch
    // micros, zero-span keys dropped on both engines.
    Q("q233_time_weighted_avg",
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS us,
             |    CAST(round(value * 1000000) AS BIGINT) AS v6
             |  FROM events),
             |o AS (
             |  SELECT user_id, us, v6,
             |    lead(us) OVER (PARTITION BY user_id
             |      ORDER BY us, event_id) AS nus
             |  FROM e)
             |SELECT user_id, count(*)::BIGINT AS n_events,
             |  (max(us) - min(us))::BIGINT AS span_us,
             |  round(sum(v6::HUGEINT * (nus - us))::DOUBLE
             |    / (max(us) - min(us)) / 1000000.0, 6) AS twa_r
             |FROM o GROUP BY 1 HAVING max(us) - min(us) > 0
             |ORDER BY user_id""".stripMargin),
      (s, d) => TimeSeries.timeWeightedAvg(events(s, d), "user_id",
          "ts", "value", "event_id")
        .orderBy("user_id")),

    // McNemar paired comparison per lang: the q113/q187 hashed-linear
    // classifier (A) vs a length rule (B, n_chars ≥ 200), both
    // predicting the source-parity label ON THE SAME DOCUMENTS — only
    // discordant pairs carry signal. The "is the new quality filter
    // actually better on this corpus" readout a two-sample test can't
    // give (it would throw away the pairing).
    Q("q285_mcnemar",
      Some(s"""WITH s AS (
              |  SELECT lang,
              |    substr(source, 4)::INT % 2 = 0 AS label,
              |    n_chars >= 200 AS bpred,
              |    list_sum(list_transform(string_split($normSql, ' '),
              |      t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 2001
              |        - 1000))::BIGINT > 0 AS apred,
              |    len(string_split($normSql, ' '))::BIGINT AS n
              |  FROM documents),
              |u AS (SELECT lang, apred = label AS ac,
              |        bpred = label AS bc
              |      FROM s WHERE n > 0),
              |a AS (SELECT lang, count(*)::BIGINT AS n,
              |  sum(CASE WHEN ac AND NOT bc THEN 1 ELSE 0 END)::BIGINT
              |    AS b_disc,
              |  sum(CASE WHEN NOT ac AND bc THEN 1 ELSE 0 END)::BIGINT
              |    AS c_disc
              |  FROM u GROUP BY 1)
              |SELECT lang, n, b_disc, c_disc,
              |  CASE WHEN b_disc + c_disc > 0 THEN
              |    round((b_disc - c_disc)::DOUBLE * (b_disc - c_disc)
              |      / (b_disc + c_disc), 6) END AS chi2_r,
              |  CASE WHEN b_disc + c_disc > 0 THEN
              |    round(greatest(abs(b_disc - c_disc) - 1, 0)::DOUBLE
              |      * greatest(abs(b_disc - c_disc) - 1, 0)
              |      / (b_disc + c_disc), 6) END AS chi2_cc_r
              |FROM a ORDER BY lang""".stripMargin),
      (s, d) => {
        val docs = documents(s, d)
        val scored = graft.ops.TextOps
          .hashedLinearScore(docs, "doc_id", "text")
          .select(col("doc_id"), col("n_terms"), col("keep"))
        val units = docs.select(col("doc_id"), col("lang"),
            (substring(col("source"), 4, 8).cast("int") % 2 === 0)
              .as("_label"),
            (col("n_chars") >= 200).as("_bpred"))
          .join(scored, "doc_id")
          .where(col("n_terms") > 0)
          .select(col("lang"),
            (col("keep") === col("_label")).as("_ac"),
            (col("_bpred") === col("_label")).as("_bc"))
        Infer.mcnemar(units, "lang", col("_ac"), col("_bc"))
          .orderBy("lang")
      }),

    // Cochran's Q per lang over THREE quality filters on the same
    // documents (hashed-linear keep, n_chars ≥ 200, token count ≥ 40,
    // all vs the source-parity label) — q285's pairwise question
    // generalized to the whole filter panel in one test.
    Q("q300_cochran_q",
      Some(s"""WITH s AS (
              |  SELECT lang,
              |    substr(source, 4)::INT % 2 = 0 AS label,
              |    n_chars >= 200 AS bpred,
              |    list_sum(list_transform(string_split($normSql, ' '),
              |      t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 2001
              |        - 1000))::BIGINT > 0 AS apred,
              |    len(string_split($normSql, ' '))::BIGINT AS n
              |  FROM documents),
              |u AS (
              |  SELECT lang,
              |    CASE WHEN apred = label THEN 1 ELSE 0 END AS a,
              |    CASE WHEN bpred = label THEN 1 ELSE 0 END AS b,
              |    CASE WHEN (n >= 40) = label THEN 1 ELSE 0 END AS c
              |  FROM s WHERE n > 0),
              |a AS (
              |  SELECT lang, count(*)::BIGINT AS n,
              |    sum(a)::BIGINT AS g1, sum(b)::BIGINT AS g2,
              |    sum(c)::BIGINT AS g3,
              |    sum((a + b + c) * (a + b + c))::BIGINT AS sl2
              |  FROM u GROUP BY 1)
              |SELECT lang, n, g1, g2, g3,
              |  CASE WHEN 3 * (g1 + g2 + g3) - sl2 > 0 THEN
              |    round(2.0 * (3 * (g1 * g1 + g2 * g2 + g3 * g3)
              |        - (g1 + g2 + g3) * (g1 + g2 + g3))::DOUBLE
              |      / (3 * (g1 + g2 + g3) - sl2)::DOUBLE, 6)
              |    END AS q_r
              |FROM a ORDER BY lang""".stripMargin),
      (s, d) => {
        val docs = documents(s, d)
        val scored = graft.ops.TextOps
          .hashedLinearScore(docs, "doc_id", "text")
          .select(col("doc_id"), col("n_terms"), col("keep"))
        val units = docs.select(col("doc_id"), col("lang"),
            (substring(col("source"), 4, 8).cast("int") % 2 === 0)
              .as("_label"),
            (col("n_chars") >= 200).as("_bpred"))
          .join(scored, "doc_id")
          .where(col("n_terms") > 0)
          .select(col("lang"),
            (col("keep") === col("_label")).as("_a"),
            (col("_bpred") === col("_label")).as("_b"),
            ((col("n_terms") >= 40) === col("_label")).as("_c"))
        Infer.cochranQ(units, "lang",
            Seq(col("_a"), col("_b"), col("_c")))
          .orderBy("lang")
      }))
}
