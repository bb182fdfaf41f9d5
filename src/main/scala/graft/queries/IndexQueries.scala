package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Behavior, CorpusAudit, Infer, Similarity, TimeSeries}
import graft.util.Tables._

/** Round-11 index/monitor batch: Pocock group-sequential monitoring
  * (q398), capture–recapture corpus-size estimation (q399),
  * contrastive triplet mining (q400), the Fisher price-index triplet
  * (q401), and the Simpson's-paradox audit (q402).
  */
object IndexQueries {

  private val PocockK5 = 2.413 // published Pocock boundary, K=5, α=.05

  val all: Seq[Q] = Seq(

    // Pocock group-sequential conversion monitor: five weekly looks at
    // the parity-arm purchase-conversion z against the constant 2.413
    // boundary - peeking with an alpha budget instead of the naive
    // repeated 1.96 test.
    Q("q398_pocock_monitor",
      Some(s"""WITH d0 AS (SELECT min(ts::DATE) AS d0 FROM events),
              |u AS MATERIALIZED (
              |  SELECT user_id,
              |    datediff('day', d0.d0,
              |      min(CASE WHEN event_type = 'purchase' THEN ts END)
              |        ::DATE) AS cvd
              |  FROM events, d0 GROUP BY user_id, d0.d0),
              |looks AS (SELECT unnest(generate_series(1, 5)) AS look),
              |g AS MATERIALIZED (
              |  SELECT l.look,
              |    sum(CASE WHEN u.user_id % 2 = 0 THEN 1 ELSE 0 END)
              |      ::BIGINT AS n1,
              |    sum(CASE WHEN u.user_id % 2 <> 0 THEN 1 ELSE 0 END)
              |      ::BIGINT AS n0,
              |    sum(CASE WHEN u.user_id % 2 = 0 AND u.cvd IS NOT NULL
              |      AND u.cvd <= 7 * l.look - 1 THEN 1 ELSE 0 END)
              |      ::BIGINT AS c1,
              |    sum(CASE WHEN u.user_id % 2 <> 0 AND u.cvd IS NOT NULL
              |      AND u.cvd <= 7 * l.look - 1 THEN 1 ELSE 0 END)
              |      ::BIGINT AS c0
              |  FROM u, looks l GROUP BY 1)
              |SELECT look, n1, n0, c1, c0,
              |  round((c1::DOUBLE / n1::DOUBLE - c0::DOUBLE / n0::DOUBLE)
              |    / nullif(sqrt(((c1 + c0)::DOUBLE / (n1 + n0)::DOUBLE)
              |      * (1.0 - (c1 + c0)::DOUBLE / (n1 + n0)::DOUBLE)
              |      * (1.0 / n1 + 1.0 / n0)), 0.0), 6) AS z_r,
              |  abs((c1::DOUBLE / n1::DOUBLE - c0::DOUBLE / n0::DOUBLE)
              |    / nullif(sqrt(((c1 + c0)::DOUBLE / (n1 + n0)::DOUBLE)
              |      * (1.0 - (c1 + c0)::DOUBLE / (n1 + n0)::DOUBLE)
              |      * (1.0 / n1 + 1.0 / n0)), 0.0)) > $PocockK5
              |    AS crossed
              |FROM g ORDER BY look""".stripMargin),
      (s, d) => {
        val ev = events(s, d)
        val mn = ev.agg(min(col("ts").cast("date")).as("_d0"))
        val units = ev.groupBy(col("user_id"))
          .agg(min(when(col("event_type") === "purchase", col("ts")))
            .as("_fp"))
          .crossJoin(broadcast(mn))
          .select(col("user_id"),
            datediff(col("_fp").cast("date"), col("_d0")).as("_cvd"))
        Infer.pocockMonitor(units, col("user_id") % 2 === 0, "_cvd",
          (1 to 5).map(k => (k, lit(7 * k - 1))), PocockK5)
      }),

    // Capture-recapture (Chapman) corpus-size estimate from two salted
    // md5 "crawls" of the distinct-content universe, audited against
    // the exact distinct count while it is still computable.
    Q("q399_capture_recapture",
      Some("""WITH dist AS MATERIALIZED (
             |  SELECT DISTINCT md5(text) AS h FROM documents),
             |s AS MATERIALIZED (
             |  SELECT
             |    ((('0x' || substr(md5('cap1:' || h), 1, 15))::BIGINT
             |      ::DOUBLE + 1.0) / 1152921504606846976.0) < 0.6 AS a,
             |    ((('0x' || substr(md5('cap2:' || h), 1, 15))::BIGINT
             |      ::DOUBLE + 1.0) / 1152921504606846976.0) < 0.6 AS b
             |  FROM dist),
             |m AS (
             |  SELECT count(*)::BIGINT AS n_true,
             |    sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS n1,
             |    sum(CASE WHEN b THEN 1 ELSE 0 END)::BIGINT AS n2,
             |    sum(CASE WHEN a AND b THEN 1 ELSE 0 END)::BIGINT AS m
             |  FROM s)
             |SELECT n_true, n1, n2, m,
             |  round((n1::DOUBLE + 1) * (n2::DOUBLE + 1)
             |    / (m::DOUBLE + 1) - 1, 6) AS chapman_r,
             |  round(sqrt((n1::DOUBLE + 1) * (n2::DOUBLE + 1)
             |    * (n1::DOUBLE - m::DOUBLE) * (n2::DOUBLE - m::DOUBLE)
             |    / ((m::DOUBLE + 1) * (m::DOUBLE + 1)
             |      * (m::DOUBLE + 2))), 6) AS se_r,
             |  round(((n1::DOUBLE + 1) * (n2::DOUBLE + 1)
             |      / (m::DOUBLE + 1) - 1 - n_true::DOUBLE)
             |    / n_true::DOUBLE, 6) AS rel_err_r
             |FROM m""".stripMargin),
      (s, d) => CorpusAudit.captureRecapture(documents(s, d), "text",
        0.6, 0.6)),

    // Contrastive triplet mining: per anchor, the nearest same-label
    // positive and the nearest wrong-label hard negative from one pair
    // scan; margin = sim_pos - sim_neg is what a triplet loss trains.
    Q("q400_triplet_mining",
      Some("""WITH p AS MATERIALIZED (
             |  SELECT q.vec_id AS aid, q.label AS albl,
             |    e.vec_id AS nid, e.label AS nlbl,
             |    list_cosine_similarity(e.embedding::DOUBLE[],
             |      q.embedding::DOUBLE[]) AS sim
             |  FROM embeddings e, embeddings q
             |  WHERE e.vec_id <> q.vec_id),
             |best AS MATERIALIZED (
             |  SELECT aid, albl, nid, nlbl, sim,
             |    row_number() OVER (PARTITION BY aid, (nlbl = albl)
             |      ORDER BY sim DESC, nid) AS rn
             |  FROM p WHERE sim IS NOT NULL),
             |pos AS (SELECT aid, albl AS label, nid AS pos_id,
             |          round(sim, 9) AS sim_pos_r
             |        FROM best WHERE rn = 1 AND nlbl = albl),
             |neg AS (SELECT aid, nid AS neg_id,
             |          round(sim, 9) AS sim_neg_r
             |        FROM best WHERE rn = 1 AND nlbl <> albl)
             |SELECT p.aid AS anchor_id, p.label, p.pos_id, p.sim_pos_r,
             |  n.neg_id, n.sim_neg_r,
             |  round(p.sim_pos_r - n.sim_neg_r, 9) AS margin_r
             |FROM pos p JOIN neg n USING (aid)
             |ORDER BY anchor_id""".stripMargin),
      (s, d) => Similarity.tripletMining(embeddings(s, d))
        .orderBy("anchor_id")),

    // Fisher price-index triplet per month over the matched-model
    // (part, month) grain: Laspeyres / Paasche / Fisher vs the first
    // month - index-number theory as one pass + bounded-grain joins.
    Q("q401_price_index",
      Some("""WITH pm AS MATERIALIZED (
             |  SELECT l_partkey AS i, strftime(l_shipdate, '%Y-%m') AS m,
             |    sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             |      ::BIGINT AS c,
             |    sum(CAST(l_quantity AS BIGINT))::BIGINT AS q
             |  FROM lineitem GROUP BY 1, 2),
             |pp AS MATERIALIZED (
             |  SELECT i, m, c::DOUBLE / q::DOUBLE AS p, q FROM pm),
             |m0 AS (SELECT min(m) AS m0 FROM pp),
             |base AS MATERIALIZED (
             |  SELECT i, p AS p0, q AS q0 FROM pp, m0 WHERE pp.m = m0.m0),
             |j AS MATERIALIZED (
             |  SELECT pp.m, pp.p, pp.q, b.p0, b.q0
             |  FROM pp JOIN base b USING (i), m0
             |  WHERE pp.m <> m0.m0)
             |SELECT m AS month, count(*)::BIGINT AS n_items,
             |  round(sum(round(p * q0, 12)::DECIMAL(28,12))::DOUBLE
             |    / sum(round(p0 * q0, 12)::DECIMAL(28,12))::DOUBLE, 6)
             |    AS laspeyres_r,
             |  round(sum(round(p * q, 12)::DECIMAL(28,12))::DOUBLE
             |    / sum(round(p0 * q, 12)::DECIMAL(28,12))::DOUBLE, 6)
             |    AS paasche_r,
             |  round(sqrt((sum(round(p * q0, 12)::DECIMAL(28,12))::DOUBLE
             |      / sum(round(p0 * q0, 12)::DECIMAL(28,12))::DOUBLE)
             |    * (sum(round(p * q, 12)::DECIMAL(28,12))::DOUBLE
             |      / sum(round(p0 * q, 12)::DECIMAL(28,12))::DOUBLE)), 6)
             |    AS fisher_r
             |FROM j GROUP BY 1 ORDER BY month""".stripMargin),
      (s, d) => TimeSeries.priceIndexFisher(
        lineitem(s, d).select(col("l_partkey"),
          date_format(col("l_shipdate"), "yyyy-MM").as("_m"),
          round(col("l_extendedprice") * 100).cast("long").as("_cents"),
          col("l_quantity").cast("long").as("_qty")),
        "l_partkey", "_m", "_cents", "_qty").orderBy("month")),

    // Simpson's-paradox audit: pooled order-value trend vs per-segment
    // trends - when the aggregate sign contradicts every segment, the
    // "overall" number is a mix artifact.
    Q("q402_simpson_audit",
      Some("""WITH b AS MATERIALIZED (
             |  SELECT c_mktsegment AS seg,
             |    datediff('day', DATE '1992-01-01', o_orderdate)::DOUBLE
             |      AS x,
             |    CAST(round(o_totalprice * 100) AS BIGINT)::DOUBLE AS y
             |  FROM orders JOIN customer ON o_custkey = c_custkey),
             |seg AS MATERIALIZED (
             |  SELECT seg::VARCHAR AS segment, count(*)::BIGINT AS n,
             |    round((count(*) * sum(round(x * y, 12)
             |        ::DECIMAL(28,12))::DOUBLE
             |      - sum(round(x, 12)::DECIMAL(28,12))::DOUBLE
             |        * sum(round(y, 12)::DECIMAL(28,12))::DOUBLE)
             |      / nullif(count(*) * sum(round(x * x, 12)
             |        ::DECIMAL(28,12))::DOUBLE
             |      - sum(round(x, 12)::DECIMAL(28,12))::DOUBLE
             |        * sum(round(x, 12)::DECIMAL(28,12))::DOUBLE, 0.0),
             |      6) AS slope_r
             |  FROM b GROUP BY 1),
             |pooled AS MATERIALIZED (
             |  SELECT '(pooled)' AS segment, count(*)::BIGINT AS n,
             |    round((count(*) * sum(round(x * y, 12)
             |        ::DECIMAL(28,12))::DOUBLE
             |      - sum(round(x, 12)::DECIMAL(28,12))::DOUBLE
             |        * sum(round(y, 12)::DECIMAL(28,12))::DOUBLE)
             |      / nullif(count(*) * sum(round(x * x, 12)
             |        ::DECIMAL(28,12))::DOUBLE
             |      - sum(round(x, 12)::DECIMAL(28,12))::DOUBLE
             |        * sum(round(x, 12)::DECIMAL(28,12))::DOUBLE, 0.0),
             |      6) AS slope_r
             |  FROM b),
             |flag AS (
             |  SELECT count(*) = sum(CASE WHEN s.slope_r <> 0
             |      AND p.slope_r <> 0
             |      AND sign(s.slope_r) <> sign(p.slope_r)
             |    THEN 1 ELSE 0 END) AS paradox
             |  FROM seg s, pooled p)
             |SELECT u.segment, u.n, u.slope_r, f.paradox
             |FROM (SELECT * FROM seg UNION ALL SELECT * FROM pooled) u,
             |  flag f
             |ORDER BY segment""".stripMargin),
      (s, d) => Behavior.simpsonAudit(
        orders(s, d).join(customer(s, d),
          col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("_seg"),
            datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
              .cast("double").as("_x"),
            round(col("o_totalprice") * 100).cast("long").cast("double")
              .as("_y")),
        "_seg", "_x", "_y"))
  )
}
