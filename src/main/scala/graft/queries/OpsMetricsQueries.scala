package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Behavior, Intervals}
import graft.util.Tables._

/** Ops-metrics batch: time-weighted concurrency percentiles (capacity
  * planning) and the Markov entropy rate of the event process
  * ([[graft.ops.Intervals.concurrencyProfile]],
  * [[graft.ops.Behavior.entropyRate]]).
  */
object OpsMetricsQueries {

  val all: Seq[Q] = Seq(

    // Duration-weighted P50/P95 of concurrent open orders per customer
    // (q105's deterministic intervals): the load DISTRIBUTION, not
    // just its max; integer-exact cum·den ≥ num·span quantile pick.
    Q("q266_concurrency_profile",
      Some("""WITH iv AS (
             |  SELECT o_custkey, o_orderdate AS s,
             |    o_orderdate + (o_orderkey % 7 + 1)::INTEGER
             |      * INTERVAL 1 DAY AS e,
             |    o_orderkey AS tie
             |  FROM orders),
             |b AS (
             |  SELECT o_custkey, s AS ts, 1 AS delta, tie FROM iv
             |  UNION ALL
             |  SELECT o_custkey, e, -1, tie FROM iv),
             |r AS (
             |  SELECT o_custkey, ts,
             |    sum(delta) OVER (PARTITION BY o_custkey
             |      ORDER BY ts, delta, tie
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS conc,
             |    epoch_us(lead(ts) OVER (PARTITION BY o_custkey
             |      ORDER BY ts, delta, tie)) - epoch_us(ts) AS dur
             |  FROM b),
             |segs AS (
             |  SELECT o_custkey, conc, dur FROM r
             |  WHERE dur IS NOT NULL AND dur > 0),
             |ladder AS (
             |  SELECT o_custkey, conc, sum(dur)::BIGINT AS d
             |  FROM segs GROUP BY 1, 2),
             |cums AS (
             |  SELECT o_custkey, conc, d,
             |    sum(d) OVER (PARTITION BY o_custkey ORDER BY conc
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      ::BIGINT AS cum,
             |    sum(d) OVER (PARTITION BY o_custkey)::BIGINT AS span
             |  FROM ladder),
             |picks AS (
             |  SELECT c.o_custkey, p.p_num, c.conc, c.span,
             |    row_number() OVER (PARTITION BY c.o_custkey, p.p_num
             |      ORDER BY c.conc) AS rk
             |  FROM cums c
             |  CROSS JOIN (SELECT 10 AS p_num UNION ALL SELECT 19) p
             |  WHERE c.cum * 20 >= p.p_num * c.span)
             |SELECT o_custkey, p_num::DOUBLE / 20 AS p,
             |  conc::BIGINT AS conc_p, span AS span_us
             |FROM picks WHERE rk = 1
             |ORDER BY o_custkey, p""".stripMargin),
      (s, d) => {
        val iv = orders(s, d).select(col("o_custkey"),
          col("o_orderdate").as("s"),
          date_add(col("o_orderdate"),
            (col("o_orderkey") % 7 + 1).cast("int"))
            .cast("timestamp").as("e"),
          col("o_orderkey").as("tie"))
        Intervals.concurrencyProfile(iv, "o_custkey", "s", "e", "tie",
            pNums = Seq(10, 19), pDen = 20)
          .orderBy("o_custkey", "p")
      }),

    // Entropy rate of the user event chain: per-state conditional
    // entropies + the global H(next|current) — how predictable is the
    // next event.
    Q("q267_entropy_rate",
      Some("""WITH seq AS (
             |  SELECT user_id, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS prev
             |  FROM events),
             |t AS (
             |  SELECT prev AS from_type, event_type AS to_type,
             |    count(*)::BIGINT AS n
             |  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
             |rt AS (
             |  SELECT from_type, to_type, n,
             |    sum(n) OVER (PARTITION BY from_type)::BIGINT AS rtot
             |  FROM t),
             |pf AS (
             |  SELECT from_type, max(rtot)::BIGINT AS n_trans,
             |    count(*)::BIGINT AS n_next,
             |    sum(round(-(n::DOUBLE / rtot) * ln(n::DOUBLE / rtot),
             |      12)::DECIMAL(28,12)) AS h
             |  FROM rt GROUP BY 1),
             |tt AS (
             |  SELECT pf.*, sum(n_trans) OVER ()::BIGINT AS nn
             |  FROM pf),
             |tot AS (
             |  SELECT tt.*,
             |    sum(round(n_trans::DOUBLE / nn * h::DOUBLE, 12)
             |      ::DECIMAL(28,12)) OVER () AS rate
             |  FROM tt)
             |SELECT from_type, n_trans, n_next,
             |  round(h::DOUBLE, 6) AS h_cond_r,
             |  round(rate::DOUBLE, 6) AS entropy_rate_r
             |FROM tot ORDER BY from_type""".stripMargin),
      (s, d) => Behavior.entropyRate(events(s, d), "user_id",
          "event_type", Seq(col("ts"), col("event_id")))
        .orderBy("from_type")))
}
