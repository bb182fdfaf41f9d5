package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Behavior
import graft.streaming.Streams
import graft.util.Tables._

/** Behavioral-chain batch: watermark-bounded streaming dedup (the only
  * dedup state shape that survives an unbounded stream), the Markov
  * chain's two-step transition matrix, and per-entity behavioral
  * entropy ([[graft.streaming.Streams]], [[graft.ops.Behavior]]).
  */
object ChainQueries {

  val all: Seq[Q] = Seq(

    // dropDuplicatesWithinWatermark: dedup state EVICTED past the
    // 2-hour horizon (vs q37's unbounded dropDuplicates state). Over
    // the finite fixture every duplicate is inside the horizon, so the
    // per-type counts equal batch DISTINCT.
    Q("q237_stream_dedup_watermark",
      Some("""SELECT event_type, count(DISTINCT event_id) AS n
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => Streams.streamingDedupCountsWithinWatermark(s, d,
          "2 hours")
        .orderBy("event_type")),

    // P²: two-step transition probabilities composed from the q90
    // first-order matrix; 12-dp DECIMAL middle-state reduction.
    Q("q238_two_step_transitions",
      Some("""WITH seq AS (
             |  SELECT user_id, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS prev
             |  FROM events),
             |t AS (
             |  SELECT prev AS from_type, event_type AS to_type,
             |    count(*)::BIGINT AS n
             |  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
             |tot AS (
             |  SELECT from_type, sum(n)::BIGINT AS ntot
             |  FROM t GROUP BY 1),
             |p1 AS (
             |  SELECT t.from_type, t.to_type,
             |    t.n::DOUBLE / tot.ntot AS p
             |  FROM t JOIN tot USING (from_type))
             |SELECT a.from_type, b.to_type,
             |  round(sum(round(a.p * b.p, 12)::DECIMAL(28,12))::DOUBLE, 6)
             |    AS p2_r
             |FROM p1 a JOIN p1 b ON a.to_type = b.from_type
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, d) => Behavior.twoStepTransitions(events(s, d), "user_id",
          "event_type", Seq(col("ts"), col("event_id")))
        .orderBy("from_type", "to_type")),

    // Per-user behavioral entropy over event types (+ ln(k)-normalized;
    // null for single-type users): 12-dp DECIMAL −p·ln p reduction.
    Q("q239_user_entropy",
      Some("""WITH grain AS (
             |  SELECT user_id, event_type, count(*)::BIGINT AS c
             |  FROM events GROUP BY 1, 2),
             |terms AS (
             |  SELECT user_id, c,
             |    sum(c) OVER (PARTITION BY user_id)::BIGINT AS n,
             |    c::DOUBLE / sum(c) OVER (PARTITION BY user_id) AS p
             |  FROM grain)
             |SELECT user_id, max(n)::BIGINT AS n_events,
             |  count(*)::BIGINT AS n_types,
             |  round(sum(round(-p * ln(p), 12)::DECIMAL(28,12))::DOUBLE, 6)
             |    AS entropy_r,
             |  CASE WHEN count(*) > 1
             |    THEN round(sum(round(-p * ln(p), 12)::DECIMAL(28,12))
             |      ::DOUBLE / ln(count(*)::DOUBLE), 6)
             |  END AS entropy_norm_r
             |FROM terms GROUP BY 1 ORDER BY user_id""".stripMargin),
      (s, d) => Behavior.entityEntropy(events(s, d), "user_id",
          "event_type")
        .orderBy("user_id")))
}
