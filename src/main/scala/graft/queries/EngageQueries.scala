package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Behavior, Graphs}
import graft.util.Tables._

/** Engagement & seed-expansion batch: conversion-window funnel,
  * DAU/MAU stickiness, and personalized PageRank from a seed set
  * ([[graft.ops.Behavior]], [[graft.ops.Graphs.personalizedPageRank]]).
  */
object EngageQueries {

  private val FunnelWindowUs = 6L * 3600 * 1000000 // 6 hours

  private val PprIters = 3
  private val PprDamping = 0.85
  private val PprSeeds = 3

  /** PART co-occurrence graph (support ≥ 2) — shared with q224/q225. */
  private val partEdges =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
      |e0 AS (
      |  SELECT a.i AS src, b.i AS dst
      |  FROM items a JOIN items b ON a.g = b.g AND a.i < b.i
      |  GROUP BY 1, 2 HAVING count(*) >= 2)""".stripMargin

  val all: Seq[Q] = Seq(

    // view → click → purchase with a 6-hour deadline per step: stage
    // times are chained window mins over epoch micros, each bounded by
    // the previous stage's time + the window.
    Q("q243_windowed_funnel",
      Some(s"""WITH e AS (
              |  SELECT user_id, event_type, epoch_us(ts) AS us
              |  FROM events),
              |t1s AS (
              |  SELECT user_id, event_type, us,
              |    min(CASE WHEN event_type = 'view' THEN us END)
              |      OVER (PARTITION BY user_id) AS t1
              |  FROM e),
              |t2s AS (
              |  SELECT user_id, event_type, us, t1,
              |    min(CASE WHEN event_type = 'click' AND us > t1
              |        AND us <= t1 + $FunnelWindowUs THEN us END)
              |      OVER (PARTITION BY user_id) AS t2
              |  FROM t1s),
              |t3s AS (
              |  SELECT user_id, t1, t2,
              |    min(CASE WHEN event_type = 'purchase' AND us > t2
              |        AND us <= t2 + $FunnelWindowUs THEN us END)
              |      OVER (PARTITION BY user_id) AS t3
              |  FROM t2s)
              |SELECT user_id,
              |  max(CASE WHEN t3 IS NOT NULL THEN 3
              |           WHEN t2 IS NOT NULL THEN 2
              |           WHEN t1 IS NOT NULL THEN 1 ELSE 0 END)
              |    AS funnel_stage
              |FROM t3s GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, d) => Behavior.funnelWithin(events(s, d), "user_id",
          "event_type", "ts", Seq("view", "click", "purchase"),
          FunnelWindowUs)
        .orderBy("user_id")),

    // DAU / trailing-30-day MAU per observed day: distinct day-grain
    // reduce + bounded window fan-out (q92's shape), exact BIGINT
    // ratio.
    Q("q244_dau_mau",
      Some("""WITH du AS (
             |  SELECT DISTINCT ts::DATE AS day, user_id FROM events),
             |dau AS (
             |  SELECT day AS window_day, count(*)::BIGINT AS dau
             |  FROM du GROUP BY 1),
             |mau AS (
             |  SELECT d.window_day, count(DISTINCT du.user_id)::BIGINT
             |      AS mau
             |  FROM (SELECT DISTINCT day AS window_day FROM du) d
             |  JOIN du ON du.day BETWEEN d.window_day - 29
             |    AND d.window_day
             |  GROUP BY 1)
             |SELECT dau.window_day, dau.dau, mau.mau,
             |  round(dau.dau::DOUBLE / mau.mau, 6) AS stickiness_r
             |FROM dau JOIN mau USING (window_day)
             |ORDER BY window_day""".stripMargin),
      (s, d) => Behavior.stickiness(events(s, d), "user_id", "ts", 30)
        .orderBy("window_day")),

    // Personalized PageRank from the 3 smallest part-graph vertices
    // (3 unrolled iterations, damping 0.85): restart mass only to
    // seeds, sparse rank frontier.
    Q("q245_ppr",
      Some {
        val restart = s"${1.0 / PprSeeds}"
        val iterCtes = (1 to PprIters).map { i =>
          s"""i$i AS (
             |  SELECT s.dst AS vertex, sum(r.pr / d.deg) AS m
             |  FROM sym s JOIN r${i - 1} r ON s.src = r.vertex
             |    JOIN deg d ON d.src = s.src
             |  GROUP BY 1),
             |r$i AS (
             |  SELECT coalesce(i.vertex, sd.vertex) AS vertex,
             |    ${1.0 - PprDamping} * coalesce(
             |      CASE WHEN sd.vertex IS NOT NULL THEN $restart END,
             |      0.0)
             |    + $PprDamping * coalesce(i.m, 0.0) AS pr
             |  FROM i$i i FULL OUTER JOIN seeds sd
             |    ON i.vertex = sd.vertex)""".stripMargin
        }.mkString(",\n")
        s"""$partEdges,
           |sym AS (SELECT src, dst FROM e0
           |        UNION ALL SELECT dst, src FROM e0),
           |deg AS (SELECT src, count(*)::BIGINT AS deg
           |        FROM sym GROUP BY 1),
           |seeds AS (SELECT src AS vertex FROM deg
           |          ORDER BY src LIMIT $PprSeeds),
           |r0 AS (SELECT vertex, $restart AS pr FROM seeds),
           |$iterCtes
           |SELECT vertex, round(pr, 9) AS ppr
           |FROM r$PprIters ORDER BY vertex""".stripMargin
      },
      (s, d) => {
        // one materialization feeds the seeds scan AND the op's sym/
        // adj builds (harness clearCache reclaims — q214's convention)
        val edges = partEdgeTable(s, d).cache()
        val sym = edges.select(col("src"))
          .union(edges.select(col("dst")))
        val seeds = sym.distinct().orderBy("src").limit(PprSeeds)
        Graphs.personalizedPageRank(edges, seeds, PprIters, PprDamping)
          .orderBy("vertex")
      }))
}
