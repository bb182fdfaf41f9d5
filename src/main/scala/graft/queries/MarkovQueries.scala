package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Markov
import graft.util.Tables._

/** Markov-chain journey batch ([[graft.ops.Markov]]): removal-effect
  * attribution (the model-based successor to q205's positional and
  * q252's decay credit) and the absorption profile of the full chain.
  * Both sides — Spark and the DuckDB oracle — run the SAME fixed
  * 8-step recursion with 12-dp rounding at every step (the oracle
  * unrolls it into generated CTE stages), so the horizon-K quantities
  * are bit-identical across engines.
  */
object MarkovQueries {

  private val Iters = 8

  /** Journey → transition-probability CTEs shared by both queries:
    * per-user sequences truncated at the first purchase, START
    * prepended, END closing non-converting journeys. */
  private val ChainSql =
    """WITH e AS (
      |  SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS rn
      |  FROM events),
      |cu AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'purchase' THEN rn END) AS convrn,
      |    max(rn) AS maxrn
      |  FROM e GROUP BY 1),
      |f AS (
      |  SELECT e.user_id, e.event_type, e.rn, cu.convrn, cu.maxrn
      |  FROM e JOIN cu USING (user_id)
      |  WHERE cu.convrn IS NULL OR e.rn <= cu.convrn),
      |t AS (
      |  SELECT coalesce(lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY rn), 'START') AS from_state,
      |    event_type AS to_state
      |  FROM f
      |  UNION ALL
      |  SELECT event_type, 'END' FROM f
      |  WHERE convrn IS NULL AND rn = maxrn),
      |trans AS (SELECT from_state, to_state, count(*)::BIGINT AS n
      |          FROM t GROUP BY 1, 2),
      |rowtot AS (SELECT from_state, sum(n)::BIGINT AS tot FROM trans
      |           GROUP BY 1),
      |pr AS (
      |  SELECT t.from_state, t.to_state,
      |    round(t.n::DOUBLE / r.tot::DOUBLE, 12) AS p
      |  FROM trans t JOIN rowtot r USING (from_state))""".stripMargin

  /** One unrolled scenario-keyed absorption step (q312). */
  private def scenStep(k: Int): String =
    s"""v$k AS (
       |  SELECT c.scen, c.state, round(c.c + coalesce(s.acc, 0), 12)
       |    AS v
       |  FROM c LEFT JOIN (
       |    SELECT p.scen, p.from_state AS state,
       |      sum(round(p.p * v.v, 12)::DECIMAL(28,12))::DOUBLE AS acc
       |    FROM ptab p JOIN v${k - 1} v
       |      ON v.scen = p.scen AND v.state = p.to_state
       |    GROUP BY 1, 2) s
       |  ON s.scen = c.scen AND s.state = c.state)""".stripMargin

  /** One unrolled single-chain step (q313); `base` is the additive
    * term: `c.c` for conversion probability, `1.0` for steps. */
  private def fullStep(name: String, k: Int, base: String): String =
    s"""$name$k AS (
       |  SELECT c.state, round($base + coalesce(s.acc, 0), 12) AS v
       |  FROM c LEFT JOIN (
       |    SELECT p.from_state AS state,
       |      sum(round(p.p * v.v, 12)::DECIMAL(28,12))::DOUBLE AS acc
       |    FROM pr p JOIN $name${k - 1} v ON v.state = p.to_state
       |    GROUP BY 1) s ON s.state = c.state)""".stripMargin

  val all: Seq[Q] = Seq(

    // Removal-effect attribution: delete each state's edges (mass
    // lost, not renormalized), re-run the 8-step absorption recursion
    // for all scenarios on ONE (scen, state)-keyed frame, credit
    // RE = 1 − v'/v, normalize shares.
    Q("q312_markov_attribution",
      Some(s"""$ChainSql,
              |scen AS (SELECT 'full' AS scen UNION ALL
              |  SELECT DISTINCT from_state FROM trans
              |  WHERE from_state <> 'START'),
              |ptab AS (
              |  SELECT s.scen, p.from_state, p.to_state, p.p
              |  FROM scen s JOIN pr p ON s.scen = 'full'
              |    OR (p.from_state <> s.scen AND p.to_state <> s.scen)),
              |c AS (
              |  SELECT scen, from_state AS state,
              |    coalesce(sum((CASE WHEN to_state = 'purchase'
              |      THEN p END)::DECIMAL(28,12))::DOUBLE, 0) AS c
              |  FROM ptab GROUP BY 1, 2),
              |v1 AS (SELECT scen, state, round(c, 12) AS v FROM c),
              |${(2 to Iters).map(scenStep).mkString(",\n")},
              |fin AS (SELECT scen, v FROM v$Iters
              |        WHERE state = 'START'),
              |pf AS (SELECT v AS p_full FROM fin WHERE scen = 'full'),
              |prm AS (
              |  SELECT s.scen AS state, coalesce(fin.v, 0)
              |    AS p_removed
              |  FROM scen s LEFT JOIN fin ON fin.scen = s.scen
              |  WHERE s.scen <> 'full'),
              |re AS (
              |  SELECT state, p_removed, p_full,
              |    CASE WHEN p_full > 0 THEN
              |      round(1.0 - p_removed / p_full, 12) END AS re
              |  FROM prm, pf),
              |tt AS (SELECT sum(re::DECIMAL(28,12))::DOUBLE AS tot
              |       FROM re)
              |SELECT state, round(p_full, 6) AS p_full_r,
              |  round(p_removed, 6) AS p_removed_r,
              |  round(re, 6) AS removal_effect_r,
              |  CASE WHEN tot > 0 THEN round(re / tot, 6) END
              |    AS attribution_r
              |FROM re, tt ORDER BY state""".stripMargin),
      (s, d) => Markov.removalAttribution(
          Markov.journeyTransitions(events(s, d), "user_id",
            "event_type",
            Seq(unix_micros(col("ts")), col("event_id")), "purchase"),
          "purchase", Iters)
        .orderBy("state")),

    // Absorption profile of the full chain: 8-step conversion
    // probability and truncated expected journey length per state —
    // "how likely does a session here convert, how long does it run".
    Q("q313_absorption_profile",
      Some(s"""$ChainSql,
              |c AS (
              |  SELECT from_state AS state,
              |    coalesce(sum((CASE WHEN to_state = 'purchase'
              |      THEN p END)::DECIMAL(28,12))::DOUBLE, 0) AS c
              |  FROM pr GROUP BY 1),
              |v1 AS (SELECT state, round(c, 12) AS v FROM c),
              |${(2 to Iters).map(k => fullStep("v", k, "c.c"))
                .mkString(",\n")},
              |t1 AS (SELECT state, round(1.0, 12) AS v FROM c),
              |${(2 to Iters).map(k => fullStep("t", k, "1.0"))
                .mkString(",\n")}
              |SELECT v$Iters.state, round(v$Iters.v, 6) AS p_conv_r,
              |  round(t$Iters.v, 6) AS steps_r
              |FROM v$Iters JOIN t$Iters USING (state)
              |ORDER BY state""".stripMargin),
      (s, d) => Markov.absorptionProfile(
          Markov.journeyTransitions(events(s, d), "user_id",
            "event_type",
            Seq(unix_micros(col("ts")), col("event_id")), "purchase"),
          "purchase", Iters)
        .orderBy("state")))
}
