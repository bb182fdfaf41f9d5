package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Behavior, TimeSeries}
import graft.util.Tables._

/** Cyclic-structure batch: fixed-period spectral power (literal DFT
  * weight tables — no engine trig) and activity streaks
  * ([[graft.ops.TimeSeries.spectralPower]],
  * [[graft.ops.Behavior.activityStreaks]]).
  */
object CycleQueries {

  private val Periods = Seq(5, 7)

  /** The (period, r, cos, sin) weight rows, stringified ONCE from the
    * engine's own Scala-computed literals — the oracle joins the
    * identical doubles. */
  private val weightValues = Periods.flatMap(p => (0 until p).map { r =>
    val c = math.cos(2 * math.Pi * r / p)
    val s = math.sin(2 * math.Pi * r / p)
    s"($p, $r, ${c}::DOUBLE, ${s}::DOUBLE)"
  }).mkString(",\n    ")

  val all: Seq[Q] = Seq(

    // One-bin DFT power at periods 5 and 7 per event type (weekly
    // cycle vs off-period control), mean-removed via exact sums.
    Q("q268_spectral_period",
      Some(s"""WITH daily AS (
              |  SELECT event_type, ts::DATE AS day,
              |    count(*)::BIGINT AS x
              |  FROM events GROUP BY 1, 2),
              |bounds AS (
              |  SELECT event_type, min(day) AS d0, max(day) AS d1
              |  FROM daily GROUP BY 1),
              |spine AS (
              |  SELECT b.event_type, b.d0,
              |    unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY))
              |      ::DATE AS day
              |  FROM bounds b),
              |filled AS (
              |  SELECT s.event_type, (s.day - s.d0)::BIGINT AS t,
              |    coalesce(d.x, 0)::BIGINT AS x
              |  FROM spine s LEFT JOIN daily d USING (event_type, day)),
              |wt(period, r, c, sn) AS (VALUES
              |    $weightValues),
              |j AS (
              |  SELECT f.event_type, w.period, f.x, w.c, w.sn
              |  FROM filled f JOIN wt w ON f.t % w.period = w.r),
              |a AS (
              |  SELECT event_type, period, count(*)::BIGINT AS n_days,
              |    sum(x)::DOUBLE AS sx,
              |    sum(round(x * c, 12)::DECIMAL(28,12))::DOUBLE AS sc,
              |    sum(round(x * sn, 12)::DECIMAL(28,12))::DOUBLE AS ss,
              |    sum(round(c, 12)::DECIMAL(28,12))::DOUBLE AS wc,
              |    sum(round(sn, 12)::DECIMAL(28,12))::DOUBLE AS ws
              |  FROM j GROUP BY 1, 2)
              |SELECT event_type, period, n_days,
              |  round((sc - sx / n_days * wc) * (sc - sx / n_days * wc)
              |    + (ss - sx / n_days * ws) * (ss - sx / n_days * ws),
              |    6) AS power_r
              |FROM a ORDER BY event_type, period""".stripMargin),
      (s, d) => TimeSeries.spectralPower(events(s, d), "event_type",
          "ts", Periods)
        .orderBy("event_type", "period")),

    // Gaps-and-islands activity streaks per user: active days, runs,
    // longest run.
    Q("q269_activity_streaks",
      Some("""WITH days AS (
             |  SELECT DISTINCT user_id, ts::DATE AS day FROM events),
             |isl AS (
             |  SELECT user_id, day,
             |    day - row_number() OVER (PARTITION BY user_id
             |      ORDER BY day)::INTEGER AS g
             |  FROM days),
             |runs AS (
             |  SELECT user_id, g, count(*)::BIGINT AS len
             |  FROM isl GROUP BY 1, 2)
             |SELECT user_id, sum(len)::BIGINT AS n_active_days,
             |  count(*)::BIGINT AS n_streaks,
             |  max(len)::BIGINT AS longest_streak
             |FROM runs GROUP BY 1 ORDER BY user_id""".stripMargin),
      (s, d) => Behavior.activityStreaks(events(s, d), "user_id", "ts")
        .orderBy("user_id")))
}
