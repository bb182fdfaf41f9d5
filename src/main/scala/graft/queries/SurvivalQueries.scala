package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Behavior
import graft.util.Tables._

/** Survival-analysis depth batch on the q132 signup→purchase cohort
  * ([[graft.ops.Behavior]]): Nelson–Aalen cumulative hazard (the
  * additive estimator + Fleming–Harrington survival) and the log-rank
  * test comparing weekend-signup vs weekday-signup cohorts — the
  * censoring-correct "do these curves differ" readout.
  */
object SurvivalQueries {

  /** q132's subject construction: duration = days from first signup to
    * first subsequent purchase (censored at the corpus horizon), plus
    * the weekend-signup group flag. */
  private[queries] val SubjSql =
    """WITH su AS (
      |  SELECT user_id, min(ts) AS t0 FROM events
      |  WHERE event_type = 'signup' GROUP BY 1),
      |pu AS (
      |  SELECT e.user_id, min(e.ts) AS t1
      |  FROM events e JOIN su ON su.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts >= su.t0
      |  GROUP BY 1),
      |mx AS (SELECT max(ts) AS tmax FROM events),
      |subj AS (
      |  SELECT CASE WHEN pu.t1 IS NOT NULL
      |      THEN datediff('day', su.t0::DATE, pu.t1::DATE)
      |      ELSE datediff('day', su.t0::DATE, mx.tmax::DATE)
      |    END::BIGINT AS t,
      |    pu.t1 IS NOT NULL AS observed,
      |    dayofweek(su.t0::DATE) IN (0, 6) AS g
      |  FROM su LEFT JOIN pu USING (user_id), mx)""".stripMargin

  private[queries] def subj(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val ev = events(s, d)
    val su = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("t0"))
    val pu = ev.filter(col("event_type") === "purchase")
      .join(su, "user_id").filter(col("ts") >= col("t0"))
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val mx = ev.agg(max(col("ts")).as("tmax"))
    su.join(pu, Seq("user_id"), "left")
      .crossJoin(broadcast(mx))
      .select(
        when(col("t1").isNotNull,
          datediff(to_date(col("t1")), to_date(col("t0"))))
          .otherwise(datediff(to_date(col("tmax")), to_date(col("t0"))))
          .cast("long").as("t"),
        col("t1").isNotNull.as("observed"),
        (dayofweek(to_date(col("t0"))) - 1).isin(0, 6).as("g"))
  }

  val all: Seq[Q] = Seq(

    // Nelson–Aalen cumulative hazard + Fleming–Harrington survival:
    // the additive twin of q132's KM product — hazard increments
    // 12-dp DECIMAL-cumulated on the bounded time axis.
    Q("q316_nelson_aalen",
      Some(s"""$SubjSql,
              |perT AS (
              |  SELECT t,
              |    sum(CASE WHEN observed THEN 1 ELSE 0 END)::BIGINT
              |      AS d,
              |    count(*)::BIGINT AS alln
              |  FROM subj GROUP BY 1),
              |tot AS (SELECT sum(alln) AS n FROM perT),
              |r AS (
              |  SELECT t, d,
              |    ((SELECT n FROM tot) - coalesce(sum(alln) OVER (
              |      ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
              |      AND 1 PRECEDING), 0))::BIGINT AS n_risk
              |  FROM perT),
              |h AS (
              |  SELECT t, n_risk, d,
              |    sum(round(d::DOUBLE / n_risk::DOUBLE, 12)
              |      ::DECIMAL(28,12)) OVER (ORDER BY t
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |      AS ch
              |  FROM r WHERE d > 0)
              |SELECT t, n_risk, d, round(ch::DOUBLE, 6) AS cumhaz_r,
              |  round(exp(-(ch::DOUBLE)), 6) AS fh_survival_r
              |FROM h ORDER BY t""".stripMargin),
      (s, d) => Behavior.nelsonAalen(subj(s, d), "t", "observed")
        .orderBy("t")),

    // Log-rank test, weekend-signup vs weekday-signup: hypergeometric
    // O−E accumulation over the shared event-time axis; z and χ² from
    // exact integer counts + 12-dp DECIMAL E/V sums.
    Q("q317_logrank",
      Some(s"""$SubjSql,
              |perT AS (
              |  SELECT t,
              |    sum(CASE WHEN observed AND g THEN 1 ELSE 0 END)
              |      ::BIGINT AS d1,
              |    sum(CASE WHEN observed THEN 1 ELSE 0 END)::BIGINT
              |      AS d,
              |    sum(CASE WHEN g THEN 1 ELSE 0 END)::BIGINT AS a1,
              |    count(*)::BIGINT AS alln
              |  FROM subj GROUP BY 1),
              |tot AS (SELECT sum(a1)::BIGINT AS t1,
              |        sum(alln)::BIGINT AS tn FROM perT),
              |r AS (
              |  SELECT t, d1, d,
              |    ((SELECT t1 FROM tot) - coalesce(sum(a1) OVER w, 0))
              |      ::BIGINT AS n1,
              |    ((SELECT tn FROM tot) - coalesce(sum(alln) OVER w, 0))
              |      ::BIGINT AS n
              |  FROM perT
              |  WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED
              |    PRECEDING AND 1 PRECEDING)),
              |e AS (
              |  SELECT d1,
              |    round(d::DOUBLE * n1::DOUBLE / n::DOUBLE, 12)
              |      ::DECIMAL(28,12) AS e1,
              |    CASE WHEN n > 1 THEN
              |      round(d::DOUBLE * (n1::DOUBLE / n::DOUBLE)
              |        * ((n - n1)::DOUBLE / n::DOUBLE)
              |        * ((n - d)::DOUBLE / (n - 1)::DOUBLE), 12)
              |        ::DECIMAL(28,12)
              |      ELSE 0::DECIMAL(28,12) END AS v
              |  FROM r WHERE d > 0),
              |a AS (SELECT sum(d1)::BIGINT AS o1, sum(e1) AS e1s,
              |      sum(v) AS vs FROM e)
              |SELECT (SELECT t1 FROM tot) AS n_g1,
              |  ((SELECT tn FROM tot) - (SELECT t1 FROM tot)) AS n_g0,
              |  o1, round(e1s::DOUBLE, 6) AS e1_r,
              |  CASE WHEN vs > 0 THEN
              |    round((o1::DOUBLE - e1s::DOUBLE)
              |      / sqrt(vs::DOUBLE), 6) END AS z_r,
              |  CASE WHEN vs > 0 THEN
              |    round((o1::DOUBLE - e1s::DOUBLE)
              |      * (o1::DOUBLE - e1s::DOUBLE) / vs::DOUBLE, 6) END
              |    AS chi2_r
              |FROM a""".stripMargin),
      (s, d) => Behavior.logRank(subj(s, d), "t", "observed",
        col("g"))))
}
