package graft.queries

import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Growth & experiment-planning batch: the daily new-vs-returning
  * decomposition every growth chart starts from, and a data-driven
  * experiment power planner (sample size and run-time from the
  * OBSERVED baseline rate and traffic).
  */
object PlanningQueries {

  // two-proportion power-analysis constants: z_{α/2} at 95% two-sided,
  // z_β at 80% power — Scala literals shared verbatim with the oracle
  private val ZAlpha = 1.959964
  private val ZBeta = 0.841621
  private val MdesPct = Seq(1, 2, 3, 5) // absolute MDE, percentage points

  val all: Seq[Q] = Seq(

    // Daily actives split into first-seen-today vs returning, with the
    // new-share ratio — exact integers off the (user, day) grain.
    Q("q277_new_returning",
      Some("""WITH du AS (
             |  SELECT DISTINCT user_id, ts::DATE AS day FROM events),
             |first AS (
             |  SELECT user_id, min(day) AS first_day
             |  FROM du GROUP BY 1)
             |SELECT du.day,
             |  sum(CASE WHEN du.day = f.first_day THEN 1 ELSE 0 END)
             |    ::BIGINT AS n_new,
             |  sum(CASE WHEN du.day > f.first_day THEN 1 ELSE 0 END)
             |    ::BIGINT AS n_returning,
             |  round(sum(CASE WHEN du.day = f.first_day THEN 1 ELSE 0
             |    END)::DOUBLE / count(*), 6) AS new_share_r
             |FROM du JOIN first f USING (user_id)
             |GROUP BY 1 ORDER BY day""".stripMargin),
      (s, d) => {
        val du = events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
        val first = du.groupBy(col("user_id"))
          .agg(min(col("day")).as("first_day"))
        du.join(first, "user_id")
          .groupBy(col("day"))
          .agg(
            sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
              .as("n_new"),
            sum(when(col("day") > col("first_day"), 1L).otherwise(0L))
              .as("n_returning"),
            round(sum(when(col("day") === col("first_day"), 1L)
              .otherwise(0L)).cast("double") / count(lit(1)), 6)
              .as("new_share_r"))
          .orderBy("day")
      }),

    // Experiment power planner: per candidate MDE, the per-arm sample
    // size n = (z_{α/2}·√(2p̄(1−p̄)) + z_β·√(p₁(1−p₁)+p₂(1−p₂)))²/δ²
    // from the OBSERVED per-user conversion baseline, and the run-time
    // implied by observed distinct-user traffic (2n / users-per-day).
    Q("q278_power_planner",
      Some {
        val mdeRows = MdesPct
          .map(m => s"(${m}::INT, ${m / 100.0}::DOUBLE)")
          .mkString(", ")
        s"""WITH u AS (
           |  SELECT user_id, ts::DATE AS day,
           |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           |      AS conv
           |  FROM events GROUP BY 1, 2),
           |base AS (
           |  SELECT count(*)::BIGINT AS n_users,
           |    sum(conv)::BIGINT AS k FROM u),
           |traffic AS (
           |  SELECT count(*)::BIGINT AS active_user_days
           |  FROM (SELECT DISTINCT user_id, ts::DATE FROM events) t),
           |days AS (
           |  SELECT count(DISTINCT ts::DATE)::BIGINT AS n_days
           |  FROM events),
           |mde(mde_pct, d) AS (VALUES $mdeRows),
           |f AS (
           |  SELECT m.mde_pct, m.d, b.n_users, b.k,
           |    k::DOUBLE / n_users AS p1,
           |    k::DOUBLE / n_users + m.d AS p2,
           |    t.active_user_days::DOUBLE / dd.n_days AS upd
           |  FROM mde m CROSS JOIN base b CROSS JOIN traffic t
           |  CROSS JOIN days dd),
           |g AS (
           |  SELECT mde_pct, p1, p2, upd,
           |    ($ZAlpha * sqrt(2.0 * ((p1 + p2) / 2.0)
           |        * (1.0 - (p1 + p2) / 2.0))
           |      + $ZBeta * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)))
           |    * ($ZAlpha * sqrt(2.0 * ((p1 + p2) / 2.0)
           |        * (1.0 - (p1 + p2) / 2.0))
           |      + $ZBeta * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)))
           |    / (d * d) AS n_req
           |  FROM f WHERE p2 < 1.0)
           |SELECT mde_pct, round(p1, 6) AS baseline_r,
           |  CAST(ceil(n_req) AS BIGINT) AS n_per_arm,
           |  round(2.0 * ceil(n_req) / upd, 6) AS days_required_r
           |FROM g ORDER BY mde_pct""".stripMargin
      },
      (s, d) => {
        val sess = s
        import sess.implicits._
        // unit = active user-DAY (daily conversion baseline; per-user
        // "ever purchased" saturates at ~1.0 on this fixture)
        val u = events(s, d)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(max(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("conv"))
        val base = u.agg(count(lit(1)).as("n_users"),
          sum(col("conv")).as("k"))
        val traffic = events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("_d"))
          .distinct()
          .agg(count(lit(1)).as("active_user_days"))
        val days = events(s, d)
          .agg(countDistinct(to_date(col("ts"))).as("n_days"))
        val mde = MdesPct.map(m => (m, m / 100.0)).toDF("mde_pct", "d")
        val f = mde.crossJoin(broadcast(base))
          .crossJoin(broadcast(traffic)).crossJoin(broadcast(days))
          .withColumn("p1", col("k").cast("double") / col("n_users"))
          .withColumn("p2", col("k").cast("double") / col("n_users")
            + col("d"))
          .withColumn("upd", col("active_user_days").cast("double")
            / col("n_days"))
          .where(col("p2") < 1.0)
        val pbar = (col("p1") + col("p2")) / lit(2.0)
        val term = lit(ZAlpha) * sqrt(lit(2.0) * pbar
          * (lit(1.0) - pbar)) +
          lit(ZBeta) * sqrt(col("p1") * (lit(1.0) - col("p1"))
            + col("p2") * (lit(1.0) - col("p2")))
        val nReq = term * term / (col("d") * col("d"))
        f.select(col("mde_pct"), round(col("p1"), 6).as("baseline_r"),
            ceil(nReq).cast("long").as("n_per_arm"),
            round(lit(2.0) * ceil(nReq) / col("upd"), 6)
              .as("days_required_r"))
          .orderBy("mde_pct")
      }))
}
