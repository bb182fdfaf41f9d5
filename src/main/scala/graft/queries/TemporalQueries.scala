package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Temporal-dynamics batch: the Goh–Barabási burstiness/memory pair
  * over inter-event gaps plus the index of dispersion over per-user
  * daily counts — the "is this activity Poisson or bursty" readouts
  * that decide whether rate-based capacity models (q270's backlog,
  * q278's power planner) can be trusted. All three are single
  * hash-aggs over exact integer moments; the only floats are the
  * final shared-parenthesization divisions (and one sqrt), rounded
  * to 6.
  */
object TemporalQueries {

  val all: Seq[Q] = Seq(

    // Burstiness B = (σ−μ)/(σ+μ) of inter-event gaps (µs) per event
    // type, gaps taken within each user's stream (Goh & Barabási, EPL
    // 2008): B→−1 periodic, ≈0 Poisson, →1 bursty. Exact moments
    // (n, Σg, Σg² as HUGEINT/DECIMAL), population σ, one sqrt.
    Q("q290_burstiness",
      Some("""WITH e AS (
             |  SELECT event_type, user_id, epoch_us(ts) AS us, event_id
             |  FROM events),
             |g AS (
             |  SELECT event_type,
             |    lead(us) OVER (PARTITION BY event_type, user_id
             |      ORDER BY us, event_id) - us AS gap
             |  FROM e),
             |a AS (
             |  SELECT event_type, count(*)::BIGINT AS n,
             |    sum(gap)::BIGINT AS s,
             |    sum(gap::HUGEINT * gap) AS ss
             |  FROM g WHERE gap IS NOT NULL GROUP BY 1)
             |SELECT event_type, n,
             |  round(s::DOUBLE / n::DOUBLE, 6) AS mean_us_r,
             |  round(sqrt((ss::DOUBLE - s::DOUBLE * s::DOUBLE
             |      / n::DOUBLE) / n::DOUBLE), 6) AS sd_us_r,
             |  CASE WHEN sqrt((ss::DOUBLE - s::DOUBLE * s::DOUBLE
             |        / n::DOUBLE) / n::DOUBLE) + s::DOUBLE / n::DOUBLE
             |      > 0 THEN
             |    round((sqrt((ss::DOUBLE - s::DOUBLE * s::DOUBLE
             |        / n::DOUBLE) / n::DOUBLE) - s::DOUBLE / n::DOUBLE)
             |      / (sqrt((ss::DOUBLE - s::DOUBLE * s::DOUBLE
             |        / n::DOUBLE) / n::DOUBLE) + s::DOUBLE / n::DOUBLE),
             |      6) END AS burstiness_r
             |FROM a ORDER BY event_type""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy(col("event_type"), col("user_id"))
          .orderBy(col("_us"), col("event_id"))
        val g = events(s, d)
          .select(col("event_type"), col("user_id"),
            unix_micros(col("ts")).as("_us"), col("event_id"))
          .withColumn("gap", lead(col("_us"), 1).over(w) - col("_us"))
          .where(col("gap").isNotNull)
        val a = g.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"),
          sum(col("gap")).as("s"),
          sum(col("gap").cast("decimal(38,0)")
            * col("gap").cast("decimal(38,0)")).as("_ss"))
        val nD = col("n").cast("double")
        val sD = col("s").cast("double")
        val m = sD / nD
        val sd = sqrt((col("_ss").cast("double") - sD * sD / nD) / nD)
        a.select(col("event_type"), col("n"),
          round(m, 6).as("mean_us_r"),
          round(sd, 6).as("sd_us_r"),
          round(when(sd + m > 0, (sd - m) / nullif(sd + m, lit(0.0))),
            6).as("burstiness_r"))
          .orderBy("event_type")
      }),

    // Memory coefficient M (the other Goh–Barabási axis): Pearson
    // correlation of consecutive gap pairs within a user's stream —
    // M>0 long gaps follow long gaps. Engine corr on both sides,
    // rounded to 6 (the q94 convention: co-moment merge order differs
    // across engines at ~1e-12).
    Q("q291_memory_coeff",
      Some("""WITH e AS (
             |  SELECT event_type, user_id, epoch_us(ts) AS us, event_id
             |  FROM events),
             |g AS (
             |  SELECT event_type, user_id,
             |    lead(us) OVER (PARTITION BY event_type, user_id
             |      ORDER BY us, event_id) - us AS gap,
             |    us, event_id
             |  FROM e),
             |p AS (
             |  SELECT event_type, gap,
             |    lead(gap) OVER (PARTITION BY event_type, user_id
             |      ORDER BY us, event_id) AS next_gap
             |  FROM g WHERE gap IS NOT NULL)
             |SELECT event_type, count(*)::BIGINT AS n_pairs,
             |  round(corr(gap, next_gap), 6) AS memory_r
             |FROM p WHERE next_gap IS NOT NULL
             |GROUP BY 1 ORDER BY event_type""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy(col("event_type"), col("user_id"))
          .orderBy(col("_us"), col("event_id"))
        val g = events(s, d)
          .select(col("event_type"), col("user_id"),
            unix_micros(col("ts")).as("_us"), col("event_id"))
          .withColumn("gap", lead(col("_us"), 1).over(w) - col("_us"))
          .where(col("gap").isNotNull)
          .withColumn("next_gap", lead(col("gap"), 1).over(w))
          .where(col("next_gap").isNotNull)
        g.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_pairs"),
            round(corr(col("gap"), col("next_gap")), 6).as("memory_r"))
          .orderBy("event_type")
      }),

    // Index of dispersion D = Var/Mean of per-(user, day) event counts
    // per type: D≈1 Poisson, >1 overdispersed (bursty days), <1
    // regular. Exact integer moments over the (user, day) count grid.
    Q("q292_dispersion_index",
      Some("""WITH c AS (
             |  SELECT event_type, user_id, ts::DATE AS day,
             |    count(*)::BIGINT AS k
             |  FROM events GROUP BY 1, 2, 3),
             |a AS (
             |  SELECT event_type, count(*)::BIGINT AS n,
             |    sum(k)::BIGINT AS s, sum(k::HUGEINT * k) AS ss
             |  FROM c GROUP BY 1)
             |SELECT event_type, n,
             |  round(s::DOUBLE / n::DOUBLE, 6) AS mean_r,
             |  round(((ss::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE)
             |      / n::DOUBLE) / (s::DOUBLE / n::DOUBLE), 6)
             |    AS dispersion_r
             |FROM a ORDER BY event_type""".stripMargin),
      (s, d) => {
        val c = events(s, d)
          .groupBy(col("event_type"), col("user_id"),
            to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("k"))
        val a = c.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"), sum(col("k")).as("s"),
          sum(col("k").cast("decimal(38,0)")
            * col("k").cast("decimal(38,0)")).as("_ss"))
        val nD = col("n").cast("double")
        val sD = col("s").cast("double")
        val m = sD / nD
        a.select(col("event_type"), col("n"),
          round(m, 6).as("mean_r"),
          round(((col("_ss").cast("double") - sD * sD / nD) / nD)
            / nullif(m, lit(0.0)), 6).as("dispersion_r"))
          .orderBy("event_type")
      }))
}
