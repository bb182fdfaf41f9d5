package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-behavior analytics over event streams: ordered funnels, retention
  * cohorts, event-transition matrices, rolling distinct reach. The
  * reference stores raw per-video rows and leaves analysis to SQL
  * consumers (/root/reference/fetch_youtube_data.py:143-200); these are
  * the canonical product-analytics reductions a warehouse engine is
  * expected to own.
  *
  * Scale posture (100 TB): every operator here reduces events to an
  * entity- or day-grain intermediate in ONE hash shuffle on the entity
  * key before anything widens. Funnel stage times are whole-partition
  * window aggregates over the same `hashpartitioning(entity)` exchange
  * (Catalyst reuses it across the chained selects), retention collapses
  * to (user → cohort, active-week set) in a single agg, and rolling
  * reach expands day-grain rows by a bounded factor (window length)
  * map-side — never a range self-join over raw events.
  */
object Behavior {

  /** Ordered funnel: the highest stage each entity reached, where stage
    * k+1 must occur STRICTLY AFTER the entity's earliest qualifying
    * stage-k event (the classic "did they view, then click, then buy"
    * question — order matters, a purchase before the first view does not
    * count).
    *
    * One shuffle: all stage times are whole-partition window mins over
    * the same entity partitioning; the final per-entity collapse reuses
    * the exchange.
    */
  def funnel(events: DataFrame, entityCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(entityCol)
    // t0 = earliest stage-0 event; t_k = earliest stage-k event after
    // t_{k-1}. Nulls propagate: a missing stage nulls all later stages.
    val withTimes = stages.zipWithIndex.foldLeft(events) {
      case (df, (stage, i)) =>
        val cond =
          if (i == 0) col(typeCol) === stage
          else col(typeCol) === stage && col(tsCol) > col(s"_t${i - 1}")
        df.withColumn(s"_t$i", min(when(cond, col(tsCol))).over(w))
    }
    // fold ascending so the OUTERMOST when() tests the deepest stage —
    // the highest non-null stage must win
    val stageExpr = stages.indices.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"_t$i").isNotNull, lit(i + 1)).otherwise(acc)
    }
    withTimes
      .groupBy(entityCol)
      .agg(max(stageExpr).as("funnel_stage"))
  }

  /** Weekly retention cohorts: entities grouped by first-seen ISO week,
    * counted in each later week they were active. Two shuffles total —
    * one per-entity agg that yields BOTH the cohort week and the distinct
    * active-week set (no join back to raw events), then the
    * (cohort, offset) rollup over the exploded set, whose cardinality is
    * entities × weeks-active, a tiny fraction of the input.
    */
  def weeklyRetention(events: DataFrame, entityCol: String,
      tsCol: String): DataFrame = {
    val week = to_date(date_trunc("week", col(tsCol)))
    events
      .select(col(entityCol), week.as("_week"))
      .groupBy(entityCol)
      .agg(min(col("_week")).as("cohort_week"),
        collect_set(col("_week")).as("_weeks"))
      .select(col("cohort_week"), explode(col("_weeks")).as("_active"))
      .groupBy(col("cohort_week"),
        floor(datediff(col("_active"), col("cohort_week")) / 7)
          .as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order transition matrix: counts of consecutive event-type
    * pairs per entity, ordered by (ts, tiebreak). One shuffle + one
    * per-partition sort for the lag window; the (from, to) rollup is a
    * k² -row aggregate.
    */
  def transitions(events: DataFrame, entityCol: String, typeCol: String,
      orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(orderBy: _*)
    events
      .withColumn("_prev", lag(col(typeCol), 1).over(w))
      .where(col("_prev").isNotNull)
      .groupBy(col("_prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Rolling `windowDays`-day distinct reach per (day, group): how many
    * distinct entities were active in the trailing window ending on each
    * observed day.
    *
    * Scale path: reduce to day-grain distinct (entity, group, day) rows
    * first (one shuffle, output ≤ entities × days), then each row
    * contributes map-side to the ≤ `windowDays` window-end days it can
    * reach — a bounded fan-out — and a semi-join against the observed-day
    * dimension (broadcast; |days| is tiny) drops phantom trailing days.
    * This is O(n·w) with no range self-join over the raw events, the
    * shape that survives 100×: a day-range join against raw events would
    * re-scan the fact table per window.
    */
  def rollingDistinct(events: DataFrame, entityCol: String,
      groupCol: String, tsCol: String, windowDays: Int): DataFrame = {
    val dayGrain = events
      .select(to_date(col(tsCol)).as("day"), col(entityCol), col(groupCol))
      .distinct()
    val days = dayGrain.select(col("day").as("window_day")).distinct()
    dayGrain
      .withColumn("window_day",
        explode(sequence(col("day"), date_add(col("day"), windowDays - 1))))
      .join(broadcast(days), Seq("window_day"), "left_semi")
      .groupBy("window_day", groupCol)
      .agg(countDistinct(col(entityCol)).as("n_entities"))
  }

  /** Kaplan–Meier survival estimator over (duration, observed) rows —
    * time-to-event analytics with CENSORING done right (the naive
    * "average time to convert" silently drops users who never converted;
    * KM keeps them at risk until their censoring time). Input: one row
    * per subject, `tCol` = duration (integer grain, e.g. days),
    * `observedCol` = whether the event happened (false = censored at t).
    * Output: one row per observed event time with the at-risk count,
    * event count, and S(t) = Π_{t_j ≤ t} (1 − d_j / n_j).
    *
    * Shape: the corpus collapses to ≤ |distinct t| rows in ONE hash-agg;
    * the running product (via exp∘Σln, with an explicit zero-factor
    * cascade — Spark's ln(0) is null and nulls don't propagate through
    * window sums, so S hits exact 0 through a flag, not through −∞)
    * runs on that bounded time axis. The single-partition window is over
    * |distinct t| rows, not the corpus — the same rolled-up-axis posture
    * as Profile.histogram. */
  def kaplanMeier(subjects: DataFrame, tCol: String,
      observedCol: String): DataFrame = {
    val perT = subjects
      .groupBy(col(tCol).cast("long").as("t"))
      .agg(sum(when(col(observedCol), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("_all"))
    val wOrd = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = perT.agg(sum(col("_all")).as("_n")).select(col("_n"))
    perT.crossJoin(broadcast(total))
      .withColumn("n_risk",
        col("_n") - coalesce(sum(col("_all")).over(wOrd), lit(0L)))
      .filter(col("d") > 0)
      .withColumn("_factor",
        (col("n_risk") - col("d")).cast("double") / col("n_risk"))
      .withColumn("_lnf",
        when(col("_factor") > 0, log(col("_factor"))).otherwise(lit(0.0)))
      .withColumn("_hitZero",
        max(when(col("_factor") === 0, 1).otherwise(0)).over(wRun))
      .withColumn("survival_r",
        when(col("_hitZero") === 1, lit(0.0))
          .otherwise(round(exp(sum(col("_lnf")).over(wRun)), 6)))
      .select(col("t"), col("n_risk"), col("d"), col("survival_r"))
  }

  /** Two-proportion z-test between experiment arms: per arm the unit
    * count and converted count, then lift and the pooled z statistic
    * z = (p_b − p_a) / √(p̂(1−p̂)(1/n_a + 1/n_b)) — the A/B readout
    * every experimentation pipeline ends in; |z| > 1.96 ≈ p < .05
    * two-sided. `unit` rows must be one per experimental unit with a
    * boolean `armB` and boolean `converted`.
    *
    * Every input to the statistic is an integer count (one hash-agg),
    * the arithmetic is one shared parenthesization, and round 6 caps
    * the output — deterministic cross-engine. z is null when either
    * arm is empty or p̂ ∈ {0, 1} (degenerate variance); rates and lift
    * are likewise null for an empty arm (Spark's long/long 0/0 is NaN
    * where SQL engines yield NULL — the guards pin the SQL semantics
    * so an empty arm can never produce a cross-engine mismatch). */
  def twoProportionTest(units: DataFrame, armB: Column,
      converted: Column): DataFrame = {
    val agg = units.agg(
      sum(when(!armB, 1L).otherwise(0L)).as("n_a"),
      sum(when(!armB && converted, 1L).otherwise(0L)).as("c_a"),
      sum(when(armB, 1L).otherwise(0L)).as("n_b"),
      sum(when(armB && converted, 1L).otherwise(0L)).as("c_b"))
    val pa = when(col("n_a") > 0, col("c_a") / col("n_a"))
    val pb = when(col("n_b") > 0, col("c_b") / col("n_b"))
    val pp = (col("c_a") + col("c_b")) / (col("n_a") + col("n_b"))
    agg.select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
      round(pa, 6).as("rate_a_r"), round(pb, 6).as("rate_b_r"),
      round(pb - pa, 6).as("lift_r"),
      when(col("n_a") > 0 && col("n_b") > 0 && pp > 0 && pp < 1,
        round((pb - pa) / sqrt(pp * (lit(1.0) - pp)
          * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 6))
        .as("z_r"))
  }
}
