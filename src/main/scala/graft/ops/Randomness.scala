package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-randomness audits over one global day-grain series — the
  * classic "is this metric stream actually noise" battery next to
  * [[Nonparam.turningPoints]] and [[Nonparam.durbinWatson]]: the
  * Wald–Wolfowitz runs test (level randomness around the median), the
  * difference-sign test (trend in increments), the Cox–Stuart paired
  * sign test (monotone trend), and Bartels' rank von Neumann ratio
  * (the rank-robust serial-correlation test durbinWatson's raw form
  * is not).
  *
  * Convention: the battery runs on OBSERVED days only — days with no
  * events are absent from the series, not zero-filled (unlike
  * [[Forecast]]'s zero-filled calendar spine). That is the classical
  * setting for these tests (a run/rank statistic over the realized
  * sample); a caller auditing a gappy stream for missing days should
  * zero-fill upstream and pass the spine in.
  *
  * All statistics are EXACT integers up to the final z ratio: medians
  * use the pooled upper-middle convention (2·C ≥ N+1, the moodMedian
  * predicate), ranks use the doubled-rank integer trick (2·rank is an
  * integer even for midranks), and every window runs on the bounded
  * day or distinct-value grain.
  */
object Randomness {

  /** (day, x) daily counts from an event stream. */
  private def daily(events: DataFrame, tsCol: String): DataFrame =
    events.groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x"))

  /** Wald–Wolfowitz runs test around the pooled median: R = number of
    * maximal same-side runs among the days strictly above/below the
    * upper-middle median (ties at the median excluded — the standard
    * reduction), z from the exact integer moments
    * E[R] = 1 + 2·n1·n2/n, Var[R] = 2n1n2(2n1n2−n)/(n²(n−1)).
    * Too FEW runs = level clustering (regimes), too many = negative
    * serial correlation. Returns one row: n_days, n_above, n_below,
    * runs, e_runs_r, z_r (null when either side is empty or n < 2). */
  def runsTest(events: DataFrame, tsCol: String): DataFrame = {
    val d = daily(events, tsCol)
    val per = d.groupBy(col("x")).agg(count(lit(1)).as("_m"))
    val cum = per.withColumn("_r",
      sum(col("_m")).over(Window.orderBy(col("x"))))
    val tot = per.agg(sum(col("_m")).as("_n"))
    val med = cum.crossJoin(broadcast(tot))
      .filter(lit(2) * col("_r") >= col("_n") + 1)
      .agg(min(col("x")).as("_med"))
    val signed = d.crossJoin(broadcast(med))
      .filter(col("x") =!= col("_med"))
      .select(col("day"),
        when(col("x") > col("_med"), 1).otherwise(-1).as("_s"))
    val w = Window.orderBy(col("day"))
    val runs = signed
      .withColumn("_chg",
        when(lag(col("_s"), 1).over(w).isNull
          || lag(col("_s"), 1).over(w) =!= col("_s"), 1L).otherwise(0L))
      .agg(sum(col("_chg")).as("runs"),
        sum(when(col("_s") === 1, 1L).otherwise(0L)).as("n_above"),
        sum(when(col("_s") === -1, 1L).otherwise(0L)).as("n_below"))
    val n = (col("n_above") + col("n_below")).cast("double")
    val p2 = (lit(2.0) * col("n_above").cast("double")
      * col("n_below").cast("double"))
    val eR = lit(1.0) + p2 / n
    val varR = (p2 * (p2 - n)) / (n * n * (n - 1))
    runs.select(
      (col("n_above") + col("n_below")).as("n_days"),
      col("n_above"), col("n_below"), col("runs"),
      round(when(col("n_above") > 0 && col("n_below") > 0, eR), 6)
        .as("e_runs_r"),
      round(when(col("n_above") > 0 && col("n_below") > 0
        && col("n_above") + col("n_below") > 1,
        (col("runs").cast("double") - eR) / sqrt(varR)), 6).as("z_r"))
  }

  /** Difference-sign test: S = number of strict increases among the
    * day-over-day increments, tie increments excluded; with m non-tie
    * increments, E[S] = m/2 and Var[S] = (m+2)/12 (the textbook
    * (n−1)/2, (n+1)/12 when no ties). A monotone trend inflates S;
    * the test is blind to level clustering (runs test's complement).
    * Returns one row: n_incr (m), n_up, z_r (null when m = 0). */
  def differenceSign(events: DataFrame, tsCol: String): DataFrame = {
    val d = daily(events, tsCol)
    val w = Window.orderBy(col("day"))
    val diffs = d.withColumn("_d", col("x") - lag(col("x"), 1).over(w))
      .filter(col("_d").isNotNull && col("_d") =!= 0)
      .agg(count(lit(1)).as("n_incr"),
        sum(when(col("_d") > 0, 1L).otherwise(0L)).as("n_up"))
    val mD = col("n_incr").cast("double")
    diffs.select(col("n_incr"), col("n_up"),
      round(when(col("n_incr") > 0,
        (col("n_up").cast("double") - mD / 2)
          / sqrt((mD + 2) / 12)), 6).as("z_r"))
  }

  /** Cox–Stuart trend test: pair day i with day i + h (h = ⌈n/2⌉, the
    * first ⌊n/2⌋ days against the last, middle day dropped when n is
    * odd), S = positive differences among the m' non-tie pairs,
    * z = (S − m'/2)/√(m'/4) — the sign-test-on-halves monotone-trend
    * detector (distribution-free, outlier-immune where q246's
    * Theil–Sen slope is a magnitude). Returns one row: n_pairs (m'),
    * n_pos, z_r (null when m' = 0). */
  def coxStuart(events: DataFrame, tsCol: String): DataFrame = {
    val d = daily(events, tsCol)
    val idx = d.withColumn("_i",
      row_number().over(Window.orderBy(col("day"))).cast("long"))
      .localCheckpoint() // day-grain frame; both join sides below
    val n = idx.agg(count(lit(1)).as("_n"))
    val a = idx.select(col("_i"), col("x").as("_xa"))
      .crossJoin(broadcast(n))
      .filter(col("_i") <= expr("_n div 2"))
    val b = idx.select(col("_i").as("_j"), col("x").as("_xb"))
    val pairs = a.join(b,
        col("_j") === col("_i") + expr("(_n + 1) div 2"))
      .select((col("_xb") - col("_xa")).as("_d"))
      .filter(col("_d") =!= 0)
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("_d") > 0, 1L).otherwise(0L)).as("n_pos"))
    val mD = col("n_pairs").cast("double")
    pairs.select(col("n_pairs"), col("n_pos"),
      round(when(col("n_pairs") > 0,
        (col("n_pos").cast("double") - mD / 2) / sqrt(mD / 4)), 6)
        .as("z_r"))
  }

  /** Bartels' rank von Neumann ratio: RVN = Σ(R_i − R_{i+1})² /
    * Σ(R_i − R̄)² over the day-ordered midranks — the rank-robust
    * serial-correlation test ([[Nonparam.durbinWatson]] on raw values
    * is moment-sensitive; Bartels 1982 replaces values by ranks).
    * Exact integers throughout: doubled midranks r2 = 2·rank are
    * integers even under ties, r̄2 = n+1 exactly, so both sums are
    * integer and the /4 cancels in the ratio. z uses the Bartels
    * asymptotic null (mean 2, variance 4/n — documented choice).
    * RVN < 2 = positive serial correlation. Returns one row: n_days,
    * rvn_r, z_r (null on zero rank variance, i.e. constant series). */
  def rankVonNeumann(events: DataFrame, tsCol: String): DataFrame = {
    val d = daily(events, tsCol)
    val per = d.groupBy(col("x")).agg(count(lit(1)).as("_m"))
    val cum = per.withColumn("_clt",
      coalesce(sum(col("_m")).over(Window.orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // doubled midrank per VALUE: 2·avg(rank) = 2·clt + m + 1 (integer)
    val r2v = cum.select(col("x"),
      (lit(2) * col("_clt") + col("_m") + 1).as("_r2"))
    val w = Window.orderBy(col("day"))
    val seq0 = d.join(r2v, Seq("x"))
      .withColumn("_nx", lead(col("_r2"), 1).over(w))
    val tot = seq0.agg(count(lit(1)).as("n_days"),
      sum(when(col("_nx").isNotNull,
        (col("_r2") - col("_nx")) * (col("_r2") - col("_nx")))
        .otherwise(lit(0L))).as("_num"))
    val den = seq0.crossJoin(broadcast(tot))
      .agg(max(col("n_days")).as("n_days"), max(col("_num")).as("_num"),
        sum((col("_r2") - (col("n_days") + 1))
          * (col("_r2") - (col("n_days") + 1))).as("_den"))
    val rvn = col("_num").cast("double") / col("_den").cast("double")
    den.select(col("n_days"),
      round(when(col("_den") > 0, rvn), 6).as("rvn_r"),
      round(when(col("_den") > 0,
        (rvn - 2) / sqrt(lit(4.0) / col("n_days").cast("double"))), 6)
        .as("z_r"))
  }
}
