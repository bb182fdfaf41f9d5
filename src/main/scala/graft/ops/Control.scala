package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical process control on the daily-count series: the
  * individuals/moving-range (I-MR) chart with the Western Electric
  * run rules — the SRE/data-quality view of a metric stream ("is
  * today's value OUT of control, and did a run pattern start before
  * the 3σ alarm fired?"). Complements the sequential detectors
  * ([[TimeSeries]] Page–Hinkley, CUSUM) with the classic fixed-limit
  * chart every monitoring stack speaks.
  *
  * All windows run on the calendar-bounded day grain (the
  * WindowGrainSpec day class). Center/limits come from exact integer
  * moments of the daily counts; σ̂ = M̄R/d₂ with d₂(2) = 1.128 (the
  * tabulated control-chart constant). */
object Control {

  /** One row: n_days, xbar_r, mrbar_r, sigma_r, and the day counts
    * flagged by Western Electric rules on the I-chart —
    * rule1 (a point beyond 3σ), rule2 (≥2 of the trailing 3 beyond 2σ,
    * same side), rule3 (≥4 of the trailing 5 beyond 1σ, same side),
    * rule4 (8 consecutive on one side of center). Rules 2–4 count the
    * days that COMPLETE a qualifying trailing window (the standard
    * "point that closes the pattern" reading); the first day has no
    * moving range and never alarms rule1-by-MR.
    *
    * Shape: one hash-agg events→days, lag + three rolling sums over
    * the bounded day grain, one global agg. Comparisons against the
    * σ bands are done on EXACT cross-multiplied integers:
    * |xᵢ − x̄| > k·σ̂  ⇔  d₂·n·(n−1)·|n·xᵢ − Σx| > k·n·Σ|Δ|·(n−1)
    * — scaled to avoid float boundary flips between engines (both
    * sides integer after scaling by 1000·d₂⁻¹ bookkeeping; see
    * inline). */
  def imrChart(events: DataFrame, tsCol: String): DataFrame = {
    val daily = events
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x"))
    val w = Window.orderBy(col("day"))
    val withMr = daily
      .withColumn("_mr", abs(col("x") - lag(col("x"), 1).over(w)))
    val tot = withMr.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("_mr")).as("smr"))
    // exact σ-band indicators: with x̄ = sx/n and σ̂ = (smr/(n−1))/1.128,
    // |x − x̄| > kσ̂ ⇔ 1128·(n−1)·|n·x − sx| > 1000·k·n·smr (all BIGINT)
    val lhs = lit(1128) * (col("n") - 1) *
      abs(col("n") * col("x") - col("sx"))
    def beyond(k: Int): Column =
      (lhs > lit(1000L * k) * col("n") * col("smr")).cast("int")
    val diff = col("n") * col("x") - col("sx")
    val side = when(diff > 0, 1).when(diff < 0, -1).otherwise(0)
    // rules 2/3 count each side SEPARATELY: a signed sum would let a
    // beyond-band point on the opposite side cancel a qualifying
    // same-side pair (e.g. +2σ, +2σ, −2σ sums to 1 yet 2-of-3 same-side
    // holds) — the round-12 ADVICE mixed-side undercount.
    val pos = when(diff > 0, 1).otherwise(0)
    val neg = when(diff < 0, 1).otherwise(0)
    val flagged = withMr.crossJoin(broadcast(tot))
      .select(col("day"), col("x"), col("n"), col("sx"), col("smr"),
        beyond(3).as("_b3"),
        (beyond(2) * pos).as("_b2p"), (beyond(2) * neg).as("_b2n"),
        (beyond(1) * pos).as("_b1p"), (beyond(1) * neg).as("_b1n"),
        side.as("_side"))
    def roll(c: Column, k: Int): Column =
      sum(c).over(Window.orderBy(col("day")).rowsBetween(1 - k, 0))
    def cnt(c: Column, k: Int): Column =
      count(c).over(Window.orderBy(col("day")).rowsBetween(1 - k, 0))
    val runs = flagged
      .withColumn("_r2", (cnt(col("x"), 3) === 3) &&
        (roll(col("_b2p"), 3) >= 2 || roll(col("_b2n"), 3) >= 2))
      .withColumn("_r3", (cnt(col("x"), 5) === 5) &&
        (roll(col("_b1p"), 5) >= 4 || roll(col("_b1n"), 5) >= 4))
      .withColumn("_r4", (cnt(col("x"), 8) === 8) &&
        (roll(col("_side"), 8) >= 8 || roll(col("_side"), 8) <= -8))
    runs.groupBy(col("n"), col("sx"), col("smr"))
      .agg(sum(col("_b3")).cast("bigint").as("rule1"),
        sum(col("_r2").cast("int")).cast("bigint").as("rule2"),
        sum(col("_r3").cast("int")).cast("bigint").as("rule3"),
        sum(col("_r4").cast("int")).cast("bigint").as("rule4"))
      .select(col("n").as("n_days"),
        round(col("sx").cast("double") / col("n").cast("double"), 6)
          .as("xbar_r"),
        round(col("smr").cast("double") / (col("n") - 1).cast("double"),
          6).as("mrbar_r"),
        round(col("smr").cast("double") / (col("n") - 1).cast("double")
          / 1.128, 6).as("sigma_r"),
        col("rule1"), col("rule2"), col("rule3"), col("rule4"))
  }

  /** Process-capability audit Cp/Cpk of the daily-count stream against
    * spec limits LEARNED from its own baseline: the first (7·n div 10)
    * days fix μ₀ and σ̂₀ = M̄R₀/d₂ (the [[imrChart]] convention) and
    * the limits μ₀ ± 3σ̂₀; the held-out tail is then scored —
    * Cp = (USL−LSL)/(6σ̂₁) = σ̂₀/σ̂₁ (spec width over realized spread),
    * Cpk = min(USL−μ₁, μ₁−LSL)/(3σ̂₁) (capability after de-centering),
    * and the exact fraction of tail days outside the limits via the
    * imrChart cross-multiplied integer predicate
    * (1128·(n₀−1)·|n₀·x − Σx₀| > 3000·n₀·ΣMR₀ — no float boundary).
    * The drift question q466 alarms point-by-point, asked as one
    * capability index. Moving ranges are computed WITHIN each segment
    * (the tail's first day has no cross-boundary MR). Returns one row:
    * n_base, n_eval, cp_r, cpk_r, frac_out_r (ratios null when either
    * segment's MR sum is 0 — a constant segment). */
  def capability(events: DataFrame, tsCol: String): DataFrame = {
    val daily = events
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x"))
    val idx = daily
      .withColumn("_i",
        row_number().over(Window.orderBy(col("day"))).cast("long"))
      .localCheckpoint() // day-grain frame; feeds both segments
    val n = idx.agg(count(lit(1)).as("_n"))
    val cut = expr("(7 * _n) div 10")
    def seg(cond: Column, tag: String) = {
      val s = idx.crossJoin(broadcast(n)).filter(cond)
      val w = Window.orderBy(col("day"))
      s.withColumn("_mr", abs(col("x") - lag(col("x"), 1).over(w)))
        .agg(count(lit(1)).as(s"n_$tag"), sum(col("x")).as(s"_sx$tag"),
          sum(col("_mr")).as(s"_smr$tag"))
    }
    val base = seg(col("_i") <= cut, "base")
    val ev = seg(col("_i") > cut, "eval")
    // exact out-of-limits count against the BASELINE constants
    val outs = idx.crossJoin(broadcast(n)).filter(col("_i") > cut)
      .crossJoin(broadcast(base))
      .agg(sum(when(lit(1128) * (col("n_base") - 1)
        * abs(col("n_base") * col("x") - col("_sxbase"))
        > lit(3000L) * col("n_base") * col("_smrbase"), 1L)
        .otherwise(0L)).as("_nout"))
    def mu(t: String) = (col(s"_sx$t").cast("double")
      / col(s"n_$t").cast("double"))
    def sig(t: String) = (col(s"_smr$t").cast("double")
      / (col(s"n_$t") - 1).cast("double")) / 1.128
    val ok = col("_smrbase") > 0 && col("_smreval") > 0 &&
      col("n_base") > 1 && col("n_eval") > 1
    broadcast(base).crossJoin(broadcast(ev)).crossJoin(broadcast(outs))
      .select(col("n_base"), col("n_eval"),
        round(when(ok, sig("base") / sig("eval")), 6).as("cp_r"),
        round(when(ok,
          least(mu("base") + lit(3.0) * sig("base") - mu("eval"),
            mu("eval") - (mu("base") - lit(3.0) * sig("base")))
            / (lit(3.0) * sig("eval"))), 6).as("cpk_r"),
        round(col("_nout").cast("double")
          / col("n_eval").cast("double"), 6).as("frac_out_r"))
  }
}
