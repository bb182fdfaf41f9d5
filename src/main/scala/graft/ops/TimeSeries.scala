package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series repair: per-key daily spines with gap rows
  * materialized and values carried forward. Event tables are sparse in
  * time (a user with no events on a day simply has no row); most
  * downstream consumers — trend models, retention dashboards, feature
  * stores — need a dense grid with an explicit "nothing happened"
  * marker and a last-known-value column.
  *
  * Scale posture (100 TB): the spine is generated from each key's OWN
  * [min, max] day bounds, so grid size is Σ_k span_k — never
  * |keys| × global-span (a key active for one week contributes 7 rows
  * regardless of the table's multi-year range). `sequence()` + `explode`
  * expand map-side from the 1-row-per-key bounds frame; the daily
  * rollup, the bounds, the spine join, and the forward-fill window all
  * hash-partition on the key, so the whole plan is one key-shuffle
  * deep. Forward fill is `last(ignoreNulls)` over an unbounded-preceding
  * row frame — a single running-state pass per key, no self-join.
  */
object TimeSeries {

  /** Dense daily series of `round(sum(valueCol), 6)` per key with
    * forward fill. Output: key, `day`, `day_value` (null on gap days),
    * `filled_value` (last non-null carried forward), `is_gap`. */
  def fillDailyGaps(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    // day-grain rollup: the float sum crosses partitions, so round(6)
    // before anything downstream copies the value (oracle twin rounds
    // identically; reorder noise ~1e-13)
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(round(sum(col(valueCol)), 6).as("day_value"))
    // per-key bounds → exploded daily spine (map-side after the agg)
    val spine = daily
      .groupBy(keyCol)
      .agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
      .select(col(keyCol),
        explode(sequence(col("_d0"), col("_d1"))).as("day"))
    val w = Window.partitionBy(keyCol).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(daily, Seq(keyCol, "day"), "left")
      .withColumn("filled_value",
        last(col("day_value"), ignoreNulls = true).over(w))
      .withColumn("is_gap", col("day_value").isNull)
  }

  /** Exponentially-weighted moving average of the daily series with
    * DYADIC decay (weight 2^-offset, horizon `horizonDays`), evaluated
    * at each observed day:
    * ewma(d) = Σ_o 2^-o·v(d−o) / Σ_{o: v(d−o) exists} 2^-o.
    *
    * The decay base is fixed at 1/2 on purpose: every weight is a power
    * of two, so the per-term products v·2^-o are EXACT in IEEE doubles
    * (exponent shift only) and the weight-sum denominator is exactly
    * representable — the whole smoother is bit-reproducible across
    * engines up to the final ≤horizon-term sum order (absorbed by
    * round(9), same convention as every float agg here).
    *
    * Scale posture: no range self-join — each day-grain row emits its
    * `horizonDays` forward contributions map-side (`sequence`+`explode`,
    * bounded fan-out), then one hash agg on (key, target day) and a
    * semi-join back to observed days. Same bounded-fan-out shape as
    * `Behavior.rollingDistinct`. */
  def ewmaDaily(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, horizonDays: Int = 8): DataFrame = {
    require(horizonDays >= 1 && horizonDays <= 62,
      "horizon must be in [1,62] (dyadic weights underflow beyond)")
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(round(sum(col(valueCol)), 6).as("day_value"))
    val contrib = daily
      .select(col(keyCol), col("day"), col("day_value"),
        explode(sequence(lit(0), lit(horizonDays - 1))).as("_o"))
      .select(col(keyCol), date_add(col("day"), col("_o")).as("day"),
        (col("day_value") * pow(lit(0.5), col("_o"))).as("_wv"),
        pow(lit(0.5), col("_o")).as("_w"))
    contrib
      .groupBy(col(keyCol), col("day"))
      .agg(round(sum(col("_wv")) / sum(col("_w")), 9).as("ewma"))
      .join(daily.select(col(keyCol), col("day")), Seq(keyCol, "day"),
        "left_semi")
  }

  /** Rolling OLS slope of daily counts over a trailing `windowDays`-row
    * frame per key — the local-trend monitor ("is this source's volume
    * accelerating THIS week") that the global regression (q127) can't
    * see. slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) with x = epoch day —
    * all frame sums are exact integers, one double division at the end
    * (round 6); a single-row frame has zero x-variance and yields null.
    *
    * Shape: one (key, day) count agg; every frame window runs over that
    * |keys|·|days| table. */
  def rollingSlope(df: DataFrame, keyCol: String, tsCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 2)
    val daily = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("_x", datediff(col("day"), lit("1970-01-01"))
        .cast("long"))
    val w = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(-(windowDays - 1), Window.currentRow)
    val fr = daily
      .withColumn("_fn", count(lit(1)).over(w))
      .withColumn("_sx", sum(col("_x")).over(w))
      .withColumn("_sy", sum(col("n")).over(w))
      .withColumn("_sxy", sum(col("_x") * col("n")).over(w))
      .withColumn("_sxx", sum(col("_x") * col("_x")).over(w))
    val den = col("_fn") * col("_sxx") - col("_sx") * col("_sx")
    fr.select(col(keyCol), col("day"), col("n"),
      when(den > 0, round((col("_fn") * col("_sxy")
        - col("_sx") * col("_sy")) / den, 6)).as("slope_r"))
  }

  /** One-sided CUSUM change-point detection over daily counts per key
    * (Page, Biometrika 1954): C⁺_t = max(0, C⁺_{t-1} + x_t − μ − k),
    * alarm when C⁺ > h — the sequential drift detector that catches a
    * sustained upward shift long before a per-day z-score does. The
    * recursion is rewritten with the classic running-extremum identity
    * C⁺_t = S_t − min(0, min_{i≤t} S_i) where S_t = Σ(x_i − μ − k), so
    * the whole statistic is two cumulative windows — no sequential scan
    * and no UDAF state.
    *
    * μ is each key's own mean daily count (exact integer ratio). Shape:
    * one (key, day) count agg off the corpus; every window runs over
    * that |keys|·|days| table. */
  def cusumDaily(df: DataFrame, keyCol: String, tsCol: String,
      allowance: Double, threshold: Double): DataFrame = {
    val daily = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val wKey = Window.partitionBy(keyCol)
    val wOrd = Window.partitionBy(keyCol).orderBy("day")
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val s = col("_runsum") -
      col("_rn") * (col("_tot") / col("_days") + allowance)
    daily
      .withColumn("_tot", sum(col("n")).over(wKey))
      .withColumn("_days", count(lit(1)).over(wKey))
      .withColumn("_rn", row_number().over(wOrd))
      .withColumn("_runsum", sum(col("n")).over(wCum))
      .withColumn("_s", s)
      .withColumn("_smin", min(col("_s")).over(wCum))
      .select(col(keyCol), col("day"), col("n"),
        round(col("_s") - least(col("_smin"), lit(0.0)), 6).as("cusum_r"),
        (col("_s") - least(col("_smin"), lit(0.0)) > threshold)
          .as("alarm"))
  }
}
