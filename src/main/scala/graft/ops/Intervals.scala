package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval analytics via the sweep line: max concurrent open intervals
  * per key. The naive formulation is an interval self-join
  * (O(n²) pairs under skew); the sweep line is the scale-correct shape —
  * each interval contributes exactly two boundary events (+1 at start,
  * −1 at end), and concurrency is a running sum over the per-key
  * boundary stream.
  *
  * Scale posture (100 TB): one union (map-side), ONE hash shuffle on
  * the key, one running-sum window and the max rollup on the same
  * partitioning. 2n boundary rows regardless of overlap density — an
  * interval join would materialize O(overlaps) rows.
  *
  * End boundaries are EXCLUSIVE: at an equal timestamp the −1 sorts
  * before the +1 (delta ascending), so back-to-back intervals
  * [a,b),[b,c) never count as concurrent. `tieCol` makes the boundary
  * order total, so the running sum is deterministic.
  */
object Intervals {

  /** (key, max_concurrent) over the given interval table. */
  def maxConcurrent(df: DataFrame, keyCol: String, startCol: String,
      endCol: String, tieCol: String): DataFrame = {
    val starts = df.select(col(keyCol), col(startCol).as("_ts"),
      lit(1).as("_delta"), col(tieCol).as("_tie"))
    val ends = df.select(col(keyCol), col(endCol).as("_ts"),
      lit(-1).as("_delta"), col(tieCol).as("_tie"))
    val w = Window.partitionBy(keyCol)
      .orderBy(col("_ts"), col("_delta"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    starts.union(ends)
      .withColumn("_conc", sum(col("_delta")).over(w))
      .groupBy(keyCol)
      .agg(max(col("_conc")).as("max_concurrent"))
  }

  /** Time-WEIGHTED concurrency percentiles per key: the sweep line
    * ([[maxConcurrent]]'s boundary machinery) yields constant-
    * concurrency segments; weighting each level by the microseconds it
    * held gives the duration distribution of load — "the system sat at
    * ≤ conc_p for p of the observed span", the capacity-planning
    * readout max-concurrency alone can't give. `ps` are quantile
    * levels; the pick is the LOWER weighted quantile (smallest level
    * whose cumulative duration reaches p·span — exact integer
    * arithmetic, no interpolation).
    *
    * Shape: 2 boundary rows per interval, one shuffle on the key, a
    * (key, level) duration rollup, then cumulative sums over the tiny
    * per-key level ladder crossed with the broadcast p-spec. The
    * p·span comparison is integer-exact: cum·den ≥ p_num·span with
    * rational p = num/den avoids float boundaries entirely. */
  def concurrencyProfile(df: DataFrame, keyCol: String,
      startCol: String, endCol: String, tieCol: String,
      pNums: Seq[Int], pDen: Int): DataFrame = {
    require(pDen > 0 && pNums.nonEmpty &&
      pNums.forall(n => n > 0 && n <= pDen))
    val s = df.sparkSession
    import s.implicits._
    val starts = df.select(col(keyCol), col(startCol).as("_ts"),
      lit(1).as("_delta"), col(tieCol).as("_tie"))
    val ends = df.select(col(keyCol), col(endCol).as("_ts"),
      lit(-1).as("_delta"), col(tieCol).as("_tie"))
    val w = Window.partitionBy(keyCol)
      .orderBy(col("_ts"), col("_delta"), col("_tie"))
    val wCum = w.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val segs = starts.union(ends)
      .withColumn("_conc", sum(col("_delta")).over(wCum))
      .withColumn("_dur",
        unix_micros(lead(col("_ts"), 1).over(w)) -
          unix_micros(col("_ts")))
      .where(col("_dur").isNotNull && col("_dur") > 0)
    val ladder = segs.groupBy(col(keyCol), col("_conc"))
      .agg(sum(col("_dur")).as("_d"))
    val wL = Window.partitionBy(keyCol).orderBy(col("_conc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wT = Window.partitionBy(keyCol)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val spec = pNums.toDF("p_num")
    val wPick = Window.partitionBy(col(keyCol), col("p_num"))
      .orderBy(col("_conc"))
    ladder
      .withColumn("_cum", sum(col("_d")).over(wL))
      .withColumn("_span", sum(col("_d")).over(wT))
      .crossJoin(broadcast(spec))
      .where(col("_cum") * pDen >= col("p_num") * col("_span"))
      .withColumn("_rk", row_number().over(wPick))
      .where(col("_rk") === 1)
      .select(col(keyCol),
        (col("p_num").cast("double") / pDen).as("p"),
        col("_conc").cast("long").as("conc_p"),
        col("_span").as("span_us"))
  }

  /** BUCKETED point-in-interval join — the scale-correct shape for the
    * interval/theta join Spark would otherwise plan as a broadcast
    * nested loop (or refuse, when neither side fits in memory). Each
    * interval explodes into the daily buckets it touches (span/1d rows —
    * bounded fan-out for bounded spans); each point maps to exactly one
    * bucket; the join is then a plain EQUI-join on the bucket, hash
    * partitionable on both sides, with the exact `[start, end)`
    * containment re-checked as a residual filter (buckets only prune —
    * correctness never depends on bucket alignment, which is why the
    * interval's bucket sequence can safely over-cover the end day).
    *
    * At 100 TB both sides shuffle once on the bucket key and AQE
    * broadcast-shortcuts the join whenever one side's bucketed form is
    * small (e.g. points pre-aggregated to the bucket granularity — the
    * composition q116 uses). Pair-volume discipline is the caller's
    * lever: pre-aggregate the dense side to bucket granularity when the
    * downstream metric allows it, exactly as a time-series rollup would.
    *
    * Output: every `intervals` column plus the matching point rows'
    * columns (inner join; callers left-join the result back to keep
    * empty intervals). */
  def bucketedPointJoin(intervals: DataFrame, startCol: String,
      endCol: String, points: DataFrame, tsCol: String): DataFrame = {
    val iv = intervals.withColumn("_bucket",
      explode(sequence(to_date(col(startCol)), to_date(col(endCol)))))
    val pts = points.withColumn("_bucket", to_date(col(tsCol)))
    iv.join(pts, "_bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_bucket")
  }

  /** Interval OVERLAP self-join per key: all pairs of a key's intervals
    * that overlap ([s, e) exclusive ends), with the overlap length in
    * days — the "which stays/visits/orders coincide" join that a naive
    * theta join (s_a < e_b AND s_b < e_a) turns into a per-key cross
    * product. Pairs are oriented id_a < id_b.
    *
    * Scale shape: each interval explodes to its covering day-grain
    * BUCKETS of `bucketDays` (bounded fan-out ∝ duration/bucketDays),
    * the candidate join is an EQUI-join on (key, bucket), and each
    * overlapping pair is emitted EXACTLY ONCE — in the bucket holding
    * max(s_a, s_b), which both intervals cover iff they overlap — so
    * no post-join distinct is needed. Overlap arithmetic is exact
    * integer days. */
  def overlapJoin(iv: DataFrame, keyCol: String, idCol: String,
      startCol: String, endCol: String, bucketDays: Int): DataFrame = {
    require(bucketDays >= 1)
    val epoch = to_date(lit("1970-01-01"))
    val withB = iv.select(col(keyCol), col(idCol).as("_id"),
        to_date(col(startCol)).as("_s"), to_date(col(endCol)).as("_e"))
      .withColumn("_db0", (datediff(col("_s"), epoch)
        / bucketDays).cast("long"))
      // end exclusive: the last covered day is e − 1
      .withColumn("_db1", (datediff(date_sub(col("_e"), 1), epoch)
        / bucketDays).cast("long"))
      .withColumn("_bucket",
        explode(sequence(col("_db0"), col("_db1"))))
    val a = withB.select(col(keyCol), col("_bucket"),
      col("_id").as("a_id"), col("_s").as("_sa"), col("_e").as("_ea"),
      col("_db0").as("_b0a"))
    val b = withB.select(col(keyCol), col("_bucket"),
      col("_id").as("b_id"), col("_s").as("_sb"), col("_e").as("_eb"),
      col("_db0").as("_b0b"))
    a.join(b, Seq(keyCol, "_bucket"))
      .where(col("a_id") < col("b_id") &&
        col("_sa") < col("_eb") && col("_sb") < col("_ea") &&
        col("_bucket") === greatest(col("_b0a"), col("_b0b")))
      .select(col(keyCol), col("a_id"), col("b_id"),
        datediff(least(col("_ea"), col("_eb")),
          greatest(col("_sa"), col("_sb"))).cast("long")
          .as("overlap_days"))
  }
}
