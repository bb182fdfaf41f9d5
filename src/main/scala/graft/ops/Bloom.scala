package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational Bloom filter (Bloom, CACM 1970) — the approximate-
  * membership pre-filter a 100 TB incremental pipeline puts IN FRONT of
  * its exact anti-join: the sink's key set compresses to m bits
  * (⌈m/64⌉ longs), small enough to broadcast, and the fetch side drops
  * definite non-members before any shuffle. One-sided error by
  * construction: a false NEGATIVE is impossible (every inserted key set
  * all its k bits), so the downstream exact join only sees the maybes —
  * correctness is preserved, the shuffle shrinks by the true-negative
  * rate.
  *
  * Built relationally so both construction and probe are plain
  * aggs/joins (and the DuckDB oracle can reproduce them bit-for-bit):
  * positions are md5-derived (`hash60(key || '#' || j) mod m`, the
  * engine-portable hash family every other curation op uses), the
  * filter is a (word, bits) table via `bit_or` — idempotent, so AQE
  * retries and re-aggregation are safe — and the probe is a broadcast
  * left join + `bool_and` over the k positions. Spark's own runtime
  * bloom-join does this transparently for equi-joins; this op is the
  * EXPLICIT form a pipeline persists across runs (the daily-ETL seam:
  * build once from the sink, reuse for every incremental batch).
  */
object Bloom {

  private def pos(key: org.apache.spark.sql.Column, j: Int,
      mBits: Int): org.apache.spark.sql.Column =
    pmod(TextOps.hash60(concat(key.cast("string"), lit("#"), lit(j))),
      lit(mBits.toLong))

  /** Build the (word, bits) filter table over `keyCol`'s distinct keys:
    * each key sets k md5-derived bits of an m-bit array, packed into
    * 64-bit words. Output rows ≤ ⌈m/64⌉ — broadcastable by design. */
  def build(df: DataFrame, keyCol: String, mBits: Int,
      k: Int): DataFrame = {
    require(mBits > 0 && k > 0, "mBits and k must be > 0")
    val positions = (0 until k).map(j => pos(col(keyCol), j, mBits))
    df.select(explode(array(positions: _*)).as("_p"))
      .select((col("_p") / 64).cast("long").as("word"),
        expr("shiftleft(1L, CAST(_p % 64 AS INT))").as("_b"))
      .groupBy(col("word"))
      .agg(expr("bit_or(_b)").as("bits"))
  }

  /** Probe: append `maybe` (true = possibly inserted, false = DEFINITELY
    * not) to every row of `probe`. The filter joins broadcast; a missing
    * word means no key ever touched it → bit unset → false. */
  def mightContain(probe: DataFrame, keyCol: String, bloom: DataFrame,
      mBits: Int, k: Int): DataFrame = {
    require(mBits > 0 && k > 0, "mBits and k must be > 0")
    val positions = (0 until k).map(j => pos(col(keyCol), j, mBits))
    val hits = probe
      .select(col(keyCol), explode(array(positions: _*)).as("_p"))
      .select(col(keyCol), (col("_p") / 64).cast("long").as("word"),
        expr("shiftleft(1L, CAST(_p % 64 AS INT))").as("_m"))
      .join(broadcast(bloom), Seq("word"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("bits").bitwiseAND(col("_m")) =!= 0, lit(false)))
        .as("maybe"))
    probe.join(hits, Seq(keyCol))
  }
}
