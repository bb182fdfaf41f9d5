package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) interleaving for
  * multi-dimensional clustering. At 100 TB the dominant cost of a scan
  * with predicates on two independent columns is that a sort by either
  * one scatters the other; interleaving their bits gives a single sort
  * key under which BOTH columns are range-clustered, so per-file min/max
  * stats prune on either predicate. This is the layout trick behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY` — here as a plain codegen'd column
  * expression (`repartitionByRange(zOrderKey).sortWithinPartitions` is
  * the full clustered-write recipe; the key is the whole algorithm).
  *
  * Pure bit arithmetic (`shiftright`/`shiftleft`/`&`/`|`) — shuffle-free,
  * whole-stage-codegen'd, and reproducible bit-for-bit in any engine with
  * integer bit ops (the DuckDB oracle interpolates the same terms).
  */
object Layout {

  /** Morton/Z-order key: interleave the low `bits` bits of `x` and `y`
    * (x gets even positions, y odd). Inputs must be non-negative; the
    * result is a `2*bits`-bit non-negative long. */
  def zOrderKey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be 1-31, got $bits")
    val xi = x.cast("long")
    val yi = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xi, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(yi, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Clustering-effectiveness report: bucket rows by the top `bucketBits`
    * of their Z-key (one bucket ≈ one file of a clustered write) and
    * report each bucket's row count and per-dimension min/max span. Narrow
    * spans on BOTH dimensions are the point — they are exactly the
    * file-level min/max stats a scan with a predicate on either column
    * prunes against. One hash-agg keyed on the bucket; the Z-key itself
    * adds no shuffle. */
  def zOrderBucketStats(df: DataFrame, xCol: String, yCol: String,
      bits: Int, bucketBits: Int): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 2 * bits)
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    df.select(zOrderKey(x, y, bits).as("z"), x.as("x"), y.as("y"))
      .withColumn("bucket", shiftright(col("z"), 2 * bits - bucketBits))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
  }

  /** Zone-map (min/max data-skipping) effectiveness audit: deal the
    * same rows into pages two ways — Z-order prefix pages vs a hash
    * deal (the "unclustered write" strawman) — and report, for the
    * predicate `xCol BETWEEN lo AND hi`, how many pages and rows each
    * layout lets a scan SKIP on file-level min/max stats alone. This
    * quantifies what [[zOrderBucketStats]] shows qualitatively: at
    * 100 TB the difference between the two skip ratios IS the scan-cost
    * difference, because pruned pages are never read.
    *
    * A page is skippable iff x_max < lo OR x_min > hi (the standard
    * zone-map test). Shape: one projection (both page keys are pure bit
    * arithmetic / md5), one (layout, page) hash-agg, one |pages|-row
    * rollup — the audit never sorts the data. */
  def zoneMapSkipAudit(df: DataFrame, xCol: String, yCol: String,
      bits: Int, pageBits: Int, lo: Long, hi: Long): DataFrame = {
    require(pageBits >= 1 && pageBits <= 2 * bits && lo <= hi)
    val nPages = 1L << pageBits
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val base = df.select(x.as("x"), y.as("y"))
    val zPages = base.select(lit("zorder").as("layout"),
      shiftright(zOrderKey(col("x"), col("y"), bits),
        2 * bits - pageBits).as("page"), col("x"))
    val hPages = base.select(lit("hash").as("layout"),
      (TextOps.hash60(concat(col("x").cast("string"), lit("#"),
        col("y").cast("string"))) % nPages).as("page"), col("x"))
    zPages.union(hPages)
      .groupBy(col("layout"), col("page"))
      .agg(count(lit(1)).as("_n"), min(col("x")).as("_xmin"),
        max(col("x")).as("_xmax"))
      .groupBy(col("layout"))
      .agg(count(lit(1)).as("n_pages"), sum(col("_n")).as("n_rows"),
        sum(when(col("_xmax") < lo || col("_xmin") > hi, 1L)
          .otherwise(0L)).as("pages_skipped"),
        sum(when(col("_xmax") < lo || col("_xmin") > hi, col("_n"))
          .otherwise(0L)).as("rows_skipped"))
      .withColumn("skip_r",
        round(col("rows_skipped") / col("n_rows"), 6))
  }

  /** Run-length (RLE-compressibility) audit: traverse each page in its
    * write order and count runs of equal `xCol` values, for THREE
    * layouts — `colsort` (sorted by x: the RLE optimum for x and the
    * pruning pessimum for y), `zorder` (the two-sided compromise: its
    * bit interleave deliberately alternates x, so x-runs collapse to
    * ≈cell transitions, while BOTH columns stay range-clustered for
    * min/max pruning — [[zoneMapSkipAudit]] measures that half), and
    * `hash` (the unclustered deal: only duplicate cells coalesce).
    * Columnar encoders (parquet RLE/dictionary) spend bits per RUN, not
    * per row, so runs/rows is the storage+scan cost of the column under
    * each write order; the three numbers together are the layout
    * decision, not a winner declaration.
    *
    * Shape: page + traversal keys are pure projections; the lag window
    * partitions by (layout, page) — a task sorts one page, bounded by
    * page size — and two hash-aggs roll up. Ties in each traversal key
    * carry identical x, so run counts are order-unambiguous. */
  def runLengthAudit(df: DataFrame, xCol: String, yCol: String,
      bits: Int, pageBits: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(pageBits >= 1 && pageBits <= 2 * bits)
    val nPages = 1L << pageBits
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val base = df.select(x.as("x"), y.as("y"))
    val z = zOrderKey(col("x"), col("y"), bits)
    val zPages = base.select(lit("zorder").as("layout"),
      shiftright(z, 2 * bits - pageBits).as("page"), col("x"),
      z.as("ord"))
    val h = TextOps.hash60(concat(col("x").cast("string"), lit("#"),
      col("y").cast("string")))
    val hPages = base.select(lit("hash").as("layout"),
      (h % nPages).as("page"), col("x"), h.as("ord"))
    // colsort: equal-width x-range pages, traversal (x, y) — encoded as
    // one ord key so all three branches share the window shape
    val csShift = math.max(bits - pageBits, 0)
    val csPages = base.select(lit("colsort").as("layout"),
      shiftright(col("x"), csShift).as("page"), col("x"),
      shiftleft(col("x"), bits).bitwiseOR(col("y")).as("ord"))
    // (ord, x) is a total order even under hash60 collisions, so the
    // oracle's lag sees the identical traversal
    val w = Window.partitionBy(col("layout"), col("page"))
      .orderBy(col("ord"), col("x"))
    zPages.union(hPages).union(csPages)
      .withColumn("_new", when(lag(col("x"), 1).over(w).isNull
        || lag(col("x"), 1).over(w) =!= col("x"), 1L).otherwise(0L))
      .groupBy(col("layout"), col("page"))
      .agg(count(lit(1)).as("_n"), sum(col("_new")).as("_runs"))
      .groupBy(col("layout"))
      .agg(count(lit(1)).as("n_pages"), sum(col("_n")).as("n_rows"),
        sum(col("_runs")).as("n_runs"))
      .withColumn("runs_per_page_r",
        round(col("n_runs") / col("n_pages"), 6))
      .withColumn("runs_ratio_r", round(col("n_runs") / col("n_rows"), 6))
  }

  /** The DuckDB expression computing the identical Z-key — interpolated
    * into oracles so both engines share one definition. */
  def zOrderKeySql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(((($x) >> $i) & 1) << ${2 * i}) | (((($y) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")
}
