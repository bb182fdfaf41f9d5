package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LayoutSpec extends SparkTestBase {

  test("zOrderKey interleaves bits (hand case x=3, y=5, bits=3)") {
    import spark.implicits._
    // x=011 at even positions -> 1<<0 | 1<<2; y=101 at odd -> 1<<1 | 1<<5
    val got = Seq((3L, 5L)).toDF("x", "y")
      .select(Layout.zOrderKey(col("x"), col("y"), 3).as("z"))
      .head().getLong(0)
    assert(got == (1L | (1L << 2) | (1L << 1) | (1L << 5))) // 39
  }

  test("zOrderKey of (0,0) is 0; single-bit corners land where expected") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L)).toDF("x", "y")
      .select(Layout.zOrderKey(col("x"), col("y"), 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(0L, 1L, 2L))
  }

  test("bucket stats on a full grid: every Z-bucket is a square tile " +
      "(narrow min/max spans on BOTH dims — the pruning property)") {
    import spark.implicits._
    // full 32x32 grid, 5-bit dims, 16 buckets -> each bucket is an 8x8 tile
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x, y))
      .toDF("x", "y")
    val stats = Layout.zOrderBucketStats(grid, "x", "y", 5, 4).collect()
    assert(stats.length == 16)
    stats.foreach { r =>
      assert(r.getAs[Long]("n_rows") == 64L)
      assert(r.getAs[Long]("x_max") - r.getAs[Long]("x_min") == 7L)
      assert(r.getAs[Long]("y_max") - r.getAs[Long]("y_min") == 7L)
    }
    // a lexicographic (x, y) sort into equal buckets would give 16
    // full-width y spans (31) instead: Z-order is what narrows both
  }

  test("zOrderKey matches a bit-twiddling Scala model on random points " +
      "(fixed seed)") {
    import spark.implicits._
    def model(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(200)((rnd.nextInt(1 << 10).toLong,
      rnd.nextInt(1 << 10).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zOrderKey(col("x"), col("y"), 10).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) => assert(got((x, y)) == model(x, y, 10)) }
  }

  test("zoneMapSkipAudit: Z-order pages prune the aligned range far " +
      "better than the hash deal, and both conserve rows") {
    import spark.implicits._
    // the full 32x32 grid, one row per cell
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
      .toDF("x", "y")
    val got = Layout.zoneMapSkipAudit(grid, "x", "y",
        bits = 5, pageBits = 4, lo = 8L, hi = 15L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (zp, zn, zps, zrs) = got("zorder")
    val (hp, hn, _, hrs) = got("hash")
    assert(zn == 1024L && hn == 1024L, "rows conserved per layout")
    // 16 z-pages = 8x8 blocks; x in [8,15] is one aligned x-block column
    // → exactly 4 of 16 pages can contain it → 12 skipped, 768 rows
    assert(zp == 16L && zps == 12L && zrs == 768L, got.toString)
    // the hash deal spreads every x into every page: nothing skippable
    assert(hp == 16L && hrs == 0L, got.toString)
  }

  test("runLengthAudit: on the full grid, colsort collapses to one run " +
      "per page, z-order's interleave changes x every cell, hash ≈ cells") {
    import spark.implicits._
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
      .toDF("x", "y")
    val got = Layout.runLengthAudit(grid, "x", "y",
        bits = 5, pageBits = 5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.values.forall(_._2 == 1024L), "rows conserved")
    // colsort: page = x → each page is one x value → 1 run/page
    assert(got("colsort") == ((32L, 1024L, 32L)), got.toString)
    // z increments always flip bit 0 = x₀ → every adjacent cell changes x
    assert(got("zorder")._3 == 1024L, got.toString)
    // hash: distinct cells, random adjacency → runs close to cell count
    assert(got("hash")._3 > 900L && got("hash")._3 <= 1024L, got.toString)
  }
}
