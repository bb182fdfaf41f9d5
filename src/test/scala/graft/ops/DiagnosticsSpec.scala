package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Regression diagnostics: degenerate-fit guards plus a scalar
  * reference implementation of the identical formulas (same rounding
  * grid) — the distributed agg/window plumbing must reproduce the
  * straight-line scalar computation exactly; the registered DuckDB
  * oracles provide the independent cross-engine check. */
class DiagnosticsSpec extends SparkTestBase {
  import spark.implicits._

  // (t, yCents) fixture with a trend and t-growing residual spread —
  // heteroscedastic by construction, two visible regimes
  private val Fix: Seq[(Long, Long)] = Seq(
    (0L, 1000L), (1L, 1320L), (2L, 1180L), (3L, 1660L), (4L, 1250L),
    (5L, 1950L), (6L, 1150L), (7L, 2260L), (8L, 1050L), (9L, 2570L))

  private def olsAb(pts: Seq[(Long, Long)]): (Double, Double) = {
    val n = pts.size.toDouble
    val st = pts.map(_._1).sum.toDouble
    val stt = pts.map(p => p._1 * p._1).sum.toDouble
    val sy = pts.map(_._2).sum.toDouble
    val sty = pts.map(p => p._1 * p._2).sum.toDouble
    val b = (n * sty - st * sy) / (n * stt - st * st)
    (b, (sy - b * st) / n)
  }
  private def r6(x: Double) = math.rint(x * 1e6) / 1e6

  test("breuschPagan matches the scalar reference; exact line → null") {
    val (b, a) = olsAb(Fix)
    val g = Fix.map { case (t, y) =>
      val e = (y - a - b * t) / 100.0; (t, r6(e * e))
    }
    val n = g.size.toDouble
    val st = g.map(_._1).sum.toDouble
    val stt = g.map(p => p._1 * p._1).sum.toDouble
    val sg = g.map(_._2).sum
    val stg = g.map(p => r6(p._1 * (p._2))).sum // t*g rounded at 6
    val sgg = g.map(p => math.rint(p._2 * p._2)).sum
    val num = n * stg - st * sg
    val r2 = num * num / ((n * stt - st * st) * (n * sgg - sg * sg))
    val row = Diagnostics.breuschPagan(Fix.toDF("t", "y"), "t", "y")
      .collect().head
    assert(row.getAs[Long]("n_days") == 10)
    assert(math.abs(row.getAs[Double]("bp_lm_r") - r6(n * r2)) < 2e-6,
      s"got ${row.getAs[Double]("bp_lm_r")}, want ${r6(n * r2)}")
    assert(row.getAs[Double]("bp_lm_r") > 1.0,
      "the spread grows with t — LM must be clearly positive")
    // a perfect line has zero residuals: the aux regression is
    // degenerate and the statistic must be NULL, not 0/0 noise
    val line = (0L to 9L).map(t => (t, 200L * t + 300L))
    val lr = Diagnostics.breuschPagan(line.toDF("t", "y"), "t", "y")
      .collect().head
    assert(lr.isNullAt(lr.fieldIndex("bp_lm_r")))
  }

  test("chowTest: regime change detected; perfect fits → null F") {
    // two clean-but-noisy regimes: flat then steep
    val rows = Seq((0L, 1000L), (1L, 1010L), (2L, 990L), (3L, 1005L),
      (4L, 995L), (5L, 2000L), (6L, 2210L), (7L, 2390L), (8L, 2610L),
      (9L, 2800L))
    val r = Diagnostics.chowTest(rows.toDF("t", "y"), "t", "y", 5L)
      .collect().head
    assert(r.getAs[Long]("n1") == 5 && r.getAs[Long]("n2") == 5)
    assert(r.getAs[Double]("b2_r") > 100 * r.getAs[Double]("b1_r").abs,
      s"segment slopes must differ: $r")
    assert(r.getAs[Double]("f_r") > 10.0,
      s"a regime change this size must give a large F: $r")
    // perfectly-fit segments: SSR₁+SSR₂ = 0 → F undefined, NULL
    val perfect = (0L to 9L).map(t =>
      (t, if (t < 5) 100L * t else 5000L - 100L * t))
    val p = Diagnostics.chowTest(perfect.toDF("t", "y"), "t", "y", 5L)
      .collect().head
    assert(p.isNullAt(p.fieldIndex("f_r")))
  }

  test("archLm: volatility-clustered residuals light up LM; " +
      "homoscedastic noise stays near zero") {
    // flat level + residual bursts: 4 quiet days then 4 loud days,
    // repeating — e²_t strongly predicts e²_{t+1} within regimes
    val clustered = (0 until 32).map { t =>
      val amp = if ((t / 4) % 2 == 0) 1000000L else 100000000L
      val sign = if (t % 2 == 0) 1L else -1L
      (t.toLong, 500000000L + sign * amp)
    }
    val r = Diagnostics.archLm(clustered.toDF("t", "y"), "t", "y")
      .collect().head
    assert(r.getAs[Long]("n_pairs") == 31)
    assert(r.getAs[Double]("r2_r") > 0.25, r.toString)
    assert(r.getAs[Double]("lm_r") > 5.0, r.toString)
    // scrambled-magnitude residuals (fixed pseudo-noise): with only 31
    // pairs the sample r² is noisy, so instead of a qualitative bar the
    // op must equal a scalar mirror of its own formulas EXACTLY (the
    // kpss-test pattern — proves the distributed plumbing)
    val amps = Seq(1L, 9L, 3L, 7L, 2L, 8L, 4L, 6L, 5L, 10L, 3L, 8L,
      1L, 7L, 9L, 2L, 6L, 4L, 10L, 5L, 2L, 9L, 7L, 1L, 8L, 3L, 5L,
      10L, 4L, 6L, 1L, 7L)
    val flat = amps.zipWithIndex.map { case (a, t) =>
      val sign = if (t % 2 == 0) 1L else -1L
      (t.toLong, 500000000L + sign * a * 10000000L)
    }
    def r6(x: Double) = BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def ref(rows: Seq[(Long, Long)]): (Long, Double, Double, Double) = {
      val n0 = rows.size.toDouble
      val st = rows.map(_._1).sum.toDouble
      val stt = rows.map(r => r._1.toDouble * r._1).sum
      val sy0 = rows.map(_._2).sum.toDouble
      val sty = rows.map(r => r._1.toDouble * r._2).sum
      val b = (n0 * sty - st * sy0) / (n0 * stt - st * st)
      val a = (sy0 - b * st) / n0
      val z = rows.map { case (t, y) =>
        val e = (y.toDouble - a - b * t) / 1e5
        (t, r6(e * e))
      }
      val pairs = z.zip(z.tail).collect {
        case ((t0, z0), (t1, z1)) if t1 == t0 + 1 => (z0, z1) }
      val n = pairs.size.toDouble
      val sx = pairs.map(_._1).sum.toDouble
      val sy = pairs.map(_._2).sum.toDouble
      val sxx = pairs.map(p => r6(p._1.toDouble * p._1.toDouble))
        .sum.toDouble
      val syy = pairs.map(p => r6(p._2.toDouble * p._2.toDouble))
        .sum.toDouble
      val sxy = pairs.map(p => r6(p._1.toDouble * p._2.toDouble))
        .sum.toDouble
      val num = n * sxy - sx * sy
      val r2 = num * num / ((n * sxx - sx * sx) * (n * syy - sy * sy))
      (pairs.size.toLong, r6(num / (n * sxx - sx * sx)).toDouble,
        r6(r2).toDouble, r6(n * r2).toDouble)
    }
    val (en, eb, er2, elm) = ref(flat)
    val f = Diagnostics.archLm(flat.toDF("t", "y"), "t", "y")
      .collect().head
    assert(f.getAs[Long]("n_pairs") == en)
    assert(f.getAs[Double]("b_r") == eb, s"$f vs $eb")
    assert(f.getAs[Double]("r2_r") == er2, s"$f vs $er2")
    assert(f.getAs[Double]("lm_r") == elm, s"$f vs $elm")
  }

  test("chowTest: breakT outside the observed range still yields one " +
      "row, with NULL slope for the empty segment") {
    // breakT beyond tmax: segment 2 is empty — the roll row must
    // SURVIVE with b2_r NULL (r10 ADVICE: the filter+crossJoin shape
    // returned zero rows, diverging from the oracle's scalar subqueries)
    val r = Diagnostics.chowTest(Fix.toDF("t", "y"), "t", "y", 99L)
      .collect()
    assert(r.length == 1, s"degenerate split must keep the row: ${r.toSeq}")
    val h = r.head
    assert(h.getAs[Long]("n1") == 10 && h.getAs[Long]("n2") == 0)
    assert(!h.isNullAt(h.fieldIndex("b1_r")))
    assert(h.isNullAt(h.fieldIndex("b2_r")))
    assert(h.isNullAt(h.fieldIndex("f_r")))
  }

  test("granger: x→y lag dependence detected; gap days break pairs") {
    // y_t = 100·x_{t-1} + small wiggle so SSR_u > 0 but tiny; y's own
    // lag is useless (x alternates independent of y's history)
    val x = Seq(3L, 7L, 2L, 9L, 4L, 8L, 1L, 6L, 5L, 7L)
    val rows = (0 until 10).map { t =>
      val y = if (t == 0) 500L
        else 100L * x(t - 1) + (if (t % 2 == 0) 3L else -3L)
      (t.toLong, y, x(t))
    }
    val r = Diagnostics.granger(rows.toDF("t", "y", "x"), "t", "y", "x")
      .collect().head
    assert(r.getAs[Long]("n_pairs") == 9)
    assert(math.abs(r.getAs[Double]("b_xlag_r") - 100.0) < 1.0,
      s"unrestricted fit must recover the lag coefficient: $r")
    assert(r.getAs[Double]("f_r") > 50.0,
      s"x strongly Granger-causes y here: $r")
    // a calendar gap (t jumps 4 → 6) must break that pair, not
    // silently regress day 6 on day 4
    val gap = rows.filterNot(_._1 == 5L)
    val g = Diagnostics.granger(gap.toDF("t", "y", "x"), "t", "y", "x")
      .collect().head
    assert(g.getAs[Long]("n_pairs") == 7,
      s"t=5 removed breaks the (5,6) and (4,5) pairs: $g")
  }
}
