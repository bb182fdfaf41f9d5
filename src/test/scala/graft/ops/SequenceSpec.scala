package graft.ops

import graft.SparkTestBase

/** Hand-computable cases for the sequence-analysis ops. */
class SequenceSpec extends SparkTestBase {
  import spark.implicits._

  test("motifTopK: two planted identical shapes are the closest pair " +
      "(distance 0) and overlapping pairs are excluded") {
    // days 0..19: a distinctive zig at 0..2 replanted at 10..12, noise
    // elsewhere chosen so no other window repeats
    val y = Array[Long](1, 9, 2, 3, 4, 5, 6, 7, 8, 11,
      1, 9, 2, 3, 4, 5, 6, 7, 8, 30)
    val daily = y.zipWithIndex.map { case (v, t) => (t.toLong, v) }
      .toSeq.toDF("t", "y")
    val got = Sequence.motifTopK(daily, "t", "y", w = 3, k = 1)
      .collect()(0)
    assert(got.getAs[Long]("t1") == 0L && got.getAs[Long]("t2") == 10L,
      got.toString)
    assert(got.getAs[Double]("dist_r") == 0.0)
  }

  test("saxDistance: identical series symbolize identically (dist 0, " +
      "match 1); an anti-phase pair is penalized") {
    val a = (0 until 28).map(t => (t.toLong,
      if ((t / 7) % 2 == 0) 100L else 1L)).toDF("t", "y")
    val r = Sequence.saxDistance(a, a, "t", "y", 7).collect()(0)
    assert(r.getAs[Long]("n_segments") == 4L)
    assert(r.getAs[Double]("match_rate_r") == 1.0)
    assert(r.getAs[Double]("sax_dist_r") == 0.0)
    val b = (0 until 28).map(t => (t.toLong,
      if ((t / 7) % 2 == 0) 1L else 100L)).toDF("t", "y")
    val r2 = Sequence.saxDistance(a, b, "t", "y", 7).collect()(0)
    assert(r2.getAs[Double]("match_rate_r") == 0.0)
    assert(r2.getAs[Double]("sax_dist_r") > 0.0)
  }

  test("transferEntropy: y copying x's previous value gives strictly " +
      "positive TE; an independent constant-ish pairing gives ~0") {
    // period-4 x with y = x lagged by one: (x_t, y_t) takes all four
    // combinations (so y alone does not reveal x), while y_{t+1} = x_t
    // exactly -> TE = ln 2. (An alternating x with y = 1-x would alias
    // x through y at the same step and give TE = 0.)
    val n = 40
    val xs = (0 until n).map(t => (t.toLong, (t / 2) % 2))
    val ys = (0 until n).map(t => (t.toLong,
      if (t == 0) 0 else ((t - 1) / 2) % 2))
    val te = Sequence.transferEntropy(xs.toDF("t", "x"),
      ys.toDF("t", "y"), "t", "x", "y").collect()(0)
    assert(te.getAs[Double]("te_r") > 0.6, te.toString) // ~ln 2
    // y constant: nothing to predict -> TE 0
    val yc = (0 until n).map(t => (t.toLong, 1))
    val te0 = Sequence.transferEntropy(xs.toDF("t", "x"),
      yc.toDF("t", "y"), "t", "x", "y").collect()(0)
    assert(te0.getAs[Double]("te_r") == 0.0)
  }

  test("hoeffdingSplit: a planted level shift is the top split with " +
      "positive excess; a constant series never exceeds the bound") {
    val shifted = ((0 until 30).map(t => (t.toLong, 100000L)) ++
      (30 until 60).map(t => (t.toLong, 900000L))).toDF("t", "y")
    val top = Sequence.hoeffdingSplit(shifted, "t", "y", 0.05, 1)
      .collect()(0)
    assert(top.getAs[Long]("t") == 29L, top.toString)
    assert(top.getAs[Double]("excess_r") > 0.0)
    val const = (0 until 60).map(t => (t.toLong, 500000L))
      .toDF("t", "y")
    // constant series: R = 0 degenerates the bound to eps = 0 and the
    // mean gap is 0 too -> excess exactly 0, never positive
    val c = Sequence.hoeffdingSplit(const, "t", "y", 0.05, 3).collect()
    assert(c.forall(_.getAs[Double]("excess_r") <= 0.0))
  }

  test("boxCoxGrid: for exactly lognormal-free data y = exp(z) the " +
      "lambda 0 (log) transform maximizes the profile likelihood") {
    // y = exp(z) with z a spread of values: log-transform gaussianizes
    val z = Seq(-2.0, -1.5, -1.0, -0.5, 0.0, 0.5, 1.0, 1.5, 2.0,
      -1.8, -0.9, 0.3, 0.9, 1.8, -0.2)
    val y = z.map(v => Tuple1(math.exp(v))).toDF("yv")
    val grid = Sequence.boxCoxGrid(y, "yv").collect()
    val best = grid.maxBy(_.getAs[Double]("ll_r"))
    assert(best.getAs[Double]("lambda") == 0.0,
      grid.map(r => (r.getAs[Double]("lambda"),
        r.getAs[Double]("ll_r"))).mkString(", "))
    assert(grid.length == 5)
  }

  test("permutationEntropy: a monotone series concentrates on one " +
      "pattern (H = 0); a 2-cycle splits over two patterns (H = ln 2)") {
    import spark.implicits._
    def evs(counts: Seq[Int]) = counts.zipWithIndex.flatMap {
      case (c, day) => (1 to c).map(_ => java.sql.Timestamp.valueOf(
        f"2026-01-${day + 1}%02d 12:00:00"))
    }.toDF("ts")
    val mono = Sequence.permutationEntropy(evs(1 to 10), "ts")
      .collect()
    assert(mono.map(_.getAs[Long]("n_p")).sum == 8)
    assert(mono.filter(_.getAs[Int]("pattern") == 7)
      .head.getAs[Long]("n_p") == 8)
    assert(mono.head.getAs[Double]("h_r") == 0.0)
    val cyc = Sequence.permutationEntropy(
      evs(Seq(1, 2, 1, 2, 1, 2, 1, 2, 1, 2)), "ts").collect()
    // triples alternate between patterns 6 (1,2,1) and 3 (2,1,2)
    val h = cyc.head.getAs[Double]("h_r")
    assert(math.abs(h - math.log(2.0)) < 1e-6, h.toString)
    assert(math.abs(cyc.head.getAs[Double]("hnorm_r")
      - math.log(2.0) / math.log(6.0)) < 1e-6)
  }
}
