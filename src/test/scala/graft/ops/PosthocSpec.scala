package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Hand cases for the post-hoc/stratified family. */
class PosthocSpec extends SparkTestBase {
  import spark.implicits._

  test("dunn: hand z on {1,2},{3,4},{5,6} — mean ranks 1.5/3.5/5.5, " +
      "no ties, z_12 = −2/√3.5") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L),
      ("c", 5L), ("c", 6L)).toDF("g", "v")
    val got = Posthoc.dunn(df, "v", "g").collect()
    assert(got.length == 3)
    val zab = got.find(r => r.getString(0) == "a" && r.getString(1) == "b")
      .get.getAs[Double]("z_r")
    assert(math.abs(zab - (-2.0 / math.sqrt(3.5))) < 1e-6, zab.toString)
    // ordering: a vs c is the widest gap
    val zac = got.find(r => r.getString(0) == "a" && r.getString(1) == "c")
      .get.getAs[Double]("z_r")
    assert(zac < zab, s"$zac vs $zab")
  }

  test("tukeyHsd: hand q on {1,3},{2,4},{10,12} — MSW = 2, " +
      "q_ab = −1") {
    val df = Seq((1, 1L), (1, 3L), (2, 2L), (2, 4L), (3, 10L),
      (3, 12L)).toDF("g", "v")
    val got = Posthoc.tukeyHsd(df, "v", "g").collect()
    val ab = got.find(r => r.getInt(0) == 1 && r.getInt(1) == 2).get
    assert(ab.getAs[Double]("diff_r") == -1.0, ab.toString)
    assert(ab.getAs[Double]("q_r") == -1.0, ab.toString)
  }

  test("quade: perfectly consistent treatment order with growing " +
      "block spread gives the exact hand F = 12") {
    val df = Seq((1L, 1, 1L), (1L, 2, 2L), (1L, 3, 3L),
      (2L, 1, 10L), (2L, 2, 20L), (2L, 3, 30L),
      (3L, 1, 100L), (3L, 2, 200L), (3L, 3, 300L))
      .toDF("blk", "trt", "v")
    val r = Posthoc.quade(df, "blk", "trt", "v").collect()(0)
    assert(r.getAs[Double]("a_r") == 28.0, r.toString)
    assert(r.getAs[Double]("b_r") == 24.0, r.toString)
    assert(r.getAs[Double]("f_r") == 12.0, r.toString)
  }

  test("quade/pageTrend: incomplete blocks are excluded before " +
      "ranking (complete-block design)") {
    val df = Seq((1L, 1, 1L), (1L, 2, 2L), (1L, 3, 3L),
      (2L, 1, 10L), (2L, 2, 20L), (2L, 3, 30L),
      (9L, 1, 5L)) // block 9 misses treatments 2 and 3
      .toDF("blk", "trt", "v")
    val r = Posthoc.pageTrend(df, "blk", "trt", "v").collect()(0)
    assert(r.getAs[Long]("n_blocks") == 2L, r.toString)
  }

  test("pageTrend: maximal monotone agreement gives L = 42 on the " +
      "3×3 hand case, z = 6/√6") {
    val df = Seq((1L, 1, 1L), (1L, 2, 2L), (1L, 3, 3L),
      (2L, 1, 10L), (2L, 2, 20L), (2L, 3, 30L),
      (3L, 1, 100L), (3L, 2, 200L), (3L, 3, 300L))
      .toDF("blk", "trt", "v")
    val r = Posthoc.pageTrend(df, "blk", "trt", "v").collect()(0)
    assert(r.getAs[Long]("l2") == 84L, r.toString)
    assert(math.abs(r.getAs[Double]("z_r") - 6.0 / math.sqrt(6.0))
      < 1e-6, r.toString)
  }

  test("breslowDay: identical strata (OR = 1 in both) give BD ≈ 0; " +
      "opposing ORs give a large statistic") {
    def stratum(s: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((s, 1, 1)) ++ Seq.fill(b)((s, 1, 0)) ++
        Seq.fill(c)((s, 0, 1)) ++ Seq.fill(d)((s, 0, 0))
    val same = (stratum("s1", 10, 10, 10, 10) ++
      stratum("s2", 10, 10, 10, 10)).toDF("s", "e", "y")
    val r1 = Posthoc.breslowDay(same, "s",
      col("e") === 1, col("y") === 1).collect()(0)
    assert(r1.getAs[Double]("bd_r") == 0.0, r1.toString)
    assert(r1.getAs[Double]("psi_mh_r") == 1.0, r1.toString)
    // OR = 9 in s1 (30·30/10/10), OR = 1/9 in s2 — maximally
    // heterogeneous
    val diff = (stratum("s1", 30, 10, 10, 30) ++
      stratum("s2", 10, 30, 30, 10)).toDF("s", "e", "y")
    val r2 = Posthoc.breslowDay(diff, "s",
      col("e") === 1, col("y") === 1).collect()(0)
    assert(r2.getAs[Double]("bd_r") > 10, r2.toString)
    assert(r2.getAs[Long]("df") == 1L)
  }
}
