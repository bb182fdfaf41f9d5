package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Hand cases for the closer batch: attribute assortativity, Chao2,
  * DL meta-analysis, Egger, sign-flip. */
class MetaSpec extends SparkTestBase {
  import spark.implicits._

  test("attributeAssortativity: within-class-only edges score +1, " +
      "cross-class-only edges score −1 on the 2×2 hand case") {
    val nodes = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "y"))
      .toDF("id", "attr")
    val within = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    val r1 = Graphs.attributeAssortativity(within, nodes, "id", "attr")
      .collect()(0)
    assert(r1.getAs[Double]("assort_r") == 1.0, r1.toString)
    assert(r1.getAs[Long]("n_edges") == 2L)
    val cross = Seq((1L, 3L), (2L, 4L)).toDF("src", "dst")
    val r2 = Graphs.attributeAssortativity(cross, nodes, "id", "attr")
      .collect()(0)
    assert(r2.getAs[Double]("assort_r") == -1.0, r2.toString)
    assert(r2.getAs[Double]("diag_share_r") == 0.0)
  }

  test("chao2Incidence: hand 'a b'/'a c' corpus — S=3, Q1=2, Q2=1, " +
      "Chao2 = 3 + (1/2)·4/2 = 4") {
    val df = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val r = TextOps.chao2Incidence(df, "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("s_obs") == 3L && r.getAs[Long]("q1") == 2L
      && r.getAs[Long]("q2") == 1L)
    assert(r.getAs[Double]("chao2_r") == 4.0, r.toString)
  }

  private def stratum(s: String, a: Int, b: Int, c: Int, d: Int) =
    Seq.fill(a)((s, 1, 1)) ++ Seq.fill(b)((s, 1, 0)) ++
      Seq.fill(c)((s, 0, 1)) ++ Seq.fill(d)((s, 0, 0))

  test("metaDL: identical strata have Q = 0, tau² = 0 and fixed = " +
      "random pooled effect") {
    val df = (stratum("s1", 20, 10, 10, 20) ++
      stratum("s2", 20, 10, 10, 20)).toDF("s", "e", "y")
    val r = Infer.metaDL(df, "s", col("e") === 1, col("y") === 1)
      .collect()(0)
    assert(r.getAs[Double]("q_r") == 0.0, r.toString)
    assert(r.getAs[Double]("tau2_r") == 0.0)
    assert(r.getAs[Double]("fixed_lor_r")
      == r.getAs[Double]("random_lor_r"), r.toString)
    assert(r.getAs[Double]("fixed_lor_r") > 1.0) // OR = 4ish
  }

  test("metaDL: opposing strata produce Q > 1 and tau² > 0 with the " +
      "random effect pulled toward zero") {
    val df = (stratum("s1", 40, 10, 10, 40) ++
      stratum("s2", 10, 40, 40, 10)).toDF("s", "e", "y")
    val r = Infer.metaDL(df, "s", col("e") === 1, col("y") === 1)
      .collect()(0)
    assert(r.getAs[Double]("q_r") > 1, r.toString)
    assert(r.getAs[Double]("tau2_r") > 0, r.toString)
    assert(r.getAs[Double]("i2_r") > 0.5, r.toString)
  }

  test("eggerSmallStudy: two strata fit the line exactly (r² = 1)") {
    val df = (stratum("s1", 30, 10, 10, 30) ++
      stratum("s2", 6, 2, 2, 6)).toDF("s", "e", "y")
    val r = Infer.eggerSmallStudy(df, "s", col("e") === 1,
      col("y") === 1).collect()(0)
    assert(r.getAs[Long]("k") == 2L)
    assert(r.getAs[Double]("r2_r") == 1.0, r.toString)
  }

  test("signFlipTest: an all-zero difference series is maximally " +
      "compatible with symmetry (p = 1); a large constant shift is " +
      "not") {
    val zeros = (1 to 20).map(i =>
      (java.sql.Date.valueOf(f"2024-01-$i%02d"), 0L)).toDF("day", "d")
    val r1 = Infer.signFlipTest(zeros, "day", "d").collect()(0)
    assert(r1.getAs[Double]("p_r") == 1.0, r1.toString)
    val shift = (1 to 20).map(i =>
      (java.sql.Date.valueOf(f"2024-01-$i%02d"), 1000L))
      .toDF("day", "d")
    val r2 = Infer.signFlipTest(shift, "day", "d").collect()(0)
    assert(r2.getAs[Long]("t_obs") == 20000L)
    assert(r2.getAs[Double]("p_r") < 0.2, r2.toString)
  }
}
