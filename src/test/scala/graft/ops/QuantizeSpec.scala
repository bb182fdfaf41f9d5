package graft.ops

import scala.util.Random

import graft.SparkTestBase

class QuantizeSpec extends SparkTestBase {
  import spark.implicits._

  test("known vector: scale = max|x|/127, error bounded by scale/2") {
    val df = Seq((1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r = Quantize.int8Diagnostics(df, "vec_id", "embedding")
      .collect().head
    assert(r.getLong(1) == 4L)
    val scale = r.getDouble(2)
    // scale is reported rounded to 9 decimals — compare at that grain
    assert(math.abs(scale - 1.0 / 127.0) < 5e-10)
    // -0.5 = -63.5·scale sits exactly on a half-step — the worst-case
    // reconstruction error scale/2 (floor(+0.5) rounds it up to -63)
    assert(math.abs(r.getDouble(3) - scale / 2.0) < 1e-9)
    assert(r.getDouble(4) > 1.0 - 1e-4)
  }

  test("zero vector degenerates gracefully: err 0, cos 1") {
    val df = Seq((1L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Quantize.int8Diagnostics(df, "vec_id", "embedding")
      .collect().head
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0 &&
      r.getDouble(4) == 1.0)
  }

  test("random vectors: max_abs_err <= scale/2 and cos within 1e-4 of 1 " +
    "(fixed-seed property)") {
    val rnd = new Random(42)
    val rows = (1L to 50L).map(i =>
      (i, Seq.fill(64)((rnd.nextFloat() - 0.5f) * 4.0f)))
    val df = rows.toDF("vec_id", "embedding")
    val got = Quantize.int8Diagnostics(df, "vec_id", "embedding").collect()
    assert(got.length == 50)
    got.foreach { r =>
      val (scale, err, cos) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(err <= scale / 2.0 + 1e-9,
        s"vec ${r.getLong(0)}: err $err > scale/2 ${scale / 2}")
      assert(cos > 1.0 - 1e-4 && cos <= 1.0 + 1e-12)
    }
  }

  test("quantization is per-row and shuffle-free (no Exchange in plan)") {
    val df = Seq((1L, Seq(1.0f))).toDF("vec_id", "embedding")
    val plan = Quantize.int8Diagnostics(df, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("pqEncode: per-subspace nearest codeword, code in subspace order, " +
      "distortion = sqrt of summed L2² (hand case, dim=2, m=2)") {
    val corpus = Seq((10L, Seq(0.9f, 2.1f))).toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1.0f, 1.0f)), (1L, Seq(2.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val got = Quantize.pqEncode(corpus, "vec_id", "embedding", cents,
      "vec_id", m = 2, dim = 2).collect()
    assert(got.length == 1)
    // sub 0: 0.9 -> c0 (0.01 vs 1.21); sub 1: 2.1 -> c1 (0.01 vs 1.21)
    assert(got.head.getString(1) == "0,1")
    val want = math.sqrt((0.9 - 1.0) * (0.9 - 1.0) +
      (2.1f.toDouble - 2.0) * (2.1f.toDouble - 2.0))
    assert(math.abs(got.head.getDouble(2) - want) < 1e-6)
  }

  test("adcTopK == brute-force ADC over a hand codebook (distances, " +
      "order, id tie-break)") {
    val cents = Seq((0L, Seq(0f, 0f, 0f, 0f)), (1L, Seq(1f, 1f, 1f, 1f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Seq(0.1f, 0f, 0.9f, 1f)),  // codes (0,1)
      (11L, Seq(1f, 0.8f, 0f, 0.2f)),  // codes (1,0)
      (12L, Seq(0f, 0f, 0f, 0f)),      // codes (0,0)
      (13L, Seq(1f, 1f, 1f, 1f)))      // codes (1,1)
      .toDF("vec_id", "embedding")
    val codes = Quantize.pqEncode(corpus, "vec_id", "embedding", cents,
      "vec_id", m = 2, dim = 4)
    val qv = Seq(0.9f, 1f, 0.1f, 0f)
    val query = Seq((99L, qv)).toDF("vec_id", "embedding")
    val got = Quantize.adcTopK(codes, "vec_id", "code", query, cents,
        "vec_id", "embedding", m = 2, dim = 4, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // brute force with the SAME float→double widening; each subspace
    // distance is a 2-term sum, so addition order cannot matter
    val cv = Map(0L -> Seq(0.0, 0.0, 0.0, 0.0),
      1L -> Seq(1.0, 1.0, 1.0, 1.0))
    val q = qv.map(_.toDouble)
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val codeOf = Map(10L -> Seq(0L, 1L), 11L -> Seq(1L, 0L),
      12L -> Seq(0L, 0L), 13L -> Seq(1L, 1L))
    val want = codeOf.map { case (id, cs) =>
      val ad = (0 until 2).map { sp =>
        d2(q.slice(sp * 2, sp * 2 + 2), cv(cs(sp)).slice(sp * 2, sp * 2 + 2))
      }.sum
      (id, ad)
    }.toSeq.sortBy { case (id, ad) => (ad, id) }.take(3)
      .zipWithIndex.map { case ((id, ad), i) =>
        (i + 1L, id, BigDecimal(ad).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    assert(got.toSeq == want, s"got=${got.toSeq} want=$want")
  }

  test("adcTopK: the LUT side broadcasts (corpus codes never shuffle " +
      "against vectors)") {
    val cents = Seq((0L, Seq(0f, 0f)), (1L, Seq(1f, 1f)))
      .toDF("vec_id", "embedding")
    val codes = Seq((10L, "0,1"), (11L, "1,0")).toDF("vec_id", "code")
    val query = Seq((99L, Seq(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val plan = Quantize.adcTopK(codes, "vec_id", "code", query, cents,
      "vec_id", "embedding", m = 2, dim = 2, k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the code↔LUT join must broadcast the LUT:\n$plan")
  }

  test("pqEncode: equidistant codewords break ties to the lowest code " +
      "id; self-codebook encodes at zero distortion") {
    val corpus = Seq((10L, Seq(1.5f))).toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1.0f)), (1L, Seq(2.0f)))
      .toDF("vec_id", "embedding")
    val tie = Quantize.pqEncode(corpus, "vec_id", "embedding", cents,
      "vec_id", m = 1, dim = 1).collect().head
    assert(tie.getString(1) == "0" && tie.getDouble(2) == 0.5) // sqrt(0.25)
    val self = Quantize.pqEncode(cents, "vec_id", "embedding", cents,
      "vec_id", m = 1, dim = 1).orderBy("vec_id").collect()
    assert(self.map(_.getString(1)).toSeq == Seq("0", "1"))
    assert(self.forall(_.getDouble(2) == 0.0))
  }
}
