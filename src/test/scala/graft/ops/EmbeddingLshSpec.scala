package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.expr.VectorKernels.cosine_sim
import graft.util.Tables

/** Sign-bit LSH over embeddings: bit-parity of the kernel dots with the
  * oracle's explicit sum chains, candidate completeness, and agreement of
  * the end-to-end pairs with brute force restricted to candidates. */
class EmbeddingLshSpec extends SparkTestBase {

  private lazy val emb = Tables.embeddings(spark, sf())

  test("kernel dot products are bit-identical to the left-assoc SQL chain") {
    // the DuckDB twin evaluates dotSql's explicit chain; the Spark side
    // now runs the codegen DotProduct kernel — same float64 bit pattern
    // required for identical signatures on both engines
    val vd = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"), col("embedding"))
    val checks = (0 until EmbeddingLsh.Bits by 7).map { j =>
      val chain = expr(EmbeddingLsh.dotSql("v", j, 64, oneBased = false))
      val plane = array((0 until 64).map(i =>
        lit(EmbeddingLsh.sign(j, i).toFloat)): _*)
      val kernel = graft.expr.VectorKernels.dot_product(col("embedding"), plane)
      sum(when(chain =!= kernel, 1).otherwise(0)).as(s"diff$j")
    }
    val diffs = vd.agg(checks.head, checks.tail: _*).head()
    (0 until diffs.length).foreach(i =>
      assert(diffs.getLong(i) == 0, s"dot mismatch in check column $i"))
  }

  test("every pair sharing a band key is a candidate (completeness)") {
    val bands = EmbeddingLsh.bandedSignatures(emb, "vec_id", "embedding", 64)
      .cache()
    val cand = EmbeddingLsh.candidatePairs(bands, "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val byKey = bands.collect()
      .groupBy(r => (r.getInt(1), r.get(2)))
      .values.filter(_.length > 1)
    byKey.foreach { grp =>
      val ids = grp.map(_.getLong(0)).sorted
      for (a <- ids; b <- ids if a < b)
        assert(cand.contains((a, b)), s"missing candidate ($a, $b)")
    }
    bands.unpersist()
  }

  test("packed-int keys yield the SAME candidate set as the oracle's " +
      "chain-dots + string keys") {
    // mirror the DuckDB twin inside Spark: explicit sum-chain dots,
    // '0'/'1'-string band keys — the formulation duckdbPairsSql emits —
    // and require candidate-set equality with the kernel/packed-int path
    val vd = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val dots = (0 until EmbeddingLsh.Bits).map(j =>
      expr(EmbeddingLsh.dotSql("v", j, 64, oneBased = false)).as(s"d$j"))
    val withDots = vd.select(col("vec_id") +: dots: _*)
    val bandStructs = (0 until EmbeddingLsh.Bands).map { b =>
      val key = EmbeddingLsh.bandKeySql(b,
        bits => s"concat(${bits.mkString(", ")})")
      s"struct($b AS band, $key AS bk)"
    }
    val oracleBands = withDots
      .select(col("vec_id"),
        explode(expr(s"array(${bandStructs.mkString(", ")})")).as("b"))
      .select(col("vec_id"), col("b.band").as("band"), col("b.bk").as("bk"))
    val oracleCand = EmbeddingLsh.candidatePairs(oracleBands, "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = EmbeddingLsh.candidatePairs(
      EmbeddingLsh.bandedSignatures(emb, "vec_id", "embedding", 64), "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == oracleCand)
    assert(got.nonEmpty, "fixture should contain at least one candidate")
  }

  test("nearDupPairs has no false positives vs exact cosine (verify stage)") {
    val got = EmbeddingLsh
      .nearDupPairs(emb, "vec_id", "embedding", 64, 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.forall(_._3 > 0.35))
    assert(got.forall(p => p._1 < p._2))
  }
}
