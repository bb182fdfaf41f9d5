package graft.expr

import org.apache.spark.sql.functions.col

import graft.SparkTestBase
import graft.expr.VectorKernels.{cosine_sim, dot_product}

class VectorExprsSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (2L, Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
    (3L, Array(1.0f, 1.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)) // zero norm
  ).toDF("id", "a", "b")

  test("cosine: orthogonal=0, identical=1, 45°=1/√2, zero-norm=null") {
    val m = df.select(col("id"), cosine_sim(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(m(1L) == 0.0)
    assert(math.abs(m(2L).asInstanceOf[Double] - 1.0) < 1e-12)
    assert(math.abs(m(3L).asInstanceOf[Double] - 1.0 / math.sqrt(2)) < 1e-12)
    assert(m(4L) == null)
  }

  test("dot product matches manual loop") {
    val m = df.select(col("id"), dot_product(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(1L) == 0.0 && m(2L) == 14.0 && m(3L) == 1.0 && m(4L) == 0.0)
  }

  test("null input propagates null") {
    val withNull = Seq((1L, Array(1.0f), null.asInstanceOf[Array[Float]]))
      .toDF("id", "a", "b")
    val r = withNull.select(cosine_sim(col("a"), col("b"))).head
    assert(r.isNullAt(0))
  }
}
