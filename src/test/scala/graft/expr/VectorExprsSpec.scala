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

/** sorted_intersect_count: the row-local Jaccard-verify kernel must be
  * join-multiplicity-exact — equal runs contribute run_a × run_b, the
  * row count an equi-join of the exploded multisets produces. */
class SortedIntersectSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._
  import spark.implicits._
  import graft.expr.VectorKernels.sorted_intersect_count

  test("hand cases: disjoint=0, subset, duplicates multiply") {
    val rows = Seq(
      (1L, Array(1L, 2L, 3L), Array(4L, 5L, 6L), 0L),
      (2L, Array(1L, 2L, 3L), Array(2L, 3L, 9L), 2L),
      (3L, Array(1L, 1L, 2L), Array(1L, 2L, 2L), 4L), // 2*1 + 1*2
      (4L, Array.empty[Long], Array(1L, 2L), 0L),
      (5L, Array(7L), Array(7L), 1L)
    ).toDF("id", "a", "b", "want")
    val got = rows.select(col("id"),
        sorted_intersect_count(col("a"), col("b")).as("got"), col("want"))
      .collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"id=${r.getLong(0)}: got ${r.getLong(1)} want ${r.getLong(2)}"))
  }

  test("randomized: equals the exploded equi-join count") {
    val rnd = new scala.util.Random(42)
    val data = (1 to 50).map { i =>
      def arr = Array.fill(rnd.nextInt(30))(rnd.nextInt(12).toLong).sorted
      (i.toLong, arr, arr)
    }
    val df = data.toDF("id", "a", "b")
    val kernel = df.select(col("id"),
        sorted_intersect_count(col("a"), col("b")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val joined = data.map { case (i, a, b) =>
      val bc = b.groupBy(identity).view.mapValues(_.length.toLong).toMap
      i -> a.map(x => bc.getOrElse(x, 0L)).sum
    }.toMap
    assert(kernel == joined)
  }

  test("interpreted eval matches codegen path") {
    // force interpreted evaluation via the kernel's static method
    val a = org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(Array(1L, 1L, 3L, 5L))
    val b = org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(Array(1L, 3L, 3L, 3L, 5L))
    assert(VectorKernels.sortedIntersect(a, b) == 2L + 3L + 1L)
  }
}

/** Hash60 kernel ≡ the conv(substring(md5,1,15),16,10)::long chain it
  * replaced — value parity on hand and random strings, incl. empty,
  * unicode, and long inputs. */
class Hash60ParitySpec extends SparkTestBase {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("kernel equals the builtin md5-hex chain on varied strings") {
    val rnd = new scala.util.Random(7)
    val strs = Seq("", "a", "the quick brown fox", "κόσμε ünïcode",
      "x" * 5000) ++ (1 to 200).map(_ =>
      rnd.alphanumeric.take(rnd.nextInt(40)).mkString)
    val df = strs.toDF("s")
    val bad = df.select(
        graft.expr.Hash60Kernel.hash60col(col("s")).as("k"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long")
          .as("c"))
      .where(col("k") =!= col("c")).count()
    assert(bad == 0L)
  }

  test("null propagates") {
    val r = Seq[Option[String]](None).toDF("s")
      .select(graft.expr.Hash60Kernel.hash60col(col("s"))).head
    assert(r.isNullAt(0))
  }
}

/** Hash60Grams kernel ≡ explode(transform(sequence, substring)) +
  * hash60 — gram-for-gram parity incl. unicode and short strings. */
class Hash60GramsParitySpec extends SparkTestBase {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("gram kernel equals the transform+substring+hash chain") {
    val rnd = new scala.util.Random(11)
    val strs = Seq("", "ab", "abc", "abcd", "κόσμε ünïcode grams",
      "the quick brown fox") ++ (1 to 100).map(_ =>
      rnd.alphanumeric.take(rnd.nextInt(50)).mkString)
    val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
    val want = df.select(col("id"),
        explode(expr("CASE WHEN length(s) >= 3 THEN " +
          "transform(sequence(1, length(s) - 2), " +
          "i -> substring(s, i, 3)) ELSE array() END")).as("g"))
      .select(col("id"),
        conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long")
          .as("h"))
      .groupBy("id").agg(sort_array(collect_list("h")).as("hs"))
    val got = df.select(col("id"),
        explode(graft.expr.Hash60Kernel.gramHashesCol(col("s"), 3))
          .as("h"))
      .groupBy("id").agg(sort_array(collect_list("h")).as("hs"))
    val bad = want.join(got, Seq("id"))
      .where(want("hs") =!= got("hs")).count()
    assert(bad == 0)
    // row counts must match too (empty-array short strings drop out of
    // both explodes identically)
    assert(want.count() == got.count())
  }
}
