package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BitmapsSpec extends SparkTestBase {
  import spark.implicits._

  test("bitmapDistinct == count(DISTINCT) on random data with word " +
      "boundaries (ids 0, 63, 64, 127, sparse highs; fixed seed)") {
    val rnd = new scala.util.Random(7)
    val boundary = Seq(0L, 63L, 64L, 127L, 128L, 4095L, 100000L)
    val rows = (boundary ++ Seq.fill(500)(rnd.nextInt(200).toLong))
      .map(id => (s"k${id % 3}", id)) ++ boundary.map(id => ("k0", id))
    val df = rows.toDF("key", "id")
    val got = Bitmaps.bitmapDistinct(df, "key", "id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = df.groupBy("key")
      .agg(countDistinct(col("id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("bitmapDistinct: duplicates collapse; single id per key counts 1") {
    val df = Seq(("a", 5L), ("a", 5L), ("a", 5L), ("b", 63L))
      .toDF("key", "id")
    val got = Bitmaps.bitmapDistinct(df, "key", "id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "b" -> 1L))
  }

  test("bitmapOverlap ≡ brute-force set intersection/union/Jaccard " +
      "(boundary ids, shared and disjoint words, fixed seed)") {
    val rnd = new scala.util.Random(3)
    val rows = (Seq(("a", 0L), ("a", 63L), ("b", 63L), ("b", 64L),
      ("c", 4096L)) ++
      Seq.fill(300)((s"k${rnd.nextInt(3)}", rnd.nextInt(150).toLong)))
      .toDF("key", "id")
    val got = Bitmaps.bitmapOverlap(rows, "key", "id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val sets = rows.collect()
      .map(r => (r.getString(0), r.getLong(1))).distinct
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val keys = sets.keys.toSeq.sorted
    val want = (for {
      i <- keys; j <- keys if i < j
      common = (sets(i) & sets(j)).size if common > 0
      union = (sets(i) | sets(j)).size
    } yield (i, j) -> ((common.toLong, union.toLong,
      BigDecimal(common.toDouble / union)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))).toMap
    assert(got == want, s"got=$got want=$want")
    // 'c' shares no words with anyone -> absent
    assert(!got.keySet.exists(p => p._1 == "c" || p._2 == "c"))
  }

  test("wordTable fails fast on a negative id instead of silently " +
      "corrupting the bitmap (negative % → negative shift)") {
    val df = Seq(("a", 5L), ("a", -1L)).toDF("key", "id")
    val e = intercept[Exception] {
      Bitmaps.bitmapDistinct(df, "key", "id").collect()
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ chain(x.getCause))
    assert(chain(e).exists(_.contains("non-negative")),
      s"expected the guard message in: ${chain(e)}")
  }

  test("bitmapDistinct plans two plain aggs — no Expand (the " +
      "countDistinct penalty the bitmap path exists to avoid)") {
    val df = Seq(("a", 1L)).toDF("key", "id")
    val plan = Bitmaps.bitmapDistinct(df, "key", "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"unexpected Expand:\n$plan")
  }
}
