package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PackSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (0L, 10L), (1L, 20L), (2L, 5L), (3L, 40L), (4L, 1L),
    (5L, 99L), (6L, 3L), (7L, 7L), (8L, 30L), (9L, 2L)
  ).toDF("id", "w")

  /** The semantics Pack must equal: a plain global prefix-sum window. */
  private def naive(budget: Long) = docs
    .withColumn("start_offset",
      sum(col("w")).over(Window.orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        - col("w"))
    .withColumn("shard_id", floor(col("start_offset") / budget).cast("long"))
    .select("id", "w", "start_offset", "shard_id")

  test("two-level prefix sum equals the naive global window") {
    for (bucketSize <- Seq(1L, 3L, 4L, 100L)) {
      val got = Pack.packByBudget(docs, "id", "w", budget = 50L,
          bucketSize = bucketSize)
        .select("id", "w", "start_offset", "shard_id")
        .orderBy("id").collect().toSeq
      val want = naive(50L).orderBy("id").collect().toSeq
      assert(got == want, s"bucketSize=$bucketSize")
    }
  }

  test("shard boundaries: a doc STARTING at the budget line opens the " +
      "next shard; one straddling it stays in its start shard") {
    val d = Seq((1L, 10L), (2L, 6L), (3L, 4L), (4L, 8L))
      .toDF("id", "w")
    // offsets: 0, 10, 16, 20 with budget 16 → shards 0, 0, 1, 1;
    // doc 2 (offset 10, w 6) ENDS exactly at 16 and stays in shard 0
    val got = Pack.packByBudget(d, "id", "w", budget = 16L, bucketSize = 2L)
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("shard_id"))).toSeq
    assert(got == Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)))
  }

  test("sparse non-contiguous ids pack identically to their dense order") {
    val sparse = Seq((100L, 10L), (2000L, 20L), (30000L, 5L))
      .toDF("id", "w")
    val got = Pack.packByBudget(sparse, "id", "w", budget = 25L,
        bucketSize = 1000L)
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("start_offset"), r.getAs[Long]("shard_id")))
      .toSeq
    assert(got == Seq((0L, 0L), (10L, 0L), (30L, 1L)))
  }

  test("lengthBucketBatches: two-level per-bucket numbering equals the " +
      "flat window reference across range sizes; padding arithmetic") {
    val rows = (0L until 40L).map(i => (i, (i * 7 % 100) + 1))
    val df = rows.toDF("id", "w")
    // flat reference: per length-band, number rows in id order, cut
    // into batches of 4
    val want = rows.groupBy(_._2 / 32).toSeq.flatMap { case (b, rs) =>
      rs.sortBy(_._1).zipWithIndex.groupBy(_._2 / 4).map {
        case (bi, grp) =>
          val ws = grp.map(_._1._2)
          (b, bi.toLong, ws.size.toLong, ws.sum, ws.max,
            ws.size * ws.max - ws.sum)
      }
    }.sortBy(t => (t._1, t._2))
    // rangeSize 8 → five id-ranges (the multi-range two-level path);
    // rangeSize 1000 → single range (degenerate path). Same answer.
    for (rangeSize <- Seq(8L, 1000L)) {
      val got = Pack.lengthBucketBatches(df, "id", "w",
          bucketWidth = 32L, batchSize = 4, rangeSize = rangeSize)
        .orderBy("bucket", "batch_idx").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
      assert(got == want, s"rangeSize=$rangeSize")
    }
  }

  test("lengthBucketBatches: equal lengths in a band pad zero; a " +
      "mixed band pads to its max") {
    val df = Seq((1L, 10L), (2L, 10L), (3L, 10L), // band 0, equal
      (4L, 100L), (5L, 90L)).toDF("id", "w")     // band 1 (width 64)
    val got = Pack.lengthBucketBatches(df, "id", "w",
        bucketWidth = 64L, batchSize = 8)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(5))).toSeq
    // (bucket, n_docs, padding): equal-length batch wastes nothing;
    // the 100/90 batch pads 90→100
    assert(got == Seq((0L, 3L, 0L), (1L, 2L, 10L)))
  }

  private val shardSet = Seq("s0" -> 1, "s1" -> 1, "s2" -> 2, "s3" -> 4)

  test("rendezvousAssign: every row placed once; weight ordering shows " +
      "in the shard sizes (w=4 shard largest)") {
    val ids = (0L until 200L).toDF("id")
    val got = Pack.rendezvousAssign(ids, "id", shardSet)
    assert(got.count() == 200L)
    val sizes = got.groupBy("shard").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set("s0", "s1", "s2", "s3"),
      s"all shards must receive rows: $sizes")
    assert(sizes("s3") == sizes.values.max,
      s"the weight-4 shard must be the largest: $sizes")
  }

  test("rendezvousAssign: removing one shard moves ONLY that shard's " +
      "rows (minimal disruption — the property that makes resharding " +
      "an incremental copy)") {
    val ids = (0L until 200L).toDF("id")
    val full = Pack.rendezvousAssign(ids, "id", shardSet)
      .withColumnRenamed("shard", "f")
    val reduced = Pack.rendezvousAssign(ids, "id",
        shardSet.filterNot(_._1 == "s3"))
      .withColumnRenamed("shard", "r")
    val rows = full.join(reduced, "id").collect()
      .map(r => (r.getAs[String]("f"), r.getAs[String]("r")))
    assert(rows.exists(_._1 == "s3"), "fixture must exercise the move")
    rows.foreach { case (f, r) =>
      if (f != "s3") assert(f == r, s"stable row moved: $f -> $r")
      else assert(r != "s3", "dropped shard cannot win")
    }
  }

  test("rendezvousAssign: a single shard takes everything; two runs " +
      "are identical (md5-deterministic)") {
    val ids = (0L until 50L).toDF("id")
    assert(Pack.rendezvousAssign(ids, "id", Seq("only" -> 2))
      .select("shard").distinct().collect().map(_.getString(0)).toSeq
      == Seq("only"))
    val a = Pack.rendezvousAssign(ids, "id", shardSet).orderBy("id")
      .collect().toSeq
    val b = Pack.rendezvousAssign(ids, "id", shardSet).orderBy("id")
      .collect().toSeq
    assert(a == b)
  }
}
