package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.util.Tables

class TopKSpec extends SparkTestBase {
  import spark.implicits._

  test("aggregator top-k equals the window row_number form") {
    val orders = Tables.orders(spark, sf())

    // window form: full sort per group
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .groupBy(col("o_orderpriority"))
      .agg(collect_list(col("o_orderkey")).as("ids"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap

    // aggregator form: bounded buffers, map-side combine
    val agg = udaf(new TopKByScore(3))
    val viaAgg = orders
      .groupBy(col("o_orderpriority"))
      .agg(agg(col("o_totalprice"), col("o_orderkey")).as("ids"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap

    assert(viaAgg == viaWindow)
  }

  test("partial aggregation: plan shows partial + final (map-side top-k)") {
    val agg = udaf(new TopKByScore(2))
    val df = Tables.orders(spark, sf())
      .groupBy(col("o_orderpriority"))
      .agg(agg(col("o_totalprice"), col("o_orderkey")).as("ids"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_topkbyscore") || p.contains("ObjectHashAggregate")
      || p.contains("SortAggregate"),
      s"expected a partial aggregate phase; plan:\n${p.take(600)}")
  }

  test("k larger than group yields the whole group ordered") {
    val df = Seq(("a", 1.0, 1L), ("a", 3.0, 2L), ("a", 2.0, 3L))
      .toDF("g", "score", "id")
    val agg = udaf(new TopKByScore(10))
    val got = df.groupBy(col("g")).agg(agg(col("score"), col("id")).as("ids"))
      .head.getSeq[Long](1).toList
    assert(got == List(2L, 3L, 1L))
  }

  test("ties break deterministically (score desc, id asc)") {
    val df = Seq(("a", 5.0, 9L), ("a", 5.0, 3L), ("a", 5.0, 7L))
      .toDF("g", "score", "id")
    val agg = udaf(new TopKByScore(2))
    val got = df.groupBy(col("g")).agg(agg(col("score"), col("id")).as("ids"))
      .head.getSeq[Long](1).toList
    assert(got == List(3L, 7L))
  }
}
