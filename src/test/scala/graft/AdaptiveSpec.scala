package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

import graft.util.Tables

/** Runtime-adaptivity + observability evidence (SURVEY.md §4: AQE is part
  * of the engine posture; O24/O25 observability maps to observe() +
  * QueryExecutionListener).
  */
class AdaptiveSpec extends SparkTestBase {

  test("AQE coalesces post-shuffle partitions below the static setting") {
    val df = Tables.lineitem(spark, sf())
      .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
    df.collect() // materialize so AQE finalizes the plan
    val adaptive = df.queryExecution.executedPlan
      .collectFirst { case a: AdaptiveSparkPlanExec => a }
    assert(adaptive.isDefined, "plan should be adaptive")
    assert(adaptive.get.executedPlan.toString.contains("AQEShuffleRead"),
      "AQE should re-read the tiny shuffle with coalesced partitions")
  }

  test("runtime bloom-filter join pruning injects on a selective dim " +
      "filter (the 100 TB semi-join-reduction path)") {
    // Production thresholds gate injection on multi-GB scans; lower them
    // so the optimization fires on local test data — what's under test is
    // that the ENGINE's plans are eligible for runtime filtering, i.e.
    // the join is a plain shuffle equi-join Catalyst can wrap.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.number.threshold" -> "10",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force shuffle join
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = Tables.lineitem(spark, sf())
        .select("l_orderkey", "l_quantity")
      val dim = Tables.orders(spark, sf())
        .where(col("o_orderpriority") === "1-URGENT") // selective filter
        .select(col("o_orderkey"))
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter_agg") || p.contains("BloomFilter"),
        s"runtime bloom filter should inject on the fact side:\n$p")
      // and it must not change results
      assert(joined.count() ==
        fact.join(dim.hint("broadcast"),
          col("l_orderkey") === col("o_orderkey")).count())
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("observe() metrics surface through QueryExecutionListener") {
    @volatile var observed: Option[(Long, Long)] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        qe.observedMetrics.get("etl_metrics").foreach { row =>
          observed = Some((row.getAs[Long]("n_rows"), row.getAs[Long]("n_null_views")))
        }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // the reference logs row counts at every stage (O24/O25,
      // fetch_youtube_data.py log() calls) — observe() is the plan-native
      // form: metrics ride the job, no extra pass
      Tables.lineitem(spark, sf())
        .observe("etl_metrics",
          count(lit(1)).as("n_rows"),
          count(when(col("l_quantity").isNull, 1)).as("n_null_views"))
        .filter(col("l_quantity") > 0)
        .collect()
      // listener fires asynchronously; wait briefly
      val deadline = System.currentTimeMillis() + 10000
      while (observed.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(observed.exists(_._1 > 0), s"metrics not observed: $observed")
      assert(observed.exists(_._2 == 0))
    } finally spark.listenerManager.unregister(listener)
  }
}
