package graft.queries

import graft.SparkTestBase

/** Smoke + structural checks over every registered query on sf0.001.
  * Exact value correctness is the driver's DuckDB oracle (t2) plus
  * tools/check_oracle.py locally; here we pin schema/determinism basics. */
class RegistrySpec extends SparkTestBase {

  test("no duplicate names; every oracle key exists in queries") {
    assert(Registry.byName.size == Registry.all.size)
    val qnames = graft.SparkEntry.queries.keySet
    assert(graft.SparkEntry.oracleSql.keySet.subsetOf(qnames))
  }

  test("README/COVERAGE query counts match the registry (stale-count " +
      "docs once let a broken query slip the correctness gate)") {
    val registered = Registry.all.size
    val oracled = Registry.all.count(_.oracle.nonEmpty)
    val claim = s"$registered registered queries, $oracled with DuckDB"
    val readme = java.nio.file.Files.readString(
      java.nio.file.Paths.get("/root/repo/README.md"))
    assert(readme.contains(claim),
      s"README.md must say '$claim' (registry truth)")
    val coverage = java.nio.file.Files.readString(
      java.nio.file.Paths.get("/root/repo/COVERAGE.md"))
    assert(coverage.contains(s"$registered queries registered; " +
      s"$oracled with DuckDB oracles"),
      s"COVERAGE.md tail count must match the registry " +
        s"($registered/$oracled)")
    // every registered query appears in COVERAGE's queries column
    val missing = Registry.all.map(_.name.takeWhile(_ != '_'))
      .filterNot(qn => coverage.contains(qn))
    assert(missing.isEmpty, s"COVERAGE.md has no row mentioning: $missing")
  }

  test("entry returns rows on sf0.001 (t1 smoke)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  /** The Verify dump-order invariant: check_oracle's compare is
    * strictly row-order-sensitive and the un-coalesced parquet dump
    * only has a machine-independent order when the plan ends in a
    * global Sort (range partitioning → part files glob back in order).
    * Walks through order-preserving wrappers (Project/Limit/alias). */
  private def topGlobalSort(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    p match {
      case s: Sort => s.global
      case pr: Project => topGlobalSort(pr.child)
      case l: GlobalLimit => topGlobalSort(l.child)
      case l: LocalLimit => topGlobalSort(l.child)
      case s: SubqueryAlias => topGlobalSort(s.child)
      case _ => false
    }
  }

  Registry.all.foreach { q =>
    test(s"${q.name}: runs on sf0.001, deterministic across two runs") {
      val df = q.fn(spark, sf())
      val a = df.collect()
      val b = q.fn(spark, sf()).collect()
      assert(a.toSeq == b.toSeq, s"${q.name} nondeterministic")
      // multi-row results must pin their dump order with a plan-visible
      // global Sort (single-row frames are order-trivial); an
      // availableProcessors-dependent Verify posture must never change
      // row order (round-13 ADVICE)
      if (a.length > 1)
        assert(topGlobalSort(df.queryExecution.analyzed),
          s"${q.name} returns ${a.length} rows but its plan does not " +
            "end in a global Sort — dump row order would be " +
            "machine-dependent")
    }
  }

  test("approx_percentile (the 100 TB sketch path) lands within 1 of " +
      "q72's exact quartiles") {
    import org.apache.spark.sql.functions._
    val exact = Registry.byName("q72_quantiles").fn(spark, sf())
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = graft.util.Tables.lineitem(spark, sf())
      .groupBy(col("l_returnflag"))
      .agg(approx_percentile(col("l_quantity"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("qs"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Double](1)).toMap
    exact.foreach { case (flag, ex) =>
      ex.zip(approx(flag)).foreach { case (e, a) =>
        assert(math.abs(e - a) <= 1.0, s"$flag: exact $e vs approx $a")
      }
    }
  }

  test("q20_approx_distinct within 5% of exact") {
    import org.apache.spark.sql.functions._
    // the query itself now emits (l_returnflag, exact_parts, approx_ok):
    // exact_parts must equal the independent countDistinct, and approx_ok
    // (the in-query 5% tolerance check on the HLL estimate) must hold
    val out = Registry.byName("q20_approx_distinct").fn(spark, sf())
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    // independent bound check of the RAW estimate, not just the flag
    val approx = graft.util.Tables.lineitem(spark, sf())
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.util.Tables.lineitem(spark, sf())
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      assert(math.abs(ap - ex) / ex < 0.05, s"$k: approx $ap vs exact $ex")
      assert(out(k)._1 == ex, s"$k: query exact_parts ${out(k)._1} vs $ex")
      assert(out(k)._2, s"$k: approx_ok flag false")
    }
  }
}
