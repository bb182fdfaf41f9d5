package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.queries.Registry
import graft.util.Tables

/** Physical-plan assertions — the SURVEY.md §4 scale posture, pinned as
  * tests so regressions in pushdown/broadcast/co-location are caught, not
  * just observed in .explain output.
  */
class PlanSpec extends SparkTestBase {

  private def plan(name: String): String =
    Registry.byName(name).fn(spark, sf())
      .queryExecution.explainString(FormattedMode)

  /** Simple-mode plan: shows partitioning inline ("Exchange
    * hashpartitioning…"), which FormattedMode's tree section hides. */
  private def simplePlan(name: String): String =
    Registry.byName(name).fn(spark, sf())
      .queryExecution.executedPlan.toString

  test("q01: filter and column pruning reach the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual"),
      "shipdate filter must be pushed to the scan")
    assert(!p.contains("l_partkey"), "unused columns must be pruned")
    assert(p.contains("partial_sum"), "aggregation must be partial+final")
  }

  test("q02: small dimension joins broadcast; agg is partial+final") {
    val p = plan("q02_mktsegment_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("partial_"), "map-side combine expected")
  }

  test("q12 top-k plans TakeOrderedAndProject (no global sort)") {
    val p = plan("q12_topk_orders")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("custom expressions evaluate under CODEGEN_ONLY factory mode") {
    // forces doGenCode paths (no interpreted fallback): a broken generated
    // code template fails here, not silently in production
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val iso = Registry.byName("q22_iso8601_duration").fn(spark, sf())
        .limit(5).collect()
      assert(iso.nonEmpty && iso.forall(!_.isNullAt(1)))
      val cos = Registry.byName("q32_cosine_topk").fn(spark, sf())
        .limit(5).collect()
      assert(cos.nonEmpty)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("bucketed tables co-locate the join: no shuffle exchange") {
    val o = Tables.orders(spark, sf())
    val l = Tables.lineitem(spark, sf())
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a dropped in-memory catalog entry can leave the directory behind
    // from a previous JVM — clear it so CREATE TABLE AS can reuse the path
    Seq("b_orders", "b_lineitem").foreach { t =>
      val dir = new java.io.File(s"/root/repo/target/spark-warehouse/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete())
        dir.delete()
      }
    }
    o.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").saveAsTable("b_orders")
    l.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").saveAsTable("b_lineitem")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_orders").join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"))
      assert(!p.contains("Exchange"),
        s"bucketed join must not shuffle; plan:\n$p")
      assert(j.count() == l.count()) // FK join preserves fact rows
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed edge table: the compact-forward wedge self-join reads " +
      "both sides exchange-free; only the derived wedge frame shuffles") {
    val edges = graft.ops.Graphs.coOccurrenceEdges(
      Tables.lineitem(spark, sf()), "l_orderkey", "l_suppkey", 5L)
    spark.sql("DROP TABLE IF EXISTS probe_edges")
    val tbl = graft.ops.Graphs.bucketedEdgeTable(spark, edges,
      "probe_edges")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevReq = spark.conf
      .get("spark.sql.requireAllClusterKeysForCoPartition")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition",
        "false")
      val p = graft.ops.Graphs.triangleCountsForward(tbl)
        .queryExecution.executedPlan.toString
      // three scans of the bucketed table: wedge self-join (two) +
      // the semi-probe build side — none may re-shuffle. The only
      // acceptable Exchanges: the derived wedge frame into the semi
      // join, plus the final vertex agg.
      val nEx = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(nEx <= 2, s"bucketed wedge plan must keep the edge scans " +
        s"exchange-free (≤2 derived-side shuffles), got $nEx:\n$p")
      assert(p.contains("SortMergeJoin"), s"wedge join must be SMJ:\n$p")
      // and the result equals the classic dst=src orientation
      val a = graft.ops.Graphs.triangleCountsForward(tbl)
        .orderBy("vertex").collect().toSeq
      val b = graft.ops.Graphs.triangleCounts(edges)
        .orderBy("vertex").collect().toSeq
      assert(a == b, "compact-forward must equal the classic wedge build")
      // the SECOND consumer of the same layout (q388 edge support)
      // keeps the same exchange-free scan contract
      val p2 = graft.ops.Graphs.edgeSupportForward(tbl)
        .queryExecution.executedPlan.toString
      val nEx2 = "Exchange hashpartitioning".r.findAllIn(p2).length
      assert(nEx2 <= 2, s"edge-support wedge plan must keep the edge " +
        s"scans exchange-free (<=2 derived-side shuffles), got $nEx2:\n$p2")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition",
        prevReq)
    }
  }

  test("q48: LSH candidate join is an equi-join, never a cross product") {
    val p = plan("q48_embedding_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"all-pairs plan crept back into q48:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      "band-key candidate join must be a hash-based equi-join")
  }

  test("q34: closed-form cohesion plans no join at all") {
    val p = plan("q34_label_cohesion")
    assert(!p.contains("Join"), s"q34 must be a pure aggregate:\n$p")
    assert(p.contains("partial_"), "map-side combine expected")
  }

  test("q16: no single-partition window") {
    val p = plan("q16_window_rank_dense")
    assert(!p.contains("SinglePartition"),
      s"global-window single-partition exchange crept back:\n$p")
  }

  test("q68: sessionization's windows and agg share one user shuffle") {
    val p = plan("q68_batch_sessions")
    val hashExchanges = "hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1,
      s"lag + running-sum + session agg must reuse ONE hash exchange " +
        s"(got $hashExchanges):\n$p")
  }

  test("q74: latest-per-key compaction uses ONE hash exchange, no " +
      "global sort before the final presentation orderBy") {
    val p = plan("q74_latest_per_key")
    val hashExchanges = "hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1,
      s"rank window must be the only shuffle (got $hashExchanges):\n$p")
  }

  test("q78: upsert plans a single latest-per-key shuffle over the " +
      "union, no join") {
    val p = plan("q78_upsert_merge")
    assert(!p.contains("Join"), s"upsert must be union+window, not join:\n$p")
    assert("hashpartitioning".r.findAllIn(p).size == 1,
      s"one rank-window shuffle expected:\n$p")
  }

  test("q72: exact percentiles aggregate with partial+final (map-side " +
      "combine) — no single-point collection") {
    val p = plan("q72_quantiles")
    assert(p.contains("partial_percentile"),
      s"percentile must run partial+final:\n$p")
    assert(!p.contains("SinglePartition"),
      s"percentile must stay group-partitioned:\n$p")
  }

  test("q76: higher-order functions stay in one projection — no shuffle " +
      "before the presentation sort") {
    val p = plan("q76_higher_order")
    // the only exchange allowed is the final orderBy's range partitioning
    assert(!p.contains("hashpartitioning"),
      s"lambda surface must be per-row work:\n$p")
    assert(!p.contains("Generate"),
      s"no explode fallback — the fold must stay declarative:\n$p")
  }

  test("q82: funnel's three stage windows and the per-user collapse " +
      "share ONE hash shuffle") {
    val p = plan("q82_funnel")
    assert("hashpartitioning".r.findAllIn(p).size == 1,
      s"chained whole-partition windows must reuse one exchange:\n$p")
  }

  test("q96: packing's data-path window is bucket-partitioned, never a " +
      "global single-task sort over the input") {
    val p = plan("q96_token_packing")
    assert(p.contains("hashpartitioning(_bucket"),
      s"intra-bucket running sum must partition by bucket:\n$p")
    // the only SinglePartition exchange allowed is the tiny bucket-offset
    // table (joined back via broadcast), whose window input is the
    // |buckets|-row aggregate, not the documents
    assert(p.contains("BroadcastExchange"),
      s"bucket offsets must come back broadcast:\n$p")
  }

  test("q92: rolling reach semi-joins the observed-day dim broadcast") {
    val p = plan("q92_rolling_distinct")
    assert(p.contains("BroadcastHashJoin LeftSemi"),
      s"phantom-day filter must be a broadcast semi-join:\n$p")
  }

  test("q85: fuzzy match is a block-key equi-join, never a cross product") {
    val p = plan("q85_fuzzy_match")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"blocking must keep the match an equi-join:\n$p")
  }

  test("q84: CDC diff is one co-partitioned join with no extra shuffle " +
      "after it") {
    val p = plan("q84_cdc_snapshot_diff")
    // formatted plans print each node twice (tree + detail) — count the
    // detail headers, which appear once per join node
    assert("Join type: ".r.findAllIn(p).size == 1 &&
      p.contains("Join type: FullOuter"),
      s"exactly one full-outer join expected:\n$p")
  }

  test("q100: BM25 corpus constants enter by broadcast; top-k is " +
    "TakeOrderedAndProject, no global sort") {
    val p = plan("q100_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must not materialize a global sort")
    assert(p.contains("BroadcastExchange"),
      "the 1-row constants / df frames must broadcast")
  }

  test("q102: heavy-hitter recount semi-joins the broadcast candidate " +
    "list (the wide groupBy over all distinct terms never happens)") {
    val p = plan("q102_heavy_hitters")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"expected broadcast semi-join against candidates:\n$p")
  }

  test("q99: the gap-fill spine joins co-partitioned — no cartesian, no " +
    "broadcast of the fact side") {
    val p = plan("q99_gapfill_ffill")
    assert(!p.contains("Cartesian"), "spine must never cross-join")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"expected an equi-join:\n$p")
  }

  test("q106: EWMA fan-out is a Generate (map-side explode), not a range " +
    "self-join") {
    val p = plan("q106_ewma_daily")
    assert(p.contains("Generate"), "contributions must come from explode")
    // exactly the joins the plan needs: the semi-join back to observed
    // days — no range join over the fact table
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"),
      s"no quadratic join shapes allowed:\n$p")
  }

  test("q111: weighted sampling is ONE stratum exchange — the A-ES key " +
    "adds no shuffle and the rank filter is a WindowGroupLimit") {
    val p = simplePlan("q111_weighted_sample")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"expected exactly one hash exchange:\n$p")
    assert(p.contains("WindowGroupLimit"),
      "rank<=k must prune inside the window, not after it")
  }

  test("q112: the Z-order key is pure projection — the only exchange " +
    "feeds the 64-key bucket rollup; no join, no expand") {
    val p = simplePlan("q112_zorder_layout")
    assert(!p.contains("Join") && !p.contains("Expand"), s"plan:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"expected exactly one hash exchange:\n$p")
    assert(p.contains("partial_"), "bucket rollup must map-side combine")
  }

  test("q118: bitmap distinct never plans an Expand and both aggs " +
    "map-side combine (the point of the bitmap path)") {
    val p = plan("q118_bitmap_distinct")
    assert(!p.contains("Expand"), s"Expand is the shape being avoided:\n$p")
    assert(p.contains("partial_bit_or") || p.contains("partial_"),
      "word OR must combine map-side")
  }

  test("q120: PQ codebook enters by broadcast; assignment rank is a " +
    "WindowGroupLimit; no corpus self-join") {
    val p = plan("q120_pq_encode")
    assert(p.contains("BroadcastHashJoin"),
      "codebook join must broadcast")
    assert(p.contains("WindowGroupLimit"),
      "argmin rank must prune inside the window")
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"),
      s"no quadratic shapes:\n$p")
  }

  test("q116: the interval join is an equi-join on the bucket — no " +
    "nested-loop theta join anywhere") {
    val p = plan("q116_interval_point_join")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"theta join must have become an equi-join:\n$p")
    assert(p.contains("Generate"),
      "intervals must explode into buckets (Generate)")
  }

  test("q171: the FD audit never plans an Expand (no countDistinct)") {
    val p = plan("q171_fd_violations")
    assert(!p.contains("Expand"),
      s"distinct-value counting must be stacked aggs, not Expand:\n$p")
  }

  test("q174: the chunk-boundary window partitions by doc_id — a task " +
      "sorts one document, never the corpus") {
    val p = simplePlan("q174_content_chunks")
    assert(p.contains("hashpartitioning(doc_id"),
      s"CDC boundary count must be per-doc partitioned:\n$p")
  }

  test("q175: both interleave ranking passes are banded — every " +
      "row_number window carries the _band key, no global sort task") {
    val p = simplePlan("q175_stride_interleave")
    val rowWindows = "row_number\\(\\)[^\\n]*windowspecdefinition\\([^\\n]*"
      .r.findAllIn(p).toSeq
    assert(rowWindows.nonEmpty)
    assert(rowWindows.forall(_.contains("_band")),
      s"unbanded row_number window in stride interleave:\n$rowWindows")
  }

  test("q177: quantile positions join the 3-row spec by broadcast and " +
      "ranks stay banded") {
    val p = simplePlan("q177_exact_quantiles")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"quantile spec must enter as a broadcast:\n$p")
    val rowWindows = "row_number\\(\\)[^\\n]*windowspecdefinition\\([^\\n]*"
      .r.findAllIn(p).toSeq
    assert(rowWindows.nonEmpty && rowWindows.forall(_.contains("_band")),
      s"exactQuantiles rank must be banded:\n$rowWindows")
  }

  test("q195: the PIT join is a keyed equi-join — no cartesian, no " +
      "nested-loop range join") {
    val p = plan("q195_pit_scd2")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"PIT lookup must stay a keyed join:\n$p")
  }

  test("q196: the lateness running max and quantile rank are banded — " +
      "no per-type single-task window over the corpus") {
    val p = simplePlan("q196_lateness_profile")
    val rowWindows = "row_number\\(\\)[^\\n]*windowspecdefinition\\([^\\n]*"
      .r.findAllIn(p).toSeq
    assert(rowWindows.nonEmpty &&
      rowWindows.forall(_.contains("_band")),
      s"quantile rank must be banded:\n$rowWindows")
    // every max() window must carry the band key too
    val maxWindows = "max\\([^\\n]*windowspecdefinition\\([^\\n]*"
      .r.findAllIn(p).toSeq.filter(_.contains("rowsbetween"))
    assert(maxWindows.forall(_.contains("_band")),
      s"running max must be banded:\n$maxWindows")
  }

  test("q200: the scorecard's report branches re-enter by broadcast — " +
      "one row out, no wide join") {
    val p = plan("q200_corpus_scorecard")
    assert("BroadcastExchange".r.findAllIn(p).size >= 3,
      s"scorecard branches must broadcast into the final row:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no wide join belongs in a one-row report:\n$p")
  }

  /** For every Window node in the simple-mode plan, the FIRST Exchange
    * in its own subtree (windows have a single child chain:
    * Window ← Sort ← Exchange) — "" when the subtree holds no
    * exchange (input already partitioned, or a driver-bounded source
    * like TakeOrderedAndProject). */
  private def windowChildExchanges(p: String): Seq[(String, String)] = {
    val lines = p.split('\n')
    def depth(s: String) = s.indexWhere(_.isLetter)
    lines.zipWithIndex.collect {
      case (l, i) if depth(l) >= 0 &&
          l.substring(depth(l)).startsWith("Window") =>
        val d = depth(l)
        l -> lines.drop(i + 1)
          .takeWhile(x => depth(x) < 0 || depth(x) > d)
          .find(_.contains("Exchange"))
          .getOrElse("")
    }.toSeq
  }

  /** A SinglePartition-fed window is legitimate ONLY when it is the
    * two-level machinery's level-1 prefix over the per-band aggregate
    * (its spec orders by `_band` — a #bands-row table); any other
    * single-partition window is a corpus funneled into one task. */
  private def assertWindowsBanded(name: String): String = {
    val p = simplePlan(name)
    val offenders = windowChildExchanges(p).filter { case (w, ex) =>
      ex.contains("SinglePartition") && !w.contains("_band")
    }
    assert(offenders.isEmpty,
      s"$name: data-path window fed by a single-partition exchange:\n" +
        s"$offenders")
    p
  }

  test("r10 banding sweep: no corpus-derived frame feeds an " +
      "unpartitioned window (q302 / q162 / q264)") {
    // q302: the distinct-value cumulative prefix is banded — at 100 TB
    // a continuous metric makes that table data-sized
    val mw = assertWindowsBanded("q302_mann_whitney")
    assert(mw.contains("hashpartitioning") && mw.contains("_band"),
      s"expected a banded data-path window in q302:\n$mw")
    // q162: the Gini prefix runs over the banded frequency-of-
    // frequencies table; top-k ranks sit on a TakeOrderedAndProject
    // (driver-bounded k rows), never a global window over |keys|
    val ks = assertWindowsBanded("q162_key_skew")
    assert(ks.contains("TakeOrderedAndProject"),
      s"q162 top-k must be TakeOrderedAndProject:\n$ks")
    // q264: the global-Q sum is a distributed agg re-entering by
    // broadcast — the community table (graph-shaped) feeds no window
    val mod = simplePlan("q264_modularity")
    assert(windowChildExchanges(mod).isEmpty,
      s"q264 must contain no window at all:\n$mod")
  }

  test("q351: the moment-matrix build plans codegen generators with a " +
      "rebalance before the fan-out and map-side partial aggregation") {
    // the op localCheckpoints the matrix (two consumers), which
    // truncates the final plan — pin the pre-checkpoint build
    val p = graft.ops.Similarity
      .secondMomentMatrix(Tables.embeddings(spark, sf()))
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("Generate") && p.contains("posexplode"),
      "the d² fan-out must be generator-based (codegen), not a " +
        "nested-transform lambda (interpreted)")
    assert(p.toLowerCase.contains("roundrobin"),
      "input must be rebalanced so a single-file scan cannot " +
        "serialize the matrix build on one task")
    assert(p.contains("partial_sum"),
      "the (j, k) moment agg must combine map-side")
    assert(!p.contains("CartesianProduct"))
  }

  test("q354: Theil group stats re-enter by broadcast; term sum is " +
      "partial+final") {
    val p = plan("q354_theil_inequality")
    assert(p.contains("BroadcastHashJoin"),
      "the per-segment (n, total) frame must broadcast, never shuffle " +
        "the customer grain")
    assert(p.contains("partial_sum"))
  }

  test("typeEntropy (q356's corpus pass): the window is " +
      "entity-partitioned, never a single-partition scan") {
    // the registered query ends in a scalar agg whose FINAL exchange is
    // legitimately SinglePartition; the corpus-shaped stage is the
    // per-user entropy op — pin that frame alone
    val p = graft.ops.Behavior
      .typeEntropy(Tables.events(spark, sf()), "user_id", "event_type")
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("Window"), "expected the per-user total window")
    assert(!p.contains("SinglePartition"),
      s"typeEntropy grew a global single-partition exchange:\n$p")
  }

  test("q378: the hard-negative fan-out is rebalanced (no single-file " +
      "serialization) and the kNN window is rank-limited") {
    val p = simplePlan("q378_hard_negatives")
    assert(p.toLowerCase.contains("roundrobin"),
      s"streamed side must be round-robin repartitioned before the " +
        s"|collection|^2 fan-out (the r10 q351 lesson):\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"the top-k-per-anchor window must be rank-limited before the " +
        s"shuffle:\n$p")
  }

  test("q382: Mahalanobis top-k is TakeOrderedAndProject — never a " +
      "corpus-sized unpartitioned window") {
    val p = simplePlan("q382_mahalanobis_outliers")
    assert(p.contains("TakeOrderedAndProject"),
      s"global top-k must be sort+limit (distributed partial top-k):\n$p")
    // the only Window ranks the <=topK post-limit frame
    assert(p.contains("Generate") && p.contains("posexplode"),
      s"the z^2 fan-out must be generator-based (codegen):\n$p")
  }

  test("r12 graph-family migration: the family queries scan the " +
      "PERSISTED bucketed edge tables (Bucketed: true), not a per-query " +
      "co-occurrence rebuild") {
    // one supp-graph reader and one part-graph reader; plan() builds the
    // table if absent (the build-if-absent contract under test)
    Seq("q89_triangle_counts", "q213_degree_assortativity").foreach { n =>
      val p = plan(n)
      assert(p.contains("Bucketed: true"),
        s"$n must read the persisted bucketed edge table:\n$p")
      assert(!p.toLowerCase.contains("l_orderkey"),
        s"$n must not rebuild the co-occurrence join from lineitem:\n$p")
    }
  }

  test("persisted LSH layout: the band-key candidate self-join reads " +
      "both sides of the bucketed band table exchange-free (only the " +
      "final distinct shuffles); shingle/band scans are Bucketed: true") {
    val bands = Tables.docBandTable(spark, sf())
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Tables.withSubsetCoPartition(spark) {
        val cand = graft.ops.Dedup.bandJoin(bands, "doc_id",
          "doc_a", "doc_b")
        val p = cand.queryExecution.executedPlan.toString
        val nEx = "Exchange hashpartitioning".r.findAllIn(p).length
        assert(nEx <= 1, s"band self-join must ride the bk buckets " +
          s"(only the distinct may shuffle), got $nEx exchanges:\n$p")
        val fp = cand.queryExecution.explainString(FormattedMode)
        assert(fp.contains("Bucketed: true"),
          s"band scans must read the persisted bucketed table:\n$fp")
      }
      // the verify stage reads the bucketed shingle table
      val shp = Registry.byName("q30_lsh_jaccard").fn(spark, sf())
        .queryExecution.explainString(FormattedMode)
      assert(shp.contains("Bucketed: true"),
        s"q30 must read persisted bucketed shingles:\n$shp")
      assert(!shp.contains("json_tuple") && !shp.toLowerCase
          .contains("regexp_replace"),
        s"q30 must not re-run the shingle normalize pipeline:\n$shp")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("r13 simhash/SNM/containment migration: the last re-shingling " +
      "trunks read the persisted bucketed layouts") {
    // q31 is a pure scan+sort of the signature table (no join → the
    // planner rightly disables bucketed reading); the pin is that it
    // SCANS the persisted table instead of recomputing signatures
    assert(plan("q31_simhash").contains(".graft_simhash_"),
      s"q31 must scan the persisted signature table:\n${plan("q31_simhash")}")
    // q80 probes the signature table through joins; q146's verify and
    // q156's candidate+verify trunks read the shingle/band tables —
    // there the bucketed layout must actually engage
    Seq("q80_simhash_neardup", "q146_sorted_neighborhood",
        "q156_containment_pairs").foreach { n =>
      val p = plan(n)
      assert(p.contains("Bucketed: true"),
        s"$n must read a persisted bucketed table:\n$p")
    }
    // the signature/shingle pipelines (normalize → tokenize → hash)
    // must be GONE from the probes' plans: q31/q80 never touch raw
    // text, q156 reads only persisted frames. (q146 legitimately
    // normalizes raw text for its 24-char SNM sort key; q81/q149
    // execute eagerly inside their builders, so the lazy-plan check
    // covers the family through q80/q156.)
    Seq("q31_simhash", "q80_simhash_neardup", "q156_containment_pairs")
      .foreach { n =>
        val p = plan(n)
        assert(!p.toLowerCase.contains("regexp_replace"),
          s"$n must not re-run the normalize pipeline:\n$p")
      }
  }

  test("salted join is row-identical to the plain join") {
    val big = Tables.lineitem(spark, sf())
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val small = Tables.orders(spark, sf())
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = big.join(small, Seq("l_orderkey"))
    val salted = graft.ops.Skew.saltedJoin(big, small, "l_orderkey", 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain.select(salted.columns.map(col): _*)).isEmpty)
  }
}
