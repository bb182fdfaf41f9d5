package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Analytic surface beyond the reference (SURVEY.md §2.5–2.7 ★planned):
  * window functions, rollup/cube, exact + approximate distinct counting.
  */
object AnalyticsQueries {

  val all: Seq[Q] = Seq(

    // Top-k per group via row_number window (deterministic tie-breaks).
    Q("q13_window_topk_per_segment",
      Some("""SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
             |  SELECT c_mktsegment, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY c_mktsegment
             |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders JOIN customer ON o_custkey = c_custkey) t
             |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("c_mktsegment", "rn", "o_orderkey", "o_totalprice")
          .orderBy("c_mktsegment", "rn")
      }),

    // lag() day-over-day style delta per user (raw double subtraction of
    // identical operands — bit-identical across engines).
    Q("q14_window_lag_delta",
      Some("""SELECT event_id,
             | value - lag(value) OVER (PARTITION BY user_id
             |   ORDER BY ts, event_id) AS delta
             |FROM events ORDER BY event_id""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        events(s, d)
          .select(col("event_id"),
            (col("value") - lag(col("value"), 1).over(w)).as("delta"))
          .orderBy("event_id")
      }),

    // Rolling 3-row sum per user (2-decimal grid → round(2) is exact).
    Q("q15_window_rolling_sum",
      Some("""SELECT event_id,
             | round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS roll3
             |FROM events ORDER BY event_id""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id")).rowsBetween(-2, 0)
        events(s, d)
          .select(col("event_id"), round(sum(col("value")).over(w), 2).as("roll3"))
          .orderBy("event_id")
      }),

    // Global rank + dense_rank — WITHOUT a global window. A plain
    // `Window.orderBy(...)` (no partitionBy) moves every row into ONE
    // partition; at scale that is a single-task sort of the whole table.
    // Instead: two-phase rank. Phase 1 ranks within each o_orderpriority
    // partition (row_number over a partitioned window — (priority,
    // orderkey) is unique, so rank ≡ row_number). Phase 2 adds the count
    // of all rows in strictly-smaller priorities, computed from a 5-row
    // priority dimension via a broadcast theta self-join (no Window at
    // all on that path). dense_rank over priority = #smaller priorities
    // + 1 from the same dimension. The oracle keeps the declarative
    // global-window SQL — same result, different plan.
    Q("q16_window_rank_dense",
      Some("""SELECT o_orderkey,
             | rank() OVER (ORDER BY o_orderpriority, o_orderkey) AS rnk,
             | dense_rank() OVER (ORDER BY o_orderpriority) AS drnk
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      (s, d) => {
        val counts = orders(s, d).groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt"))
        val dims = counts.as("a")
          .join(broadcast(counts.as("b")),
            col("b.o_orderpriority") < col("a.o_orderpriority"), "left")
          .groupBy(col("a.o_orderpriority").as("o_orderpriority"))
          .agg(coalesce(sum(col("b.cnt")), lit(0L)).as("offset"),
            (count(col("b.o_orderpriority")) + 1).cast("int").as("drnk"))
        val wIn = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_orderkey"))
        orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"))
          .withColumn("rn", row_number().over(wIn))
          .join(broadcast(dims), Seq("o_orderpriority"))
          .select(col("o_orderkey"),
            (col("offset") + col("rn")).cast("int").as("rnk"), col("drnk"))
          .orderBy("o_orderkey")
      }),

    // ROLLUP over two dims (nulls-first ordering aligned across engines).
    Q("q17_rollup_segment_nation",
      Some("""SELECT c_mktsegment, n_name, count(*) AS n,
             | round(sum(c_acctbal), 2) AS acctbal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY ROLLUP(c_mktsegment, n_name)
             |ORDER BY c_mktsegment NULLS FIRST, n_name NULLS FIRST""".stripMargin),
      (s, d) => customer(s, d)
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("c_mktsegment"), col("n_name"))
        .agg(count(lit(1)).as("n"), round(sum(col("c_acctbal")), 2).as("acctbal"))
        .orderBy(col("c_mktsegment").asc_nulls_first, col("n_name").asc_nulls_first)),

    // CUBE over event dims.
    Q("q18_cube_events",
      Some("""SELECT event_type, CAST(year(ts) AS INT) AS yr, count(*) AS n,
             | round(sum(value), 2) AS total
             |FROM events GROUP BY CUBE(event_type, CAST(year(ts) AS INT))
             |ORDER BY event_type NULLS FIRST, yr NULLS FIRST""".stripMargin),
      (s, d) => events(s, d)
        .select(col("event_type"), year(col("ts")).cast("int").as("yr"),
          col("value"))
        .cube(col("event_type"), col("yr"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .orderBy(col("event_type").asc_nulls_first, col("yr").asc_nulls_first)),

    // Exact distinct counting per group.
    Q("q19_count_distinct",
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
             | count(DISTINCT l_suppkey) AS n_supps
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, d) => lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy("l_returnflag")),

    // approx_count_distinct (HLL++) — sketch internals differ across
    // engines, so the raw estimate itself can't be oracle-hashed.
    // Instead the query emits the EXACT distinct (oracle-checkable) plus
    // `approx_ok` = |approx-exact|/exact < 5%, which DuckDB asserts as
    // the literal TRUE — the driver now verifies both the exact count
    // and that the HLL estimate is in tolerance, closing the one
    // `no_oracle` row from round 6. The raw estimate additionally stays
    // spec-bounded (<5% relative error) in RegistrySpec.
    Q("q20_approx_distinct",
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
             | TRUE AS approx_ok
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, d) => lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")) /
            col("exact_parts") < 0.05).as("approx_ok"))
        .orderBy("l_returnflag")),

    // Batch sessionization (gap rule, 6h): the bounded-table counterpart
    // of the streaming session_window — lag + running-sum + session agg
    // share ONE shuffle by user; gaps compared in exact microseconds
    // (unix_micros / epoch_us) so both engines break sessions identically.
    Q("q68_batch_sessions",
      Some("""WITH e AS (
             |  SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events),
             |g AS (
             |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
             |      OR us - lag(us) OVER w > 21600000000 THEN 1 ELSE 0
             |    END AS news
             |  FROM e WINDOW w AS (PARTITION BY user_id
             |    ORDER BY ts NULLS FIRST, event_id)),
             |s AS (
             |  SELECT *, CAST(sum(news) OVER (PARTITION BY user_id
             |    ORDER BY ts NULLS FIRST, event_id
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
             |  FROM g)
             |SELECT user_id, session_idx, count(*) AS n_events,
             |  min(ts) AS sess_start, max(ts) AS sess_end
             |FROM s GROUP BY user_id, session_idx
             |ORDER BY user_id, session_idx""".stripMargin),
      (s, d) => graft.ops.Sessionize
        .sessions(events(s, d), "user_id", "ts", "event_id",
          gapSeconds = 21600L)
        .orderBy("user_id", "session_idx")),

    // Exact interpolated percentiles (quantile_cont semantics) per group —
    // the distributed order-statistics surface. Quartile fractions only:
    // p·(n−1) has an exact binary fractional part {0, .25, .5, .75}, and
    // l_quantity is integer-valued, so the linear interpolation is exact
    // in double under EITHER association — bit-identical across engines
    // with NO rounding (a .95 percentile would not be). approx_percentile
    // is the sketch path at 100 TB; the exact version shuffles each
    // group's values, fine for bounded group counts. Spec asserts the
    // approx sketch lands within 1 of exact.
    Q("q72_quantiles",
      Some("""SELECT l_returnflag,
             | quantile_cont(l_quantity, 0.25) AS q25,
             | quantile_cont(l_quantity, 0.50) AS q50,
             | quantile_cont(l_quantity, 0.75) AS q75
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, d) => lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(percentile(col("l_quantity"), lit(0.25)).as("q25"),
          percentile(col("l_quantity"), lit(0.50)).as("q50"),
          percentile(col("l_quantity"), lit(0.75)).as("q75"))
        .orderBy("l_returnflag")),

    // Conditional aggregation (count_if / avg over filtered).
    Q("q21_conditional_agg",
      Some("""SELECT o_orderpriority,
             | count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
             | round(avg(o_totalprice), 2) AS avg_price
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      (s, d) => orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          count(when(col("o_totalprice") > 150000, 1)).as("n_big"),
          round(avg(col("o_totalprice")), 2).as("avg_price"))
        .orderBy("o_orderpriority"))
  )
}
