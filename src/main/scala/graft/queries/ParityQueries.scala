package graft.queries

import org.apache.spark.sql.functions._

import graft.etl.Incremental
import graft.expr.Iso8601.iso8601_seconds
import graft.util.Tables._

/** Parity surface: the reference's operator inventory (SURVEY.md §2.1
  * O1–O27) re-expressed over the driver testdata. Float determinism notes:
  * sums of 2-decimal data are rounded to 2 (true sum sits on the 0.01 grid,
  * far from any rounding boundary relative to double error); quotients and
  * exact-integer-valued sums are emitted raw (bit-identical both engines).
  */
object ParityQueries {

  val all: Seq[Q] = Seq(

    // §2.5 hash aggregation with partial+final (TPC-H Q1 shape).
    Q("q01_pricing_summary",
      Some("""SELECT l_returnflag, l_linestatus,
             | CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
             | round(sum(l_extendedprice), 2) AS sum_base_price,
             | round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
             | CAST(sum(l_quantity) AS DOUBLE) / count(*) AS avg_qty,
             | count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      (s, d) => lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).cast("double").as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("sum_disc_price"),
          (sum(col("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // Flagship: 3-way join (customer ⋈ orders ⋈ lineitem) + broadcast dim
    // (nation) + hash agg. Catalyst broadcasts nation (25 rows) and plans
    // shuffled joins on the fact keys — the 100 TB-correct shape.
    Q("q02_mktsegment_revenue",
      Some("""SELECT c_mktsegment, n_name,
             | round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
             | count(DISTINCT o_orderkey) AS n_orders
             |FROM customer
             | JOIN nation ON c_nationkey = n_nationkey
             | JOIN orders ON o_custkey = c_custkey
             | JOIN lineitem ON l_orderkey = o_orderkey
             |GROUP BY c_mktsegment, n_name
             |ORDER BY c_mktsegment, n_name""".stripMargin),
      (s, d) => customer(s, d)
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(orders(s, d), col("o_custkey") === col("c_custkey"))
        .join(lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("c_mktsegment"), col("n_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_mktsegment"), col("n_name"))),

    // O4 distinct (hash-aggregate dedup).
    Q("q03_distinct_flags",
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      (s, d) => lineitem(s, d)
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")),

    // O8 LEFT ANTI join — the incremental-filter heart (:160).
    Q("q04_anti_join_customers",
      Some("""SELECT c_custkey FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin),
      (s, d) => customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey").orderBy("c_custkey")),

    // LEFT SEMI join (EXISTS).
    Q("q05_semi_join_customers",
      Some("""SELECT c_custkey FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
             |ORDER BY c_custkey""".stripMargin),
      (s, d) => customer(s, d)
        .join(orders(s, d).filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey").orderBy("c_custkey")),

    // O12/O13 null-safe cast + fill over JSON-extracted field (§2.9).
    Q("q06_json_cast_nullfill",
      Some("""SELECT event_id,
             | coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS k
             |FROM events ORDER BY event_id""".stripMargin),
      (s, d) => events(s, d)
        .select(col("event_id"),
          coalesce(get_json_object(col("props"), "$.k").cast("long"), lit(0L))
            .as("k"))
        .orderBy("event_id")),

    // O17–O19 date parts: year / day-name / time-of-day string.
    Q("q07_date_parts",
      Some("""SELECT o_orderkey,
             | CAST(year(o_orderdate) AS INT) AS publish_year,
             | dayname(o_orderdate) AS day_name,
             | strftime(o_orderdate, '%H:%M:%S') AS time_of_day
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      (s, d) => orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("int").as("publish_year"),
          date_format(col("o_orderdate"), "EEEE").as("day_name"),
          date_format(col("o_orderdate"), "HH:mm:ss").as("time_of_day"))
        .orderBy("o_orderkey")),

    // O21 ratio arithmetic with ÷0 → null (nullif both engines).
    Q("q08_ratios",
      Some("""SELECT l_orderkey, l_linenumber,
             | l_extendedprice / nullif(l_quantity, 0) AS unit_price,
             | l_discount / nullif(l_tax, 0) AS disc_tax_ratio
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, d) => lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") / nullif(col("l_quantity"), lit(0.0)))
            .as("unit_price"),
          (col("l_discount") / nullif(col("l_tax"), lit(0.0)))
            .as("disc_tax_ratio"))
        .orderBy("l_orderkey", "l_linenumber")),

    // §2.8 set ops: UNION / INTERSECT / EXCEPT (Catalyst rewrites the last
    // two to semi/anti joins — exactly what the reference hand-rolls at :160).
    Q("q09_set_union",
      Some("""SELECT c_nationkey AS nk FROM customer
             |UNION SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin),
      (s, d) => customer(s, d).select(col("c_nationkey").as("nk"))
        .union(supplier(s, d).select(col("s_nationkey")))
        .distinct().orderBy("nk")),

    Q("q10_set_intersect",
      Some("""SELECT c_nationkey AS nk FROM customer
             |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin),
      (s, d) => customer(s, d).select(col("c_nationkey").as("nk"))
        .intersect(supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy("nk")),

    Q("q11_set_except",
      Some("""SELECT c_nationkey AS nk FROM customer
             |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin),
      (s, d) => customer(s, d).select(col("c_nationkey").as("nk"))
        .except(supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy("nk")),

    // §2.7 top-k → TakeOrderedAndProject (no global sort materialized).
    Q("q12_topk_orders",
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin),
      (s, d) => orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)),

    // O20 ISO-8601 duration parse — the custom codegen expression, validated
    // against a pure-arithmetic DuckDB twin on synthesized duration strings.
    Q("q22_iso8601_duration",
      Some("""SELECT o_orderkey,
             | CAST((o_orderkey % 5 + 1) * 3600 + (o_orderkey % 60) * 60
             |      + (o_orderkey % 24) AS DOUBLE) AS duration_sec
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      (s, d) => orders(s, d)
        .select(col("o_orderkey"),
          concat(lit("PT"), (col("o_orderkey") % 5 + 1).cast("int"), lit("H"),
            (col("o_orderkey") % 60).cast("int"), lit("M"),
            (col("o_orderkey") % 24).cast("int"), lit("S")).as("dur"))
        .select(col("o_orderkey"), iso8601_seconds(col("dur")).as("duration_sec"))
        .orderBy("o_orderkey")),

    // O4+O8+O9 incremental batch: dedup → anti-join against the "sink".
    Q("q23_incremental_newkeys",
      Some("""SELECT DISTINCT event_id FROM events
             |WHERE event_id % 3 <> 0 ORDER BY event_id""".stripMargin),
      (s, d) => {
        val ev = events(s, d)
        val fetched = ev.select("event_id")
        val sink = ev.filter(col("event_id") % 3 === 0).select("event_id")
        Incremental.newKeys(fetched, sink, "event_id").orderBy("event_id")
      })
  )
}
