package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Predicate surface, outer joins, window extras, and the generator
  * (UDTF) surface — the SURVEY.md §2.3/§2.4/§2.6/§2.11 lines not already
  * exercised by earlier queries.
  */
object PredicateQueries {

  val all: Seq[Q] = Seq(

    // IN-list, LIKE, BETWEEN, null-safe equality (<=> ≡ IS NOT DISTINCT
    // FROM), boolean composition.
    Q("q51_predicates",
      Some("""SELECT o_orderkey FROM orders
             |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
             |  AND o_orderstatus LIKE 'F%'
             |  AND o_totalprice BETWEEN 50000 AND 200000
             |  AND (o_orderstatus IS NOT DISTINCT FROM 'F')
             |ORDER BY o_orderkey""".stripMargin),
      (s, d) => orders(s, d)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH")
          && col("o_orderstatus").like("F%")
          && col("o_totalprice").between(50000, 200000)
          && (col("o_orderstatus") <=> lit("F")))
        .select("o_orderkey").orderBy("o_orderkey")),

    // FULL OUTER join: customers vs a filtered order aggregate — both
    // unmatched sides survive with nulls (nulls-first ordering pinned).
    Q("q52_full_outer_join",
      Some("""SELECT c_custkey, n_big
             |FROM (SELECT c_custkey FROM customer WHERE c_custkey % 7 = 0) c
             |FULL OUTER JOIN (
             |  SELECT o_custkey, count(*) AS n_big FROM orders
             |  WHERE o_totalprice > 250000 GROUP BY o_custkey) o
             | ON c_custkey = o_custkey
             |ORDER BY c_custkey NULLS FIRST, n_big NULLS FIRST""".stripMargin),
      (s, d) => {
        val c = customer(s, d).filter(col("c_custkey") % 7 === 0)
          .select("c_custkey")
        val o = orders(s, d).filter(col("o_totalprice") > 250000)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big"))
        c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(col("c_custkey"), col("n_big"))
          .orderBy(col("c_custkey").asc_nulls_first, col("n_big").asc_nulls_first)
      }),

    // Window extras: ntile / percent_rank / cume_dist / first+last value.
    Q("q53_window_extras",
      Some("""SELECT o_orderkey,
             | ntile(4) OVER w AS quartile,
             | percent_rank() OVER w AS pr,
             | cume_dist() OVER w AS cd,
             | first_value(o_orderkey) OVER w AS first_key,
             | last_value(o_orderkey) OVER (PARTITION BY o_orderpriority
             |   ORDER BY o_totalprice, o_orderkey
             |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |   AS last_key
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderpriority
             |             ORDER BY o_totalprice, o_orderkey)
             |ORDER BY o_orderkey""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        val wFull = w.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
        orders(s, d).select(col("o_orderkey"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          first(col("o_orderkey")).over(w).as("first_key"),
          last(col("o_orderkey")).over(wFull).as("last_key"))
          .orderBy("o_orderkey")
      }),

    // Explicit GROUPING SETS (beyond rollup/cube): independent grouping
    // combinations in one pass (expand + single shuffle).
    Q("q58_grouping_sets",
      Some("""SELECT c_mktsegment, n_name, count(*) AS n
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY GROUPING SETS ((c_mktsegment), (n_name))
             |ORDER BY c_mktsegment NULLS FIRST, n_name NULLS FIRST""".stripMargin),
      (s, d) => {
        customer(s, d).createOrReplaceTempView("customer")
        nation(s, d).createOrReplaceTempView("nation")
        s.sql("""SELECT c_mktsegment, n_name, count(*) AS n
                |FROM customer JOIN nation ON c_nationkey = n_nationkey
                |GROUP BY GROUPING SETS ((c_mktsegment), (n_name))
                |ORDER BY c_mktsegment ASC NULLS FIRST,
                |  n_name ASC NULLS FIRST""".stripMargin)
      }),

    // MapType surface (§2.9: events.props → from_json map): parse, key
    // access, cardinality, key listing.
    Q("q55_map_funcs",
      Some("""SELECT event_id,
             | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
             | CAST(len(json_keys(props)) AS INT) AS n_keys,
             | array_to_string(list_sort(json_keys(props)::VARCHAR[]), ',')
             |   AS keys_sorted
             |FROM events ORDER BY event_id""".stripMargin),
      (s, d) => events(s, d)
        .withColumn("m", from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.LongType)))
        .select(col("event_id"),
          element_at(col("m"), "k").as("k_val"),
          size(col("m")).as("n_keys"),
          array_join(sort_array(map_keys(col("m"))), ",").as("keys_sorted"))
        .orderBy("event_id")),

    // Multiset (bag) semantics: EXCEPT ALL / INTERSECT ALL keep
    // multiplicities — counts aggregated for deterministic output.
    Q("q59_multiset_ops",
      Some("""WITH a AS (SELECT l_returnflag AS flag FROM lineitem
             |          WHERE l_orderkey % 2 = 0),
             |b AS (SELECT l_returnflag AS flag FROM lineitem
             |      WHERE l_orderkey % 3 = 0)
             |SELECT op, flag, n FROM (
             |  SELECT 'except' AS op, flag, count(*) AS n
             |  FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY flag
             |  UNION ALL
             |  SELECT 'intersect' AS op, flag, count(*) AS n
             |  FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY flag)
             |ORDER BY op, flag""".stripMargin),
      (s, d) => {
        val li = lineitem(s, d)
        // Both branches (EXCEPT ALL and INTERSECT ALL) consume a AND b —
        // uncached, lineitem would be scanned four times. Caching the two
        // one-column filtered projections (tiny vs the table) halves the
        // scans; Verify/Bench clear the cache after each query.
        val a = li.filter(col("l_orderkey") % 2 === 0)
          .select(col("l_returnflag").as("flag")).cache()
        val b = li.filter(col("l_orderkey") % 3 === 0)
          .select(col("l_returnflag").as("flag")).cache()
        val ex = a.exceptAll(b).groupBy(col("flag"))
          .agg(count(lit(1)).as("n")).withColumn("op", lit("except"))
        val in = a.intersectAll(b).groupBy(col("flag"))
          .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect"))
        ex.unionByName(in).select("op", "flag", "n").orderBy("op", "flag")
      }),

    // Date arithmetic breadth: add_months (end-of-month clamped the same
    // way by both engines), datediff, trunc, quarter, ISO week, last_day,
    // day-of-week (DuckDB is 0-based Sunday; Spark 1-based — aligned).
    Q("q60_date_arith",
      Some("""SELECT o_orderkey,
             | CAST(o_orderdate + INTERVAL 1 month AS DATE) AS next_month,
             | CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             | date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01')
             |   AS days_to_98,
             | CAST(quarter(o_orderdate) AS INT) AS qtr,
             | CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
             | last_day(CAST(o_orderdate AS DATE)) AS month_end,
             | CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      (s, d) => orders(s, d)
        .select(col("o_orderkey"),
          add_months(col("o_orderdate"), 1).as("next_month"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
          datediff(lit("1998-01-01").cast("date"), col("o_orderdate"))
            .as("days_to_98"),
          quarter(col("o_orderdate")).as("qtr"),
          weekofyear(col("o_orderdate")).as("iso_week"),
          last_day(col("o_orderdate")).as("month_end"),
          dayofweek(col("o_orderdate")).as("dow"))
        .orderBy("o_orderkey")),

    // Generator (UDTF) surface: posexplode ≡ unnest with position.
    Q("q54_posexplode",
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
             |           FROM documents WHERE doc_id < 10)
             |SELECT doc_id, i - 1 AS pos, toks[i] AS tok
             |FROM t, unnest(generate_series(1, len(toks))) AS g(i)
             |ORDER BY doc_id, pos""".stripMargin),
      (s, d) => documents(s, d)
        .filter(col("doc_id") < 10)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .withColumnRenamed("col", "tok")
        .select("doc_id", "pos", "tok")
        .orderBy("doc_id", "pos"))
  )
}
