package graft.queries

import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Scalar/aggregate breadth (SURVEY.md §2.5, §2.9): statistical aggregates,
  * string functions, pivot, array functions — each over the testdata with a
  * DuckDB twin. Engine-parity notes: statistical aggregates use different
  * update formulas across engines (Welford vs naive) so results are rounded
  * to a tolerance far above both engines' error; array_distinct order is
  * engine-specific so outputs are sorted before display.
  */
object BreadthQueries {

  val all: Seq[Q] = Seq(

    // Higher-order array functions (lambda surface, §2.9): filter /
    // transform / aggregate over the token array — all codegen-adjacent
    // per-row work, zero shuffle; DuckDB twins are the list_* lambdas.
    // The aggregate() fold is the declarative form of "loop over the
    // array" — no UDF, no explode+groupBy round trip.
    Q("q76_higher_order",
      Some("""SELECT doc_id,
             |  CAST(len(list_filter(t, x -> length(x) > 3)) AS INT)
             |    AS n_long,
             |  CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT)
             |    AS n_tok_chars,
             |  array_to_string(list_transform(t[1:3], x -> upper(x)), ' ')
             |    AS head_upper
             |FROM (SELECT doc_id,
             |        string_split(lower(trim(regexp_replace(text, '\s+',
             |          ' ', 'g'))), ' ') AS t
             |      FROM documents) s
             |ORDER BY doc_id""".stripMargin),
      (s, d) => documents(s, d)
        .withColumn("t",
          split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " "))
        .select(col("doc_id"),
          size(filter(col("t"),
            x => length(x) > 3)).as("n_long"),
          aggregate(col("t"), lit(0L),
            (acc, x) => acc + length(x)).as("n_tok_chars"),
          array_join(transform(slice(col("t"), 1, 3), x => upper(x)), " ")
            .as("head_upper"))
        .orderBy("doc_id")),

    // UNPIVOT (melt): wide measure columns → long (measure, value) rows —
    // the inverse of q46's pivot; map-side expand, no shuffle before the
    // presentation sort. Keyed subset so the long form stays bounded.
    // val is the final sort tiebreak: this testdata does NOT keep
    // (l_orderkey, l_linenumber) unique, so ordering needs the value to
    // be total (identical full rows are interchangeable either way).
    Q("q79_unpivot",
      Some("""SELECT l_orderkey, l_linenumber, measure, val
             |FROM (UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity,
             |         l_extendedprice, l_discount, l_tax
             |       FROM lineitem WHERE l_orderkey % 50 = 0)
             |      ON l_quantity, l_extendedprice, l_discount, l_tax
             |      INTO NAME measure VALUE val) t
             |ORDER BY l_orderkey, l_linenumber, measure, val""".stripMargin),
      (s, d) => lineitem(s, d)
        .filter(col("l_orderkey") % 50 === 0)
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount", "l_tax")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "val")
        .orderBy("l_orderkey", "l_linenumber", "measure", "val")),

    // Statistical aggregates: stddev/percentile/corr/covar.
    Q("q44_stats_agg",
      Some("""SELECT l_returnflag,
             | round(stddev_samp(l_extendedprice), 6) AS sd_price,
             | round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity), 6)
             |   AS med_qty,
             | round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity), 6)
             |   AS q1_qty,
             | round(corr(l_quantity, l_extendedprice), 8) AS corr_qp,
             | round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qp,
             | round(min(l_extendedprice), 2) AS min_price,
             | round(max(l_extendedprice), 2) AS max_price
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, d) => lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_extendedprice")), 6).as("sd_price"),
          round(expr("percentile(l_quantity, 0.5)"), 6).as("med_qty"),
          round(expr("percentile(l_quantity, 0.25)"), 6).as("q1_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 8).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4)
            .as("cov_qp"),
          round(min(col("l_extendedprice")), 2).as("min_price"),
          round(max(col("l_extendedprice")), 2).as("max_price"))
        .orderBy("l_returnflag")),

    // String-function breadth.
    Q("q45_string_funcs",
      Some("""SELECT p_partkey,
             | upper(p_name) AS name_upper,
             | reverse(p_name) AS name_rev,
             | lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
             | translate(p_name, 'ae', '4x') AS name_leet,
             | instr(p_name, 'a') AS first_a,
             | substr(p_name, 1, 5) AS name_head,
             | concat_ws('|', p_brand, p_type) AS brand_type,
             | split_part(p_type, ' ', 1) AS type_head,
             | length(trim(p_name)) AS name_len,
             | levenshtein(p_brand, split_part(p_type, ' ', 1)) AS lev
             |FROM part ORDER BY p_partkey""".stripMargin),
      (s, d) => part(s, d)
        .select(col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          reverse(col("p_name")).as("name_rev"),
          lpad(col("p_partkey").cast("string"), 10, "0").as("key_padded"),
          translate(col("p_name"), "ae", "4x").as("name_leet"),
          instr(col("p_name"), "a").as("first_a"),
          substring(col("p_name"), 1, 5).as("name_head"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          split_part(col("p_type"), lit(" "), lit(1)).as("type_head"),
          length(trim(col("p_name"))).as("name_len"),
          levenshtein(col("p_brand"), split_part(col("p_type"), lit(" "), lit(1)))
            .as("lev"))
        .orderBy("p_partkey")),

    // Pivot (fixed value set → stable schema), oracle via FILTER columns.
    Q("q46_pivot_events",
      Some("""SELECT user_id,
             | count(*) FILTER (WHERE event_type = 'click') AS click,
             | count(*) FILTER (WHERE event_type = 'error') AS error,
             | count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             | count(*) FILTER (WHERE event_type = 'signup') AS signup,
             | count(*) FILTER (WHERE event_type = 'view') AS view
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, d) => events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy("user_id")),

    // Array-function breadth over tokenized text (sorted for parity —
    // array_distinct keeps first-seen order in Spark but not DuckDB).
    Q("q47_array_funcs",
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
             |           FROM documents)
             |SELECT doc_id,
             | len(list_distinct(toks)) AS n_distinct,
             | list_contains(toks, 'the') AS has_the,
             | array_to_string(list_sort(list_distinct(toks))[1:3], ',')
             |   AS first3_sorted,
             | list_sort(list_distinct(toks))[1] AS min_token,
             | toks[1] AS first_token,
             | toks[len(toks)] AS last_token
             |FROM t ORDER BY doc_id""".stripMargin),
      (s, d) => documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"),
          size(array_distinct(col("toks"))).as("n_distinct"),
          array_contains(col("toks"), "the").as("has_the"),
          array_join(slice(sort_array(array_distinct(col("toks"))), 1, 3), ",")
            .as("first3_sorted"),
          sort_array(array_distinct(col("toks"))).getItem(0).as("min_token"),
          element_at(col("toks"), 1).as("first_token"),
          element_at(col("toks"), -1).as("last_token"))
        .orderBy("doc_id"))
  )
}
