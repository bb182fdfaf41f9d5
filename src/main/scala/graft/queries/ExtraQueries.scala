package graft.queries

import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Remaining surface: embedding-cosine near-dup, theta/range join, and the
  * SQL front-end (spark.sql over registered views — proving the engine's
  * queries are reachable from SQL text, not just the DataFrame DSL).
  */
object ExtraQueries {

  val all: Seq[Q] = Seq(

    // Embedding near-dup pairs: sign-bit LSH candidate generation (8 bands
    // × 8 bits, band-key equi-join — no all-pairs join anywhere in the
    // plan) + exact cosine verify; the strongest 20 candidate pairs are
    // reported. Both engines derive identical signatures from the shared
    // Rademacher sign matrix, so results hash-match by construction; see
    // ops.EmbeddingLsh for the recall/efficiency contract.
    Q("q48_embedding_neardup",
      Some(graft.ops.EmbeddingLsh
        .duckdbPairsSql("embeddings", "vec_id", "embedding", 64, 0.35) +
        "\nORDER BY cos_sim DESC, vec_a, vec_b LIMIT 20"),
      (s, d) => graft.ops.EmbeddingLsh
        .nearDupPairs(embeddings(s, d), "vec_id", "embedding", 64, 0.35)
        .orderBy(col("cos_sim").desc, col("vec_a"), col("vec_b"))
        .limit(20)),

    // Theta/range join: orders binned into price bands via a BETWEEN
    // condition against a small band dimension (broadcast nested-loop).
    Q("q49_range_join_bands",
      Some("""WITH bands(band, lo, hi) AS (VALUES
             |  ('low', 0.0, 100000.0),
             |  ('mid', 100000.0, 300000.0),
             |  ('high', 300000.0, 1000000.0))
             |SELECT band, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders JOIN bands
             |  ON o_totalprice >= lo AND o_totalprice < hi
             |GROUP BY band ORDER BY band""".stripMargin),
      (s, d) => {
        import s.implicits._
        val bands = Seq(
          ("low", 0.0, 100000.0),
          ("mid", 100000.0, 300000.0),
          ("high", 300000.0, 1000000.0)).toDF("band", "lo", "hi")
        orders(s, d)
          .join(broadcast(bands),
            col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
          .orderBy("band")
      }),

    // Custom typed Aggregator: bounded top-k per group (map-side combine,
    // k-row buffers — see ops.TopKByScore scaladoc); oracle via ordered
    // list slice.
    Q("q56_topk_aggregator",
      Some("""SELECT o_orderpriority,
             | array_to_string(
             |   (list(o_orderkey ORDER BY o_totalprice DESC, o_orderkey))[1:3],
             |   ',') AS ids
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin),
      (s, d) => {
        val agg = udaf(new graft.ops.TopKByScore(3))
        orders(s, d)
          .groupBy(col("o_orderpriority"))
          .agg(array_join(agg(col("o_totalprice"), col("o_orderkey")), ",")
            .as("ids"))
          .orderBy("o_orderpriority")
      }),

    // SQL front-end: TPC-H Q3-shaped text query over temp views.
    Q("q50_sql_text",
      Some("""SELECT o_orderkey,
             | round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
             | o_orderpriority
             |FROM customer JOIN orders ON c_custkey = o_custkey
             | JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |GROUP BY o_orderkey, o_orderpriority
             |ORDER BY revenue DESC, o_orderkey LIMIT 20""".stripMargin),
      (s, d) => {
        customer(s, d).createOrReplaceTempView("customer")
        orders(s, d).createOrReplaceTempView("orders")
        lineitem(s, d).createOrReplaceTempView("lineitem")
        s.sql("""SELECT o_orderkey,
                | round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
                | o_orderpriority
                |FROM customer JOIN orders ON c_custkey = o_custkey
                | JOIN lineitem ON l_orderkey = o_orderkey
                |WHERE c_mktsegment = 'BUILDING'
                |GROUP BY o_orderkey, o_orderpriority
                |ORDER BY revenue DESC, o_orderkey LIMIT 20""".stripMargin)
      })
  )
}
