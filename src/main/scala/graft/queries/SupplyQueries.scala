package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Ranks
import graft.util.Tables._

/** Supply-chain analytics batch: daily open-order backlog (cumulative
  * in/out flows) and ABC/Pareto revenue classification (banded-rank
  * cumulative shares — no single-task sort).
  */
object SupplyQueries {

  val all: Seq[Q] = Seq(

    // Daily backlog: orders placed minus orders fully shipped (last
    // line-item ship date), cumulated over the calendar-bounded day
    // grain. Orders with no line items stay open by definition.
    Q("q270_backlog",
      Some("""WITH placed AS (
             |  SELECT o_orderdate::DATE AS day, count(*)::BIGINT AS p
             |  FROM orders GROUP BY 1),
             |done AS (
             |  SELECT last_ship::DATE AS day, count(*)::BIGINT AS c
             |  FROM (SELECT l_orderkey, max(l_shipdate) AS last_ship
             |        FROM lineitem GROUP BY 1) t
             |  GROUP BY 1),
             |flows AS (
             |  SELECT coalesce(pl.day, dn.day) AS day,
             |    coalesce(pl.p, 0)::BIGINT AS placed,
             |    coalesce(dn.c, 0)::BIGINT AS completed
             |  FROM placed pl FULL OUTER JOIN done dn USING (day))
             |SELECT day, placed, completed,
             |  sum(placed - completed) OVER (ORDER BY day
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    ::BIGINT AS backlog
             |FROM flows ORDER BY day""".stripMargin),
      (s, d) => {
        val placed = orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(count(lit(1)).as("placed"))
        val done = lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(max(col("l_shipdate")).as("_ls"))
          .groupBy(to_date(col("_ls")).as("day"))
          .agg(count(lit(1)).as("completed"))
        val wCum = org.apache.spark.sql.expressions.Window
          .orderBy("day")
          .rowsBetween(org.apache.spark.sql.expressions
            .Window.unboundedPreceding, 0)
        placed.join(done, Seq("day"), "full_outer")
          .select(col("day"),
            coalesce(col("placed"), lit(0L)).as("placed"),
            coalesce(col("completed"), lit(0L)).as("completed"))
          .withColumn("backlog",
            sum(col("placed") - col("completed")).over(wCum))
          .orderBy("day")
      }),

    // ABC revenue classification of parts: banded global rank by
    // revenue + banded running sum → INTEGER-exact cumulative-share
    // class cuts (A ≤ 80%, B ≤ 95%) — no float boundary, no
    // single-task sort; per-class rollup.
    Q("q271_abc_analysis",
      Some("""WITH rev AS (
             |  SELECT l_partkey,
             |    sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             |      ::BIGINT AS cents
             |  FROM lineitem GROUP BY 1),
             |tot AS (SELECT sum(cents)::BIGINT AS t FROM rev),
             |c AS (
             |  SELECT l_partkey, cents,
             |    sum(cents) OVER (ORDER BY cents DESC, l_partkey
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      ::BIGINT AS cum
             |  FROM rev),
             |cl AS (
             |  SELECT l_partkey, cents,
             |    CASE WHEN cum * 5 <= 4 * t THEN 'A'
             |         WHEN cum * 20 <= 19 * t THEN 'B'
             |         ELSE 'C' END AS abc_class
             |  FROM c CROSS JOIN tot)
             |SELECT abc_class, count(*)::BIGINT AS n_parts,
             |  sum(cents)::BIGINT AS revenue_cents,
             |  round(sum(cents)::DOUBLE / max(t), 6) AS share_r
             |FROM cl CROSS JOIN tot GROUP BY 1
             |ORDER BY abc_class""".stripMargin),
      (s, d) => {
        val rev = lineitem(s, d)
          .groupBy(col("l_partkey"))
          .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
            .as("cents"))
          .withColumn("_neg", -col("cents"))
        val ranked = Ranks.bandedRank(rev.withColumn("_one", lit(0)),
          groupCol = "_one", valueCol = "_neg", idCol = "l_partkey",
          bandWidth = 1e7).drop("grp_n")
        val withCum = Ranks.bandedRunningSum(ranked, "_one", "rnk",
          "cents", bandWidth = 4096.0)
        val tot = rev.agg(sum(col("cents")).as("_t"))
        withCum.crossJoin(broadcast(tot))
          .withColumn("abc_class",
            when(col("runsum") * 5 <= lit(4) * col("_t"), "A")
              .when(col("runsum") * 20 <= lit(19) * col("_t"), "B")
              .otherwise("C"))
          .groupBy(col("abc_class"))
          .agg(count(lit(1)).as("n_parts"),
            sum(col("cents")).as("revenue_cents"),
            round(sum(col("cents")).cast("double") / max(col("_t")), 6)
              .as("share_r"))
          .orderBy("abc_class")
      }),

    // Concentration profile per market segment: Gini coefficient, HHI
    // and top-1%-customer revenue share (Profile.concentrationProfile)
    // over exact per-customer cents — the scalar inequality readouts
    // complementing q271's ABC cut. One banded rank + one hash-agg;
    // Σr·x and Σx² as DECIMAL/HUGEINT so nothing overflows.
    Q("q286_revenue_concentration",
      Some("""WITH v AS (
             |  SELECT c_mktsegment AS seg, o_custkey AS k,
             |    sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |      ::BIGINT AS x
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1, 2),
             |r AS (
             |  SELECT seg, k, x,
             |    row_number() OVER (PARTITION BY seg ORDER BY x, k)
             |      AS r,
             |    count(*) OVER (PARTITION BY seg) AS n
             |  FROM v),
             |a AS (
             |  SELECT seg, max(n)::BIGINT AS n, sum(x)::BIGINT AS total,
             |    sum(r::HUGEINT * x) AS rx,
             |    sum(x::HUGEINT * x) AS xx,
             |    sum(CASE WHEN r > n - (n + 99) // 100 THEN x
             |      ELSE 0 END)::BIGINT AS topx,
             |    max((n + 99) // 100)::BIGINT AS top_n
             |  FROM r GROUP BY 1)
             |SELECT seg, n, total,
             |  CASE WHEN total > 0 THEN
             |    round(2.0 * rx::DOUBLE / (n::DOUBLE * total::DOUBLE)
             |      - (n + 1)::DOUBLE / n::DOUBLE, 6) END AS gini_r,
             |  CASE WHEN total > 0 THEN
             |    round(xx::DOUBLE / (total::DOUBLE * total::DOUBLE), 6)
             |    END AS hhi_r,
             |  top_n,
             |  CASE WHEN total > 0 THEN
             |    round(topx::DOUBLE / total::DOUBLE, 6)
             |    END AS top_share_r
             |FROM a ORDER BY seg""".stripMargin),
      (s, d) => {
        val v = orders(s, d)
          .join(customer(s, d)
            .select(col("c_custkey"), col("c_mktsegment")),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment").as("seg"),
            col("o_custkey").as("k"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long"))
            .as("x"))
        graft.ops.Profile.concentrationProfile(v, "seg", "x", "k",
            bandWidth = 1e6)
          .orderBy("seg")
      }))
}
