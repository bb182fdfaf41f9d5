package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Infer
import graft.util.Tables._

/** Stratified-inference batch ([[graft.ops.Infer]] round-9 closers):
  * Mantel–Haenszel pooled odds ratio + CMH χ² (the confounder-adjusted
  * association test — Simpson-proof where q198's pooled z is not) and
  * the Cochran–Armitage dose-response trend test.
  */
object StratifiedQueries {

  val all: Seq[Q] = Seq(

    // CMH across day-of-week strata: arm (md5) vs daily-purchase
    // outcome at the (user, day) grain — does the association hold
    // once the weekday mix is controlled for.
    Q("q332_mantel_haenszel",
      Some("""WITH ud AS (
             |  SELECT user_id, ts::DATE AS day,
             |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
             |      END) AS conv
             |  FROM events GROUP BY 1, 2),
             |u AS (
             |  SELECT dayofweek(day)::BIGINT AS dow,
             |    ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT
             |      % 100 >= 50 AS armb,
             |    conv
             |  FROM ud),
             |cell AS (
             |  SELECT dow,
             |    sum(CASE WHEN armb AND conv = 1 THEN 1 ELSE 0 END)
             |      ::BIGINT AS a,
             |    sum(CASE WHEN armb AND conv = 0 THEN 1 ELSE 0 END)
             |      ::BIGINT AS b,
             |    sum(CASE WHEN NOT armb AND conv = 1 THEN 1 ELSE 0
             |      END)::BIGINT AS c,
             |    sum(CASE WHEN NOT armb AND conv = 0 THEN 1 ELSE 0
             |      END)::BIGINT AS d
             |  FROM u GROUP BY 1),
             |agg AS (
             |  SELECT count(*)::BIGINT AS n_strata,
             |    sum(a)::BIGINT AS o_sum,
             |    sum(CASE WHEN a + b + c + d > 0 THEN
             |      round((a + b)::DOUBLE * (a + c)::DOUBLE
             |        / (a + b + c + d)::DOUBLE, 12)::DECIMAL(28,12)
             |      END) AS e,
             |    sum((CASE WHEN a + b + c + d > 1 THEN
             |      round((a + b)::DOUBLE * (c + d)::DOUBLE
             |        * (a + c)::DOUBLE * (b + d)::DOUBLE
             |        / ((a + b + c + d)::DOUBLE * (a + b + c + d)
             |          ::DOUBLE * ((a + b + c + d)::DOUBLE - 1)), 12)
             |      ELSE 0 END)::DECIMAL(28,12)) AS v,
             |    sum(CASE WHEN a + b + c + d > 0 THEN
             |      round(a::DOUBLE * d::DOUBLE
             |        / (a + b + c + d)::DOUBLE, 12)::DECIMAL(28,12)
             |      END) AS ad,
             |    sum(CASE WHEN a + b + c + d > 0 THEN
             |      round(b::DOUBLE * c::DOUBLE
             |        / (a + b + c + d)::DOUBLE, 12)::DECIMAL(28,12)
             |      END) AS bc
             |  FROM cell)
             |SELECT n_strata, o_sum, round(e::DOUBLE, 6) AS e_sum_r,
             |  CASE WHEN bc > 0 THEN round(ad::DOUBLE / bc::DOUBLE, 6)
             |    END AS or_mh_r,
             |  CASE WHEN v > 0 THEN
             |    round((o_sum::DOUBLE - e::DOUBLE)
             |      * (o_sum::DOUBLE - e::DOUBLE) / v::DOUBLE, 6) END
             |    AS chi2_r
             |FROM agg""".stripMargin),
      (s, d) => Infer.mantelHaenszel(
        events(s, d)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(max(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("conv"))
          .select((dayofweek(col("day")) - 1).cast("long").as("dow"),
            (conv(substring(md5(col("user_id").cast("string")), 1, 8),
              16, 10).cast("long") % 100 >= 50).as("armb"),
            col("conv")),
        "dow", col("armb"), col("conv") === 1)),

    // Cochran–Armitage: does the share of large orders (≥ 5 line
    // items) trend monotonically across the 1..5 priority scores —
    // the dose-response test q298's omnibus χ² can't focus on.
    Q("q333_cochran_armitage",
      Some("""WITH cnt AS (
             |  SELECT l_orderkey, count(*)::BIGINT AS nl FROM lineitem
             |  GROUP BY 1),
             |u AS (
             |  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
             |      AS w,
             |    (cnt.nl >= 5) AS big
             |  FROM orders JOIN cnt ON o_orderkey = l_orderkey),
             |g AS (
             |  SELECT w, count(*)::BIGINT AS n,
             |    sum(CASE WHEN big THEN 1 ELSE 0 END)::BIGINT AS a
             |  FROM u GROUP BY 1),
             |agg AS (
             |  SELECT sum(n)::BIGINT AS n, sum(a)::BIGINT AS n_pos,
             |    sum(w * a)::BIGINT AS t_stat,
             |    sum(w * n)::BIGINT AS wn,
             |    sum(w * w * n)::BIGINT AS wwn
             |  FROM g)
             |SELECT n, n_pos, t_stat,
             |  CASE WHEN (n_pos::DOUBLE / n::DOUBLE)
             |      * (1 - n_pos::DOUBLE / n::DOUBLE)
             |      * (wwn::DOUBLE - wn::DOUBLE * wn::DOUBLE
             |        / n::DOUBLE) > 0 THEN
             |    round((t_stat::DOUBLE - (n_pos::DOUBLE / n::DOUBLE)
             |        * wn::DOUBLE)
             |      / sqrt((n_pos::DOUBLE / n::DOUBLE)
             |        * (1 - n_pos::DOUBLE / n::DOUBLE)
             |        * (wwn::DOUBLE - wn::DOUBLE * wn::DOUBLE
             |          / n::DOUBLE)), 6) END AS z_r
             |FROM agg""".stripMargin),
      (s, d) => {
        val cnt = lineitem(s, d).groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("nl"))
        val u = orders(s, d)
          .join(cnt, col("o_orderkey") === col("l_orderkey"))
          .select(expr("CAST(substring(o_orderpriority, 1, 1)" +
            " AS BIGINT)").as("w"), (col("nl") >= 5).as("big"))
        Infer.cochranArmitage(u, "w", col("big"))
      }))
}
