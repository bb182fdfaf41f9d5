package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Ranks
import graft.util.Tables._

/** Leaderboard-drift batch: top-k overlap and rank-biased overlap
  * (Webber et al., TOIS'10) between the two halves of the order
  * history — "is the popularity ranking stable over time", the
  * monitoring readout behind cache warmers, buyers' guides and
  * trending lists. RBO weights p^{d−1} are Scala-computed literals in
  * a broadcast depth table (the q268 no-engine-transcendentals
  * discipline).
  */
object DriftQueries {

  private val TopK = 20
  private val RboP = 0.9

  /** (depth, (1−p)·p^{d−1}/d) literal rows shared with the oracle. */
  private val rboWeights = (1 to TopK).map { d =>
    d -> (1 - RboP) * math.pow(RboP, d - 1) / d
  }
  private val rboWeightValues = rboWeights
    .map { case (d, w) => s"($d, ${w}::DOUBLE)" }.mkString(",\n    ")

  val all: Seq[Q] = Seq(

    Q("q276_topk_drift",
      Some(s"""WITH halves AS (
              |  SELECT l_partkey,
              |    CASE WHEN epoch_us(o_orderdate) < (
              |      SELECT min(epoch_us(o_orderdate))
              |        + (max(epoch_us(o_orderdate))
              |          - min(epoch_us(o_orderdate))) // 2
              |      FROM orders) THEN 0 ELSE 1 END AS half
              |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
              |cnt AS (
              |  SELECT half, l_partkey, count(*)::BIGINT AS n
              |  FROM halves GROUP BY 1, 2),
              |rk AS (
              |  SELECT half, l_partkey,
              |    row_number() OVER (PARTITION BY half
              |      ORDER BY n DESC, l_partkey) AS r
              |  FROM cnt),
              |tops AS (SELECT * FROM rk WHERE r <= $TopK),
              |pairs AS (
              |  SELECT a.l_partkey, a.r AS ra, b.r AS rb
              |  FROM tops a JOIN tops b
              |    ON a.l_partkey = b.l_partkey
              |   AND a.half = 0 AND b.half = 1),
              |wt(d, w) AS (VALUES
              |    $rboWeightValues),
              |rbo AS (
              |  SELECT sum(CAST(round(t.c * wt.w * 1000000000000.0)
              |    AS BIGINT))::DOUBLE / 1000000000000.0 AS rbo
              |  FROM wt LEFT JOIN (
              |    SELECT d2.d, count(p.l_partkey)::BIGINT AS c
              |    FROM wt d2 LEFT JOIN pairs p
              |      ON p.ra <= d2.d AND p.rb <= d2.d
              |    GROUP BY 1) t ON t.d = wt.d)
              |SELECT $TopK::BIGINT AS k,
              |  (SELECT count(*) FROM pairs)::BIGINT AS overlap_k,
              |  round((SELECT count(*) FROM pairs)::DOUBLE
              |    / (2 * $TopK - (SELECT count(*) FROM pairs)), 6)
              |    AS jaccard_r,
              |  round((SELECT rbo FROM rbo), 6) AS rbo_r""".stripMargin),
      (s, d) => {
        val sess = s
        import sess.implicits._
        val li = lineitem(s, d).select(col("l_orderkey"),
          col("l_partkey"))
        // o_orderdate arrives TIMESTAMP_NTZ; cast interprets it in the
        // pinned-UTC session — the same instants DuckDB's naive read
        // yields (the Tables.events convention)
        val ord = orders(s, d).select(col("o_orderkey"),
          col("o_orderdate").cast("timestamp").as("o_orderdate"))
        val mid = ord.agg((min(unix_micros(col("o_orderdate")))
          + expr("(max(unix_micros(o_orderdate))" +
            " - min(unix_micros(o_orderdate))) div 2")).as("_mid"))
        val halves = li.join(ord,
            col("l_orderkey") === col("o_orderkey"))
          .crossJoin(broadcast(mid))
          .select(col("l_partkey"),
            when(unix_micros(col("o_orderdate")) < col("_mid"), 0)
              .otherwise(1).as("half"))
        val cnt = halves.groupBy(col("half"), col("l_partkey"))
          .agg(count(lit(1)).as("n"))
          .withColumn("_neg", -col("n"))
        val rk = Ranks.bandedRank(cnt, "half", "_neg", "l_partkey",
          bandWidth = 64.0)
        val tops = rk.where(col("rnk") < TopK)
          .select(col("half"), col("l_partkey"),
            (col("rnk") + 1).as("r"))
        val pairs = tops.where(col("half") === 0)
          .select(col("l_partkey"), col("r").as("ra"))
          .join(tops.where(col("half") === 1)
            .select(col("l_partkey"), col("r").as("rb")), "l_partkey")
          .cache()
        val wt = rboWeights.toDF("d", "w")
        val perDepth = wt.join(
          wt.select(col("d")).crossJoin(pairs)
            .where(col("ra") <= col("d") && col("rb") <= col("d"))
            .groupBy(col("d")).agg(count(lit(1)).as("c")),
          Seq("d"), "left")
        // scaled-int term sum (single-rounded conversions; order-free)
        val rbo = perDepth
          .agg((sum(round(coalesce(col("c"), lit(0L)) * col("w")
            * lit(1.0e12)).cast("long")).cast("double")
            / lit(1.0e12)).as("rbo"))
        val ov = pairs.agg(count(lit(1)).as("overlap_k"))
        ov.crossJoin(broadcast(rbo))
          .select(lit(TopK.toLong).as("k"), col("overlap_k"),
            round(col("overlap_k").cast("double")
              / (lit(2 * TopK) - col("overlap_k")), 6).as("jaccard_r"),
            round(col("rbo"), 6).as("rbo_r"))
      }))
}
