package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Behavior, Ranks}
import graft.util.Tables._

/** Experimentation & causal-inference surface: CUPED variance reduction,
  * multi-touch attribution, RFM segmentation, and
  * difference-in-differences — the readouts an experimentation platform
  * computes over the same event warehouse the rest of the engine serves.
  * Core ops live in [[graft.ops.Behavior]]; RFM composes
  * [[graft.ops.Ranks]] (banded exact ranks, no single-task windows).
  *
  * Every statistic here is assembled from exact integer sums (value
  * scaled to cents, timestamps to microseconds) with one shared
  * parenthesization between the Spark plan and the DuckDB oracle — the
  * float-determinism discipline the rest of the registry uses.
  */
object CausalQueries {

  /** Deterministic 50/50 arm split on the md5 of the unit key — the same
    * bucketing q198 uses, so experiment queries agree on assignment. */
  private val armSql =
    "('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 100 >= 50"

  /** Mid-window cutover for pre/post splits (events span 2024-01). */
  private val CutoverUs = 1705276800000000L // 2024-01-15T00:00:00Z

  val all: Seq[Q] = Seq(

    // CUPED: pre-period covariate = spend before the cutover, metric =
    // spend after; θ and the per-arm adjusted means from exact integer
    // moments. The variance-ratio column is the headline: how much CI
    // width the covariate buys.
    Q("q204_cuped",
      Some(s"""WITH u AS (
              |  SELECT user_id, $armSql AS armb,
              |    sum(CASE WHEN epoch_us(ts) < $CutoverUs
              |      THEN round(value * 100)::BIGINT ELSE 0 END) AS x,
              |    sum(CASE WHEN epoch_us(ts) >= $CutoverUs
              |      THEN round(value * 100)::BIGINT ELSE 0 END) AS y
              |  FROM events GROUP BY user_id),
              |g AS (
              |  SELECT count(*)::DOUBLE AS n,
              |    sum(x)::DOUBLE AS sx, sum(y)::DOUBLE AS sy,
              |    sum(x * y)::DOUBLE AS sxy, sum(x * x)::DOUBLE AS sxx,
              |    sum(y * y)::DOUBLE AS syy
              |  FROM u),
              |a AS (
              |  SELECT armb, count(*)::BIGINT AS n_units,
              |    sum(x)::DOUBLE AS ax, sum(y)::DOUBLE AS ay
              |  FROM u GROUP BY armb)
              |SELECT armb AS arm_b, n_units,
              |  round((ay / n_units) / 100.0, 6) AS mean_y_r,
              |  round((ay / n_units
              |    - (CASE WHEN n * sxx - sx * sx > 0
              |        THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
              |        ELSE 0.0 END)
              |      * (ax / n_units - sx / n)) / 100.0, 6) AS mean_yadj_r,
              |  round(CASE WHEN n * sxx - sx * sx > 0
              |    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
              |    ELSE 0.0 END, 6) AS theta_r,
              |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
              |    THEN round(1.0
              |      - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
              |        * ((n * sxy - sx * sy) / (n * syy - sy * sy)), 6)
              |    ELSE 1.0 END AS var_ratio_r
              |FROM a CROSS JOIN g ORDER BY arm_b""".stripMargin),
      (s, d) => {
        val units = events(s, d)
          .select(col("user_id"),
            (conv(substring(md5(col("user_id").cast("string")), 1, 8),
              16, 10).cast("long") % 100 >= 50).as("_arm"),
            unix_micros(col("ts")).as("_us"),
            round(col("value") * 100).cast("long").as("_cents"))
          .groupBy(col("user_id"), col("_arm"))
          .agg(sum(when(col("_us") < CutoverUs, col("_cents"))
            .otherwise(0L)).as("_x"),
            sum(when(col("_us") >= CutoverUs, col("_cents"))
              .otherwise(0L)).as("_y"))
        Behavior.cuped(units, col("_arm"), "_x", "_y").orderBy("arm_b")
      }),

    // Multi-touch attribution: credit per (model, channel) over touches
    // strictly before each user's first purchase.
    Q("q205_attribution",
      Some("""WITH e AS (
             |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us
             |  FROM events),
             |c AS (
             |  SELECT user_id,
             |    min(CASE WHEN event_type = 'purchase' THEN us END)
             |      AS conv_us
             |  FROM e GROUP BY user_id),
             |t AS (
             |  SELECT e.user_id, e.event_type AS channel, e.us, e.event_id
             |  FROM e JOIN c USING (user_id)
             |  WHERE c.conv_us IS NOT NULL AND e.us < c.conv_us
             |    AND e.event_type <> 'purchase'),
             |m AS (
             |  SELECT channel,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY us, event_id) AS rn,
             |    count(*) OVER (PARTITION BY user_id) AS nt
             |  FROM t),
             |ag AS (
             |  SELECT channel,
             |    sum(CASE WHEN rn = 1 THEN 1.0 ELSE 0.0 END) AS f,
             |    sum(CASE WHEN rn = nt THEN 1.0 ELSE 0.0 END) AS l,
             |    sum(round(1.0 / nt, 6)::DECIMAL(18,6))::DOUBLE AS li,
             |    count(*)::BIGINT AS n_touches
             |  FROM m GROUP BY channel),
             |x AS (
             |  SELECT channel, n_touches,
             |    unnest(['1_first', '2_last', '3_linear']) AS model,
             |    unnest([f, l, li]) AS credit
             |  FROM ag)
             |SELECT model, channel, round(credit, 6) AS credit_r,
             |  n_touches
             |FROM x ORDER BY model, channel""".stripMargin),
      (s, d) => Behavior.attribution(events(s, d), "user_id",
          "event_type", "ts", convType = "purchase")
        .orderBy("model", "channel")),

    // RFM segmentation: quintile scores for recency / frequency /
    // monetary over the customer base — banded exact ranks (ntile
    // semantics) instead of three global single-task windows.
    Q("q206_rfm",
      Some("""WITH m AS (
             |  SELECT o_custkey AS custkey,
             |    (SELECT max(o_orderdate::DATE) FROM orders)
             |      - max(o_orderdate::DATE) AS rec_days,
             |    count(*)::BIGINT AS freq,
             |    sum(o_totalprice::DECIMAL(18,2)) AS money
             |  FROM orders GROUP BY o_custkey),
             |sc AS (
             |  SELECT custkey, rec_days, freq, money,
             |    ntile(5) OVER (ORDER BY -rec_days, custkey) AS r_score,
             |    ntile(5) OVER (ORDER BY freq, custkey) AS f_score,
             |    ntile(5) OVER (ORDER BY money, custkey) AS m_score
             |  FROM m)
             |SELECT r_score::INT AS r_score, f_score::INT AS f_score,
             |  m_score::INT AS m_score, count(*)::BIGINT AS n_customers,
             |  sum(money)::DOUBLE AS monetary_total
             |FROM sc GROUP BY 1, 2, 3
             |ORDER BY r_score, f_score, m_score""".stripMargin),
      (s, d) => {
        val o = orders(s, d)
        val maxDate = o.agg(max(to_date(col("o_orderdate"))).as("_mx"))
        val m = o
          .groupBy(col("o_custkey").as("custkey"))
          .agg(max(to_date(col("o_orderdate"))).as("_last"),
            count(lit(1)).as("freq"),
            sum(col("o_totalprice").cast("decimal(18,2)")).as("money"))
          .crossJoin(broadcast(maxDate))
          .withColumn("rec_days",
            datediff(col("_mx"), col("_last")).cast("long"))
        // band widths sized to each metric's range so the rank never
        // degenerates to one whole-table band (= a single-task window)
        def score(df: org.apache.spark.sql.DataFrame, valueCol: String,
            out: String, bw: Double) = {
          val ranked = Ranks.bandedRank(
            df.withColumn("_g", lit(0))
              .withColumn("_v", col(valueCol).cast("double")),
            "_g", "_v", "custkey", bandWidth = bw)
          ranked
            .withColumn(out, Ranks.ntileFromRank(col("rnk"),
              col("grp_n"), 5))
            .drop("_g", "_v", "rnk", "grp_n")
        }
        val scored = score(score(score(
          m.withColumn("_negrec", -col("rec_days")),
          "_negrec", "r_score", bw = 100), "freq", "f_score", bw = 4),
          "money", "m_score", bw = 50000)
        scored
          .groupBy("r_score", "f_score", "m_score")
          .agg(count(lit(1)).as("n_customers"),
            sum(col("money")).cast("double").as("monetary_total"))
          .orderBy("r_score", "f_score", "m_score")
      }),

    // Difference-in-differences across the md5 arms and the mid-window
    // cutover: 4 activity-grain cell means + the DiD estimate.
    Q("q207_diff_in_diff",
      Some(s"""WITH up AS (
              |  SELECT user_id, $armSql AS armb,
              |    epoch_us(ts) >= $CutoverUs AS post,
              |    sum(round(value * 100)::BIGINT) AS uv
              |  FROM events GROUP BY 1, 2, 3),
              |c AS (
              |  SELECT armb, post, count(*)::BIGINT AS n,
              |    sum(uv)::BIGINT AS s
              |  FROM up GROUP BY 1, 2),
              |o AS (
              |  SELECT
              |    max(CASE WHEN NOT armb AND NOT post THEN n END)
              |      AS n_a_pre,
              |    max(CASE WHEN NOT armb AND post THEN n END) AS n_a_post,
              |    max(CASE WHEN armb AND NOT post THEN n END) AS n_b_pre,
              |    max(CASE WHEN armb AND post THEN n END) AS n_b_post,
              |    max(CASE WHEN NOT armb AND NOT post THEN s END)
              |      AS s_a_pre,
              |    max(CASE WHEN NOT armb AND post THEN s END) AS s_a_post,
              |    max(CASE WHEN armb AND NOT post THEN s END) AS s_b_pre,
              |    max(CASE WHEN armb AND post THEN s END) AS s_b_post
              |  FROM c)
              |SELECT n_a_pre, n_a_post, n_b_pre, n_b_post,
              |  round(s_a_pre / n_a_pre / 100.0, 6) AS mean_a_pre_r,
              |  round(s_a_post / n_a_post / 100.0, 6) AS mean_a_post_r,
              |  round(s_b_pre / n_b_pre / 100.0, 6) AS mean_b_pre_r,
              |  round(s_b_post / n_b_post / 100.0, 6) AS mean_b_post_r,
              |  round((s_b_post / n_b_post / 100.0
              |      - s_b_pre / n_b_pre / 100.0)
              |    - (s_a_post / n_a_post / 100.0
              |      - s_a_pre / n_a_pre / 100.0), 6) AS did_r
              |FROM o""".stripMargin),
      (s, d) => Behavior.diffInDiff(events(s, d), "user_id",
        conv(substring(md5(col("user_id").cast("string")), 1, 8),
          16, 10).cast("long") % 100 >= 50,
        "ts", round(col("value") * 100), CutoverUs)))
}
