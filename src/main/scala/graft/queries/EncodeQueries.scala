package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Fit, Profile}
import graft.util.Tables._

/** Encoding & association batch: hashing-trick features, contingency
  * Pearson residuals, and the trimmed mean ([[graft.ops.Fit.featureHash]],
  * [[graft.ops.Profile.chi2Residuals]],
  * [[graft.ops.Profile.trimmedMean]]).
  */
object EncodeQueries {

  private val HashDim = 8

  val all: Seq[Q] = Seq(

    // Hashing-trick user vectors over (event type, hour-of-day)
    // tokens: md5 buckets + independent sign bit, signed integer sums,
    // long (id, dim, v) output.
    Q("q249_feature_hash",
      Some(s"""WITH tok AS (
              |  SELECT user_id, event_type AS t FROM events
              |  UNION ALL
              |  SELECT user_id, 'h:' || hour(ts)::VARCHAR FROM events),
              |h AS (
              |  SELECT user_id,
              |    ${TextQueries.hash60Sql("t")} AS h
              |  FROM tok)
              |SELECT user_id, (h % $HashDim)::INT AS dim,
              |  sum(CASE WHEN (h // $HashDim) % 2 = 0 THEN 1 ELSE -1 END)
              |    ::BIGINT AS v
              |FROM h GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, d) => Fit.featureHash(events(s, d), "user_id",
          array(col("event_type"),
            concat(lit("h:"), hour(col("ts")).cast("string"))),
          HashDim)
        .orderBy("user_id", "dim")),

    // Pearson residuals of the event-type × 6-hour-bucket contingency
    // table (zero cells included) + the global χ² as an
    // order-independent DECIMAL sum.
    Q("q250_chi2_residuals",
      Some("""WITH g AS (
             |  SELECT event_type, (hour(ts) // 6)::INT AS hour_bucket,
             |    count(*)::BIGINT AS o
             |  FROM events GROUP BY 1, 2),
             |xs AS (SELECT event_type, sum(o)::BIGINT AS rt
             |       FROM g GROUP BY 1),
             |ys AS (SELECT hour_bucket, sum(o)::BIGINT AS ct
             |       FROM g GROUP BY 1),
             |n AS (SELECT sum(o)::BIGINT AS n FROM g),
             |cells AS (
             |  SELECT x.event_type, y.hour_bucket,
             |    coalesce(g.o, 0)::BIGINT AS o, x.rt, y.ct, n.n
             |  FROM xs x CROSS JOIN ys y CROSS JOIN n
             |  LEFT JOIN g USING (event_type, hour_bucket)),
             |r AS (
             |  SELECT event_type, hour_bucket, o,
             |    rt::DOUBLE * ct / n AS e,
             |    (o - rt::DOUBLE * ct / n)
             |      / sqrt(rt::DOUBLE * ct / n) AS resid
             |  FROM cells)
             |SELECT event_type, hour_bucket, o, round(e, 6) AS e_r,
             |  round(resid, 6) AS resid_r,
             |  round(sum(round(resid * resid, 9)::DECIMAL(28,9))
             |    OVER ()::DOUBLE, 6) AS chi2_r
             |FROM r ORDER BY 1, 2""".stripMargin),
      (s, d) => Profile.chi2Residuals(
          events(s, d).select(col("event_type"),
            expr("hour(ts) div 6").cast("int").as("hour_bucket")),
          "event_type", "hour_bucket")
        .orderBy("event_type", "hour_bucket")),

    // IQR trimmed mean of l_quantity per return flag — winsorize's
    // sibling (q95): outliers dropped, not clamped; quartiles bit-exact
    // on the integer-valued column.
    Q("q251_trimmed_mean",
      Some("""WITH b AS (
             |  SELECT l_returnflag,
             |    quantile_cont(l_quantity, 0.25) AS lo,
             |    quantile_cont(l_quantity, 0.75) AS hi
             |  FROM lineitem GROUP BY 1)
             |SELECT l.l_returnflag, min(b.lo) AS lo, min(b.hi) AS hi,
             |  count(*)::BIGINT AS n_total,
             |  sum(CASE WHEN l_quantity >= lo AND l_quantity <= hi
             |      THEN 1 ELSE 0 END)::BIGINT AS n_kept,
             |  (count(*) - sum(CASE WHEN l_quantity >= lo
             |      AND l_quantity <= hi THEN 1 ELSE 0 END))::BIGINT
             |    AS n_dropped,
             |  round(sum(CASE WHEN l_quantity >= lo AND l_quantity <= hi
             |      THEN l_quantity END)
             |    / sum(CASE WHEN l_quantity >= lo AND l_quantity <= hi
             |        THEN 1 ELSE 0 END), 6) AS trimmed_mean_r
             |FROM lineitem l JOIN b USING (l_returnflag)
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => Profile.trimmedMean(lineitem(s, d), "l_returnflag",
          "l_quantity", 0.25, 0.75)
        .orderBy("l_returnflag")))
}
