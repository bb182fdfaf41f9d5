package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Influence
import graft.util.Tables._

/** Round-12 regression-influence batch: OLS case diagnostics (Cook's
  * distance, PRESS/LOOCV, externally studentized residuals) on the
  * daily-revenue trend, and design-side collinearity readouts (VIF,
  * ridge coefficient path) on the per-order regressor frame. Every op
  * is one exact-moment pass + closed forms, mirrored expression for
  * expression in the DuckDB twins.
  */
object InfluenceQueries {

  private val CooksK = 5
  private val StudentK = 3
  private val PressScale = 1e8
  private val RidgeLambdas = Seq(0.0, 0.1, 0.5, 1.0, 5.0)

  /** Daily revenue cents on the day-index x — the shared OLS grain. */
  private val gSql =
    """WITH daily AS MATERIALIZED (
      |  SELECT o_orderdate AS day,
      |    sum(round(o_totalprice * 100))::BIGINT AS y
      |  FROM orders GROUP BY 1),
      |mn AS (SELECT min(day) AS d0 FROM daily),
      |g AS MATERIALIZED (
      |  SELECT day, datediff('day', d0, day)::BIGINT AS x, y
      |  FROM daily, mn)""".stripMargin

  /** Exact moments + the OLS closed forms (b, a, s2, centered sums)
    * with the op's parenthesization, then the per-row diagnostics
    * frame d(day, x, y, h, e, + stats). */
  private val diagSql =
    """m AS (SELECT count(*)::DOUBLE AS n,
      |  sum(x::HUGEINT)::DOUBLE AS sx, sum(y::HUGEINT)::DOUBLE AS sy,
      |  sum(x::HUGEINT * x)::DOUBLE AS sxx,
      |  sum(x::HUGEINT * y)::DOUBLE AS sxy,
      |  sum(y::HUGEINT * y)::DOUBLE AS syy
      |  FROM g),
      |c AS (SELECT *, sxx - sx * sx / n AS sxxc,
      |  sxy - sx * sy / n AS sxyc, syy - sy * sy / n AS syyc FROM m),
      |f AS (SELECT *, sxyc / nullif(sxxc, 0.0) AS b FROM c),
      |f2 AS (SELECT *, (sy - b * sx) / n AS a,
      |  (syyc - b * sxyc) / nullif(n - 2.0, 0.0) AS s2 FROM f),
      |d AS (SELECT day, x, y, n, a, b, s2, sxxc, sx, syyc,
      |  1.0 / n + (x::DOUBLE - sx / n) * (x::DOUBLE - sx / n)
      |    / nullif(sxxc, 0.0) AS h,
      |  y::DOUBLE - a - b * x::DOUBLE AS e
      |  FROM g, f2)""".stripMargin

  /** The per-order regressor frame for the collinearity ops. */
  private val ogSql =
    """WITH og AS MATERIALIZED (
      |  SELECT l_orderkey, count(*)::BIGINT AS nitems,
      |    sum(l_quantity)::BIGINT AS qty,
      |    sum(round(l_discount * 100))::BIGINT AS discbp,
      |    sum(round(l_extendedprice * 100))::BIGINT AS revcents
      |  FROM lineitem GROUP BY 1)""".stripMargin

  /** Pairwise correlation from HUGEINT-exact sums (the op's corr). */
  private def corrSql(sab: String, sa: String, sb: String, saa: String,
      sbb: String): String =
    s"(n * $sab - $sa * $sb) / nullif(sqrt((n * $saa - $sa * $sa)" +
      s" * (n * $sbb - $sb * $sb)), 0.0)"

  private def dailyGrain(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val daily = orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
    val d0 = daily.agg(min(col("day")).as("_d0"))
    daily.crossJoin(broadcast(d0))
      .select(col("day"), datediff(col("day"), col("_d0")).cast("long")
        .as("x"), col("y"))
  }

  private def orderGrain(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    lineitem(s, dir).groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("nitems"),
        sum(col("l_quantity")).cast("long").as("qty"),
        sum(round(col("l_discount") * 100)).cast("long").as("discbp"),
        sum(round(col("l_extendedprice") * 100)).cast("long")
          .as("revcents"))

  val all: Seq[Q] = Seq(

    // Cook's distance top-5 on the daily revenue trend: which days
    // single-handedly bend the fitted line (high leverage × large
    // residual) — the case-influence readout next to q414's Huber fit.
    Q("q438_cooks_distance",
      Some(s"""$gSql,
              |$diagSql
              |SELECT * FROM (
              |  SELECT day, y, round(h, 6) AS leverage_r,
              |    round(e, 6) AS resid_r,
              |    round(e * e / (2.0 * nullif(s2, 0.0)) * h
              |      / nullif((1.0 - h) * (1.0 - h), 0.0), 6) AS cooks_r
              |  FROM d
              |  ORDER BY e * e / (2.0 * nullif(s2, 0.0)) * h
              |    / nullif((1.0 - h) * (1.0 - h), 0.0) DESC, day
              |  LIMIT $CooksK) t
              |ORDER BY cooks_r DESC, day""".stripMargin),
      (s, d) => Influence.cooksTopK(dailyGrain(s, d), "day", "x", "y",
          CooksK)
        .orderBy(col("cooks_r").desc, col("day"))),

    // Variance-inflation factors of the per-order design (item count,
    // total quantity, discount basis points): how collinear the
    // regressors a spend model would use actually are.
    Q("q439_vif_order_design",
      Some(s"""$ogSql,
              |m AS (SELECT count(*)::DOUBLE AS n,
              |  sum(nitems::HUGEINT)::DOUBLE AS s1,
              |  sum(qty::HUGEINT)::DOUBLE AS s2,
              |  sum(discbp::HUGEINT)::DOUBLE AS s3,
              |  sum(nitems::HUGEINT * nitems)::DOUBLE AS s11,
              |  sum(qty::HUGEINT * qty)::DOUBLE AS s22,
              |  sum(discbp::HUGEINT * discbp)::DOUBLE AS s33,
              |  sum(nitems::HUGEINT * qty)::DOUBLE AS s12,
              |  sum(nitems::HUGEINT * discbp)::DOUBLE AS s13,
              |  sum(qty::HUGEINT * discbp)::DOUBLE AS s23
              |  FROM og),
              |r AS (SELECT n,
              |  ${corrSql("s12", "s1", "s2", "s11", "s22")} AS r12,
              |  ${corrSql("s13", "s1", "s3", "s11", "s33")} AS r13,
              |  ${corrSql("s23", "s2", "s3", "s22", "s33")} AS r23
              |  FROM m)
              |SELECT n::BIGINT AS n,
              |  round(r12, 6) AS r12_r, round(r13, 6) AS r13_r,
              |  round(r23, 6) AS r23_r,
              |  round(1.0 / nullif(1.0 - (r12 * r12 + r13 * r13
              |    - 2.0 * r12 * r13 * r23)
              |    / nullif(1.0 - r23 * r23, 0.0), 0.0), 6) AS vif1_r,
              |  round(1.0 / nullif(1.0 - (r12 * r12 + r23 * r23
              |    - 2.0 * r12 * r23 * r13)
              |    / nullif(1.0 - r13 * r13, 0.0), 0.0), 6) AS vif2_r,
              |  round(1.0 / nullif(1.0 - (r13 * r13 + r23 * r23
              |    - 2.0 * r13 * r23 * r12)
              |    / nullif(1.0 - r12 * r12, 0.0), 0.0), 6) AS vif3_r
              |FROM r""".stripMargin),
      (s, d) => Influence.vif3(orderGrain(s, d), "nitems", "qty",
        "discbp")),

    // Ridge coefficient path (standardized 2-regressor closed form)
    // of order revenue on quantity + discount: how the coefficients
    // shrink as lambda grows — the collinearity-damping readout.
    Q("q440_ridge_path",
      Some(s"""$ogSql,
              |m AS (SELECT count(*)::DOUBLE AS n,
              |  sum(qty::HUGEINT)::DOUBLE AS s1,
              |  sum(discbp::HUGEINT)::DOUBLE AS s2,
              |  sum(revcents::HUGEINT)::DOUBLE AS sy,
              |  sum(qty::HUGEINT * qty)::DOUBLE AS s11,
              |  sum(discbp::HUGEINT * discbp)::DOUBLE AS s22,
              |  sum(qty::HUGEINT * discbp)::DOUBLE AS s12,
              |  sum(qty::HUGEINT * revcents)::DOUBLE AS s1y,
              |  sum(discbp::HUGEINT * revcents)::DOUBLE AS s2y,
              |  sum(revcents::HUGEINT * revcents)::DOUBLE AS syy
              |  FROM og),
              |r AS (SELECT
              |  ${corrSql("s12", "s1", "s2", "s11", "s22")} AS r12,
              |  ${corrSql("s1y", "s1", "sy", "s11", "syy")} AS r1y,
              |  ${corrSql("s2y", "s2", "sy", "s22", "syy")} AS r2y
              |  FROM m),
              |l(lambda) AS (VALUES ${RidgeLambdas
                .map(l => s"(${l}::DOUBLE)").mkString(", ")})
              |SELECT lambda,
              |  round((r1y * (1.0 + lambda) - r12 * r2y)
              |    / nullif((1.0 + lambda) * (1.0 + lambda)
              |      - r12 * r12, 0.0), 6) AS b1_r,
              |  round((r2y * (1.0 + lambda) - r12 * r1y)
              |    / nullif((1.0 + lambda) * (1.0 + lambda)
              |      - r12 * r12, 0.0), 6) AS b2_r,
              |  round(sqrt(
              |    (r1y * (1.0 + lambda) - r12 * r2y)
              |      / nullif((1.0 + lambda) * (1.0 + lambda)
              |        - r12 * r12, 0.0)
              |    * ((r1y * (1.0 + lambda) - r12 * r2y)
              |      / nullif((1.0 + lambda) * (1.0 + lambda)
              |        - r12 * r12, 0.0))
              |    + (r2y * (1.0 + lambda) - r12 * r1y)
              |      / nullif((1.0 + lambda) * (1.0 + lambda)
              |        - r12 * r12, 0.0)
              |    * ((r2y * (1.0 + lambda) - r12 * r1y)
              |      / nullif((1.0 + lambda) * (1.0 + lambda)
              |        - r12 * r12, 0.0))), 6) AS l2_r
              |FROM l, r
              |ORDER BY lambda""".stripMargin),
      (s, d) => Influence.ridgePath2(orderGrain(s, d), "qty", "discbp",
        "revcents", RidgeLambdas)),

    // PRESS / leave-one-out CV of the daily trend: the honest
    // out-of-sample error next to the in-sample R² (PRESS terms on
    // the 12-dp grid in 1e8-cent units).
    Q("q441_press_loocv",
      Some(s"""$gSql,
              |$diagSql,
              |p AS (SELECT count(*)::DOUBLE AS nn,
              |  sum(round((e / $PressScale) / nullif(1.0 - h, 0.0)
              |    * (e / $PressScale) / nullif(1.0 - h, 0.0), 12)
              |    ::DECIMAL(28,12))::DOUBLE AS press,
              |  first(s2) AS s2f, first(n) AS nf, first(syyc) AS sst
              |  FROM d)
              |SELECT nf::BIGINT AS n,
              |  round(1.0 - s2f * (nf - 2.0) / nullif(sst, 0.0), 6)
              |    AS r2_r,
              |  round(press, 6) AS press_r,
              |  round(1.0 - press / nullif(sst
              |    / ($PressScale * $PressScale), 0.0), 6) AS r2_pred_r,
              |  round(sqrt(press / nn), 6) AS loocv_rmse_r
              |FROM p""".stripMargin),
      (s, d) => Influence.pressLoocv(dailyGrain(s, d), "day", "x", "y",
        PressScale)),

    // Externally studentized residuals top-3: the deleted-variance
    // outlier test — the suspect day cannot inflate its own
    // denominator (unlike the raw z-score q413 peels on).
    Q("q442_studentized_outliers",
      Some(s"""$gSql,
              |$diagSql,
              |t AS (SELECT day, y, e,
              |  e / nullif(sqrt(
              |    greatest(((n - 2.0) * s2 - e * e
              |        / nullif(1.0 - h, 0.0))
              |      / nullif(n - 3.0, 0.0), 0.0)
              |    * (1.0 - h)), 0.0) AS t
              |  FROM d)
              |SELECT * FROM (
              |  SELECT day, y, round(e, 6) AS resid_r,
              |    round(t, 6) AS t_ext_r
              |  FROM t
              |  ORDER BY abs(t) DESC, day
              |  LIMIT $StudentK) tt
              |ORDER BY abs(t_ext_r) DESC, day""".stripMargin),
      (s, d) => Influence.studentizedTopK(dailyGrain(s, d), "day", "x",
          "y", StudentK)
        .orderBy(abs(col("t_ext_r")).desc, col("day"))))
}
