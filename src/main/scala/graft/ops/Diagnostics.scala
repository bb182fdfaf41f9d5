package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Regression-diagnostic tests over a bounded (t, value) grain — the
  * residual-analysis siblings of [[Nonparam.durbinWatson]], sharing its
  * cross-engine conventions exactly: sufficient statistics as exact
  * DECIMAL/BIGINT sums from one hash-agg, coefficients in ONE shared
  * double parenthesization (so both engines materialize bit-identical
  * residuals), residual products rounded to the 6-dp grid and
  * DECIMAL-summed (order-independent reductions), one final rounding
  * above the float noise.
  *
  * Scale shape: everything after the upstream corpus aggregation lives
  * on the |days|-grain table — the calendar-bounded posture; no corpus
  * row is touched twice, no unpartitioned window runs on data-shaped
  * frames (the lag/window sites order the bounded day grain only).
  */
object Diagnostics {

  /** OLS moments → (a, b) in the q304 shared parenthesization. */
  private def fitAb(daily: DataFrame, tCol: String, yCol: String) = {
    val sums = daily.agg(count(lit(1)).as("n"),
      sum(col(tCol)).as("_st"),
      sum(col(tCol).cast("decimal(38,0)") * col(tCol)).as("_stt"),
      sum(col(yCol).cast("decimal(38,0)")).as("_sy"),
      sum(col(tCol).cast("decimal(38,0)") * col(yCol)).as("_sty"))
    val nD = col("n").cast("double")
    val stD = col("_st").cast("double")
    val sttD = col("_stt").cast("double")
    val syD = col("_sy").cast("double")
    val styD = col("_sty").cast("double")
    val b = (nD * styD - stD * syD) / (nD * sttD - stD * stD)
    val a = (syD - b * stD) / nD
    sums.select(b.as("_b"), a.as("_a"), col("n"), col("_st"),
      col("_stt"))
  }

  /** Breusch–Pagan / Koenker heteroscedasticity test of y (exact
    * cents) on the day index t: fit y ~ t, then regress the squared
    * DOLLAR residuals g = (e/100)² on t; LM = n·R²_aux (χ²₁ under
    * homoscedasticity — big LM means the variance itself trends).
    * Residuals are identical doubles cross-engine (exact moments, one
    * parenthesization); g and its products are 6-dp-rounded DECIMAL
    * term sums. Dollar scaling keeps g ≲ 1e12 so every term stays
    * inside DECIMAL(38,6) with e⁴ ~ 1e24 in (38,0).
    * Returns one row: n_days, slope_r, bp_lm_r, r2_aux_r. */
  def breuschPagan(daily: DataFrame, tCol: String,
      yCentsCol: String): DataFrame = {
    val t = col(tCol).cast("double")
    val y = col(yCentsCol).cast("double")
    val fit = daily.crossJoin(broadcast(fitAb(daily, tCol, yCentsCol)))
    val e = (y - col("_a") - col("_b") * t) / lit(100.0)
    val g = e * e
    val terms = fit.select(col("n"), col("_b"), col("_st"), col("_stt"),
      round(g, 6).cast("decimal(38,6)").as("_g"),
      round(t * g, 6).cast("decimal(38,6)").as("_tg"),
      round(g * g, 0).cast("decimal(38,0)").as("_gg"))
    val agg = terms
      .groupBy(col("n"), col("_b"), col("_st"), col("_stt"))
      .agg(sum(col("_g")).as("_sg"), sum(col("_tg")).as("_stg"),
        sum(col("_gg")).as("_sgg"))
    val nD = col("n").cast("double")
    val stD = col("_st").cast("double")
    val sttD = col("_stt").cast("double")
    val sgD = col("_sg").cast("double")
    val stgD = col("_stg").cast("double")
    val sggD = col("_sgg").cast("double")
    val num = nD * stgD - stD * sgD
    val denT = nD * sttD - stD * stD
    val denG = nD * sggD - sgD * sgD
    val r2 = num * num / nullif(denT * denG, lit(0.0))
    agg.select(col("n").as("n_days"),
      round(col("_b"), 6).as("slope_r"),
      round(when(denG > 0, nD * r2), 6).as("bp_lm_r"),
      round(when(denG > 0, r2), 6).as("r2_aux_r"))
  }

  /** Chow structural-break F-test at the split day `breakT`: pooled
    * OLS of y ~ t vs separate fits on t < breakT and t ≥ breakT;
    * F = ((SSRp − SSR₁ − SSR₂)/2) / ((SSR₁+SSR₂)/(n−4)). Each
    * segment's (a, b) comes from exact per-segment moments (one
    * grouped hash-agg), residual squares are 6-dp DECIMAL sums, and
    * the three SSRs meet in one final double expression. Emits one
    * row: n1, n2, b1_r, b2_r, f_r — a large F with opposite-sign
    * segment slopes is the regime change the pooled slope hides. */
  def chowTest(daily: DataFrame, tCol: String, yCentsCol: String,
      breakT: Long): DataFrame = {
    val seg = (col(tCol) >= breakT).cast("int").as("_seg")
    val d = daily.select(col(tCol), col(yCentsCol), seg)
    // per-segment and pooled moments from ONE grouped agg + a rollup
    val m = d.groupBy(col("_seg")).agg(count(lit(1)).as("n"),
      sum(col(tCol)).as("_st"),
      sum(col(tCol).cast("decimal(38,0)") * col(tCol)).as("_stt"),
      sum(col(yCentsCol).cast("decimal(38,0)")).as("_sy"),
      sum(col(tCol).cast("decimal(38,0)") * col(yCentsCol)).as("_sty"))
      .localCheckpoint() // two consumers: per-seg fits + pooled rollup
    def ab(nc: org.apache.spark.sql.Column,
        st: org.apache.spark.sql.Column, stt: org.apache.spark.sql.Column,
        sy: org.apache.spark.sql.Column, sty: org.apache.spark.sql.Column) = {
      val b = (nc * sty - st * sy) / nullif(nc * stt - st * st, lit(0.0))
      (b, (sy - b * st) / nc)
    }
    def dd(c: String) = col(c).cast("double")
    val (bS, aS) = ab(dd("n"), dd("_st"), dd("_stt"), dd("_sy"),
      dd("_sty"))
    val segFits = m.select(col("_seg"), col("n"), bS.as("_b"),
      aS.as("_a"))
    val pooled = m.agg(sum(col("n")).as("n"), sum(col("_st")).as("_st"),
      sum(col("_stt")).as("_stt"), sum(col("_sy")).as("_sy"),
      sum(col("_sty")).as("_sty"))
    val (bP, aP) = ab(dd("n"), dd("_st"), dd("_stt"), dd("_sy"),
      dd("_sty"))
    val pooledFit = pooled.select(bP.as("_bp"), aP.as("_ap"))
    val t = col(tCol).cast("double")
    val y = col(yCentsCol).cast("double")
    val eS = (y - col("_a") - col("_b") * t) / lit(100.0)
    val eP = (y - col("_ap") - col("_bp") * t) / lit(100.0)
    val terms = d.join(broadcast(segFits), Seq("_seg"))
      .crossJoin(broadcast(pooledFit))
      .select(col("_seg"),
        round(eS * eS, 6).cast("decimal(38,6)").as("_s2"),
        round(eP * eP, 6).cast("decimal(38,6)").as("_p2"))
    val bySeg = terms.groupBy(col("_seg"))
      .agg(count(lit(1)).as("_n"), sum(col("_s2")).as("_ssr"),
        sum(col("_p2")).as("_ssrp"))
    val roll = bySeg.agg(sum(col("_ssr")).as("_ssr12"),
      sum(col("_ssrp")).as("_ssrp"), sum(col("_n")).as("_n"),
      sum(when(col("_seg") === 0, col("_n")).otherwise(0L)).as("n1"),
      sum(when(col("_seg") === 1, col("_n")).otherwise(0L)).as("n2"))
    // conditional max over segFits (the armBalanceAudit pivot shape),
    // NOT filter + crossJoin: an empty segment (breakT outside the
    // observed t range) must yield NULL slopes on the surviving roll
    // row — a filtered-empty frame would eliminate the row entirely,
    // diverging from the oracle's scalar subqueries
    val slopes = segFits.agg(
      max(when(col("_seg") === 0, round(col("_b"), 6))).as("b1_r"),
      max(when(col("_seg") === 1, round(col("_b"), 6))).as("b2_r"))
    val ssr12 = col("_ssr12").cast("double")
    val ssrp = col("_ssrp").cast("double")
    val nD = col("_n").cast("double")
    val f = ((ssrp - ssr12) / 2.0) / nullif(ssr12 / (nD - 4), lit(0.0))
    roll.crossJoin(broadcast(slopes))
      .select(col("n1"), col("n2"), col("b1_r"), col("b2_r"),
        round(when(col("n1") > 2 && col("n2") > 2 && ssr12 > 0, f), 6)
          .as("f_r"))
  }

  /** Granger 1-lag causality of x on y over the day grain: restricted
    * y_t ~ y_{t−1} vs unrestricted y_t ~ y_{t−1} + x_{t−1};
    * F = (SSR_r − SSR_u) / (SSR_u/(n−3)). The unrestricted fit is the
    * [[Fit.ols2]] 3×3 Cramer on exact integer moments; both residual
    * sums are 6-dp DECIMAL in dollars. Lags come from ONE window over
    * the bounded day grain (gaps in the calendar break the pair — only
    * consecutive days regress, documented). Returns one row: n_pairs,
    * b_ylag_r, b_xlag_r, f_r — significant F says yesterday's x helps
    * predict today's y beyond y's own history. */
  def granger(daily: DataFrame, tCol: String, yCentsCol: String,
      xCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(tCol)
    val lagged = daily.select(col(tCol),
        col(yCentsCol).as("_y"), col(xCol).as("_x"))
      .withColumn("_ylag", lag(col("_y"), 1).over(w))
      .withColumn("_xlag", lag(col("_x"), 1).over(w))
      .withColumn("_tlag", lag(col(tCol), 1).over(w))
      .where(col("_ylag").isNotNull &&
        col(tCol) === col("_tlag") + 1)
      .localCheckpoint() // consumed by both model fits + residual pass
    def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val m = lagged.agg(count(lit(1)).as("n"),
      sum(d(col("_ylag"))).as("_s1"), sum(d(col("_xlag"))).as("_s2"),
      sum(d(col("_y"))).as("_sy"),
      sum(d(col("_ylag")) * col("_ylag")).as("_s11"),
      sum(d(col("_xlag")) * col("_xlag")).as("_s22"),
      sum(d(col("_ylag")) * col("_xlag")).as("_s12"),
      sum(d(col("_ylag")) * col("_y")).as("_s1y"),
      sum(d(col("_xlag")) * col("_y")).as("_s2y"))
    def dd(c: String) = col(c).cast("double")
    val n = dd("n")
    val (s1, s2, sy) = (dd("_s1"), dd("_s2"), dd("_sy"))
    val (s11, s22, s12) = (dd("_s11"), dd("_s22"), dd("_s12"))
    val (s1y, s2y) = (dd("_s1y"), dd("_s2y"))
    // restricted: y ~ ylag (simple OLS)
    val bR = (n * s1y - s1 * sy) / nullif(n * s11 - s1 * s1, lit(0.0))
    val aR = (sy - bR * s1) / n
    // unrestricted: y ~ ylag + xlag (3×3 Cramer, the ols2 form)
    val det0 = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val det = nullif(det0, lit(0.0))
    val b0 = (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
      + s2 * (s1y * s12 - s11 * s2y)) / det
    val b1 = (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)) / det
    val b2 = (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)) / det
    val coefs = m.select(col("n"), bR.as("_ar_b"), aR.as("_ar_a"),
      b0.as("_u0"), b1.as("_u1"), b2.as("_u2"))
    val y = col("_y").cast("double")
    val eR = (y - col("_ar_a") - col("_ar_b") * col("_ylag")) / 100.0
    val eU = (y - col("_u0") - col("_u1") * col("_ylag")
      - col("_u2") * col("_xlag")) / 100.0
    val terms = lagged.crossJoin(broadcast(coefs))
      .select(col("n"), col("_u1"), col("_u2"),
        round(eR * eR, 6).cast("decimal(38,6)").as("_r2t"),
        round(eU * eU, 6).cast("decimal(38,6)").as("_u2t"))
    val agg = terms.groupBy(col("n"), col("_u1"), col("_u2"))
      .agg(sum(col("_r2t")).as("_ssrr"), sum(col("_u2t")).as("_ssru"))
    val ssrr = col("_ssrr").cast("double")
    val ssru = col("_ssru").cast("double")
    val nD = col("n").cast("double")
    val f = (ssrr - ssru) / nullif(ssru / (nD - 3), lit(0.0))
    agg.select(col("n").as("n_pairs"),
      round(col("_u1"), 6).as("b_ylag_r"),
      round(col("_u2"), 6).as("b_xlag_r"),
      round(when(ssru > 0 && col("n") > 3, f), 6).as("f_r"))
  }

  /** ARCH-LM volatility-clustering test (Engle 1982, 1 lag): residuals
    * e_t of the daily trend fit y ~ t, then the auxiliary regression
    * e_t² ~ e_{t−1}²; LM = n·R² is asymptotically χ²(1) under the
    * homoscedastic null. Large LM says big errors FOLLOW big errors —
    * the conditional-heteroscedasticity read that [[breuschPagan]]'s
    * t-driven form can't see (BP asks "does variance grow with t",
    * this asks "does variance remember itself").
    *
    * Conventions: the trend fit comes from exact integer moments (one
    * hash-agg); residuals are evaluated in THOUSANDS of dollars
    * (cents/1e5) so squared-residual PRODUCTS stay far inside the
    * 6-dp DECIMAL(38,6) term grid at any scale; lag pairs require
    * consecutive days (the [[granger]] t = tlag+1 gate). Returns one
    * row: n_pairs, b_r (aux slope), r2_r, lm_r (NULL on degenerate
    * variance). */
  def archLm(daily: DataFrame, tCol: String,
      yCentsCol: String): DataFrame = {
    val d0 = daily.select(col(tCol).as("_t"),
      col(yCentsCol).cast("decimal(38,0)").as("_y"))
    val m0 = d0.agg(count(lit(1)).as("n"),
      sum(col("_t")).as("_st"),
      sum(col("_t").cast("decimal(38,0)") * col("_t")).as("_stt"),
      sum(col("_y")).as("_sy"),
      sum(col("_t").cast("decimal(38,0)") * col("_y")).as("_sty"))
    def dd(c: String) = col(c).cast("double")
    val bT = (dd("n") * dd("_sty") - dd("_st") * dd("_sy")) /
      nullif(dd("n") * dd("_stt") - dd("_st") * dd("_st"), lit(0.0))
    val fit = m0.select(bT.as("_b"),
      ((dd("_sy") - bT * dd("_st")) / dd("n")).as("_a"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("_t")
    val e = (col("_y").cast("double") - col("_a")
      - col("_b") * col("_t").cast("double")) / 1e5
    val z = d0.crossJoin(broadcast(fit))
      .select(col("_t"), round(e * e, 6).cast("decimal(38,6)").as("_z"))
      .withColumn("_zlag", lag(col("_z"), 1).over(w))
      .withColumn("_tlag", lag(col("_t"), 1).over(w))
      .where(col("_zlag").isNotNull && col("_t") === col("_tlag") + 1)
    def t6(c: org.apache.spark.sql.Column) =
      round(c, 6).cast("decimal(38,6)")
    val zD = col("_z").cast("double")
    val zL = col("_zlag").cast("double")
    val m = z.agg(count(lit(1)).as("n"),
      sum(col("_zlag")).as("_sx"), sum(col("_z")).as("_sy"),
      sum(t6(zL * zL)).as("_sxx"), sum(t6(zD * zD)).as("_syy"),
      sum(t6(zL * zD)).as("_sxy"))
    val nD = dd("n")
    val (sx, sy, sxx, syy, sxy) =
      (dd("_sx"), dd("_sy"), dd("_sxx"), dd("_syy"), dd("_sxy"))
    val num = nD * sxy - sx * sy
    val denX = nD * sxx - sx * sx
    val denY = nD * syy - sy * sy
    val r2 = num * num / nullif(denX * denY, lit(0.0))
    m.select(col("n").as("n_pairs"),
      round(num / nullif(denX, lit(0.0)), 6).as("b_r"),
      round(when(denX > 0 && denY > 0, r2), 6).as("r2_r"),
      round(when(denX > 0 && denY > 0, nD * r2), 6).as("lm_r"))
  }
}
