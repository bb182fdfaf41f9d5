package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Posthoc
import graft.util.Tables._

/** Round-12 post-hoc/stratified batch: the AFTER-the-omnibus tests —
  * Dunn pairwise (after Kruskal–Wallis q297), Tukey–Kramer HSD (after
  * the DOW ANOVA q295), Quade (the block-weighted Friedman next to
  * q305), Page's ordered trend, and Breslow–Day/Tarone odds-ratio
  * homogeneity (the heterogeneity check q332's Mantel–Haenszel
  * pooling silently assumes away).
  */
object PosthocQueries {

  /** Daily event counts keyed by ISO (yearweek block, isodow
    * treatment) — the complete-block frame Quade/Page run on. */
  private val CellsSql =
    """daily AS (
      |  SELECT ts::DATE AS day, count(*)::BIGINT AS x
      |  FROM events GROUP BY 1),
      |cells AS (
      |  SELECT (year(day + (4 - isodow(day))::INT) * 100
      |      + weekofyear(day))::BIGINT AS blk,
      |    isodow(day)::INT AS trt, x AS v
      |  FROM daily),
      |kall AS (SELECT count(DISTINCT trt)::BIGINT AS kall FROM cells),
      |comp AS (
      |  SELECT c.* FROM cells c JOIN (
      |    SELECT blk FROM cells GROUP BY blk
      |    HAVING count(DISTINCT trt) = (SELECT kall FROM kall)) f
      |  USING (blk)),
      |ranked AS (SELECT blk, trt, v,
      |  2 * (count(*) OVER (PARTITION BY blk ORDER BY v
      |    RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |  + (count(*) OVER (PARTITION BY blk ORDER BY v
      |    RANGE BETWEEN CURRENT ROW AND CURRENT ROW)) + 1 AS r2,
      |  max(v) OVER (PARTITION BY blk)
      |    - min(v) OVER (PARTITION BY blk) AS rng
      |  FROM comp)""".stripMargin

  private def cellsSpark(s: org.apache.spark.sql.SparkSession,
      d: String) = {
    val daily = events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    // blk pairs weekofyear with the ISO year (the Thursday trick:
    // calendar year of day + (4 − isodow)), not the calendar year —
    // Dec 29–31 belong to ISO week 1 of year N+1 and must not merge
    // with January-of-N's week 1 (round-12 ADVICE).
    val iso = ((dayofweek(col("day")) + 5) % 7) + 1
    daily.select(
      (year(date_add(col("day"), lit(4) - iso)) * 100
        + weekofyear(col("day"))).cast("bigint").as("blk"),
      iso.cast("int").as("trt"),
      col("x").as("v"))
  }

  val all: Seq[Q] = Seq(

    // Dunn's pairwise z after Kruskal–Wallis across the five event
    // types on value cents: which PAIRS differ, tie-corrected.
    Q("q473_dunn_posthoc",
      Some("""WITH src AS (SELECT event_type AS g,
             |    CAST(round(value * 100) AS BIGINT) AS v FROM events),
             |pv AS (SELECT v, count(*)::BIGINT AS m FROM src
             |  GROUP BY 1),
             |cum AS (SELECT v, m,
             |  (sum(m) OVER (ORDER BY v) - m)::BIGINT AS clt FROM pv),
             |pg AS (SELECT g, v, count(*)::BIGINT AS cnt FROM src
             |  GROUP BY 1, 2),
             |grp AS (SELECT g, sum(cnt)::BIGINT AS ng,
             |  sum(cnt * (2 * clt + m + 1))::BIGINT AS r2
             |  FROM pg JOIN cum USING (v) GROUP BY 1),
             |tot AS (SELECT sum(m)::BIGINT AS n,
             |  sum(m * m * m - m)::BIGINT AS t3 FROM pv)
             |SELECT a.g AS ga, b.g AS gb, a.ng AS n_a, b.ng AS n_b,
             |  CASE WHEN (n::DOUBLE * (n + 1) / 12
             |      - t3::DOUBLE / (12.0 * (n - 1))) > 0 THEN
             |    round((a.r2::DOUBLE / (2.0 * a.ng::DOUBLE)
             |        - b.r2::DOUBLE / (2.0 * b.ng::DOUBLE))
             |      / sqrt((n::DOUBLE * (n + 1) / 12
             |          - t3::DOUBLE / (12.0 * (n - 1)))
             |        * (1.0 / a.ng::DOUBLE + 1.0 / b.ng::DOUBLE)), 6)
             |    END AS z_r
             |FROM grp a JOIN grp b ON a.g < b.g, tot
             |ORDER BY ga, gb""".stripMargin),
      (s, d) => Posthoc.dunn(
        events(s, d).select(col("event_type").as("g"),
          round(col("value") * 100).cast("bigint").as("v")),
        "v", "g", 1024.0)),

    // Tukey–Kramer HSD q statistics over the day-of-week groups of
    // daily counts (the q295 ANOVA's post-hoc).
    Q("q474_tukey_hsd",
      Some("""WITH daily AS (
             |  SELECT ts::DATE AS day, count(*)::BIGINT AS x
             |  FROM events GROUP BY 1),
             |g AS (SELECT isodow(day)::INT AS dw, x FROM daily),
             |st AS (SELECT dw, count(*)::BIGINT AS ng,
             |  sum(x)::BIGINT AS s, sum(x * x)::BIGINT AS s2
             |  FROM g GROUP BY 1),
             |msw AS (SELECT sum(ng)::BIGINT AS n,
             |  count(*)::BIGINT AS k,
             |  sum(round(s2::DOUBLE - s::DOUBLE * s::DOUBLE
             |    / ng::DOUBLE, 12)::DECIMAL(28,12))::DOUBLE AS ssw
             |  FROM st),
             |m2 AS (SELECT n, k, ssw / (n - k)::DOUBLE AS msw FROM msw)
             |SELECT a.dw AS ga, b.dw AS gb,
             |  round(a.s::DOUBLE / a.ng::DOUBLE
             |    - b.s::DOUBLE / b.ng::DOUBLE, 6) AS diff_r,
             |  round((a.s::DOUBLE / a.ng::DOUBLE
             |      - b.s::DOUBLE / b.ng::DOUBLE)
             |    / sqrt(msw / 2 * (1.0 / a.ng::DOUBLE
             |      + 1.0 / b.ng::DOUBLE)), 6) AS q_r
             |FROM st a JOIN st b ON a.dw < b.dw, m2
             |ORDER BY ga, gb""".stripMargin),
      (s, d) => {
        val daily = events(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("x"))
          .select((((dayofweek(col("day")) + 5) % 7) + 1).cast("int")
            .as("dw"), col("x"))
        Posthoc.tukeyHsd(daily, "x", "dw")
      }),

    // Quade test: does day-of-week move daily volume, weighting weeks
    // by how much in-week spread they carry?
    Q("q475_quade",
      Some(s"""WITH $CellsSql,
              |kb AS (SELECT blk, count(*)::BIGINT AS k,
              |  any_value(rng) AS rngb FROM ranked GROUP BY 1),
              |wts AS (SELECT blk, k,
              |  2 * (count(*) OVER (ORDER BY rngb
              |    RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
              |  + (count(*) OVER (ORDER BY rngb
              |    RANGE BETWEEN CURRENT ROW AND CURRENT ROW)) + 1
              |    AS w2 FROM kb),
              |s AS (SELECT r.blk, r.trt,
              |  w.w2 * (r.r2 - (w.k + 1)) AS s4
              |  FROM ranked r JOIN wts w USING (blk)),
              |agg AS (SELECT trt, sum(s4)::BIGINT AS sj4,
              |  sum(s4 * s4)::BIGINT AS a16p FROM s GROUP BY 1),
              |top AS (SELECT count(*)::BIGINT AS k,
              |  sum(sj4 * sj4)::BIGINT AS b16n,
              |  sum(a16p)::BIGINT AS a16 FROM agg),
              |nb AS (SELECT count(DISTINCT blk)::BIGINT AS n_blocks
              |  FROM s)
              |SELECT n_blocks, k,
              |  round(a16::DOUBLE / 16, 6) AS a_r,
              |  round(b16n::DOUBLE / (16.0 * n_blocks::DOUBLE), 6)
              |    AS b_r,
              |  CASE WHEN a16::DOUBLE / 16
              |      - b16n::DOUBLE / (16.0 * n_blocks::DOUBLE) > 0
              |    THEN round((n_blocks - 1)::DOUBLE
              |      * (b16n::DOUBLE / (16.0 * n_blocks::DOUBLE))
              |      / (a16::DOUBLE / 16
              |        - b16n::DOUBLE / (16.0 * n_blocks::DOUBLE)), 6)
              |    END AS f_r
              |FROM top, nb""".stripMargin),
      (s, d) => Posthoc.quade(cellsSpark(s, d), "blk", "trt", "v")),

    // Page's L: is there a MONOTONE day-of-week trend (Mon → Sun)
    // in daily volume across weeks?
    Q("q476_page_trend",
      Some(s"""WITH $CellsSql,
              |treats AS (SELECT trt,
              |  row_number() OVER (ORDER BY trt) AS j
              |  FROM (SELECT DISTINCT trt FROM comp)),
              |agg AS (SELECT sum(j * r2)::BIGINT AS l2,
              |  count(DISTINCT blk)::BIGINT AS n_blocks,
              |  count(DISTINCT r.trt)::BIGINT AS k
              |  FROM ranked r JOIN treats USING (trt))
              |SELECT n_blocks, k, l2,
              |  CASE WHEN n_blocks::DOUBLE * k * k * (k + 1)
              |      * (k * k - 1) / 144 > 0
              |    THEN round((l2::DOUBLE / 2
              |        - n_blocks::DOUBLE * k * (k + 1) * (k + 1) / 4)
              |      / sqrt(n_blocks::DOUBLE * k * k * (k + 1)
              |        * (k * k - 1) / 144), 6) END AS z_r
              |FROM agg""".stripMargin),
      (s, d) => Posthoc.pageTrend(cellsSpark(s, d), "blk", "trt", "v")),

    // Breslow–Day + Tarone: is the urgent-priority ↔ high-value odds
    // ratio HOMOGENEOUS across market segments (the check behind
    // q332's MH pooling)?
    Q("q477_breslow_day",
      Some("""WITH j AS (SELECT c_mktsegment AS s,
             |  (o_orderpriority = '1-URGENT') AS e,
             |  (o_totalprice > 150000) AS y
             |  FROM orders JOIN customer ON o_custkey = c_custkey),
             |tab0 AS (SELECT s,
             |  sum(CASE WHEN e AND y THEN 1 ELSE 0 END)::BIGINT AS a,
             |  sum(CASE WHEN e AND NOT y THEN 1 ELSE 0 END)::BIGINT
             |    AS b,
             |  sum(CASE WHEN NOT e AND y THEN 1 ELSE 0 END)::BIGINT
             |    AS c,
             |  sum(CASE WHEN NOT e AND NOT y THEN 1 ELSE 0 END)
             |    ::BIGINT AS d
             |  FROM j GROUP BY 1),
             |tab AS (SELECT * FROM tab0
             |  WHERE a + b > 0 AND c + d > 0 AND a + c > 0
             |    AND b + d > 0),
             |mh AS (SELECT
             |  sum(round(a::DOUBLE * d::DOUBLE
             |    / (a + b + c + d)::DOUBLE, 12)
             |    ::DECIMAL(28,12))::DOUBLE AS num,
             |  sum(round(b::DOUBLE * c::DOUBLE
             |    / (a + b + c + d)::DOUBLE, 12)
             |    ::DECIMAL(28,12))::DOUBLE AS den FROM tab),
             |w AS (SELECT tab.*, num / den AS psi,
             |  (a + b)::DOUBLE AS n1, (c + d)::DOUBLE AS n0,
             |  (a + c)::DOUBLE AS m1 FROM tab, mh),
             |q AS (SELECT *, psi - 1 AS qa,
             |  -(psi * (n1 + m1) + (n0 - m1)) AS qb,
             |  psi * n1 * m1 AS qc FROM w),
             |at AS (SELECT *,
             |  CASE WHEN abs(qa) < 1e-12 THEN -qc / qb
             |    WHEN (-qb - sqrt(qb * qb - 4.0 * qa * qc))
             |        / (2.0 * qa) > greatest(0.0, m1 - n0)
             |      AND (-qb - sqrt(qb * qb - 4.0 * qa * qc))
             |        / (2.0 * qa) < least(n1, m1)
             |    THEN (-qb - sqrt(qb * qb - 4.0 * qa * qc))
             |      / (2.0 * qa)
             |    ELSE (-qb + sqrt(qb * qb - 4.0 * qa * qc))
             |      / (2.0 * qa) END AS atil FROM q),
             |v AS (SELECT *, 1.0 / (1.0 / atil + 1.0 / (n1 - atil)
             |  + 1.0 / (m1 - atil) + 1.0 / (n0 - m1 + atil)) AS vv
             |  FROM at)
             |SELECT count(*)::BIGINT AS k,
             |  round(any_value(psi), 6) AS psi_mh_r,
             |  round(sum(round((a::DOUBLE - atil) * (a::DOUBLE - atil)
             |    / vv, 12)::DECIMAL(28,12))::DOUBLE, 6) AS bd_r,
             |  round(sum(round((a::DOUBLE - atil) * (a::DOUBLE - atil)
             |      / vv, 12)::DECIMAL(28,12))::DOUBLE
             |    - sum(round(a::DOUBLE - atil, 12)
             |        ::DECIMAL(28,12))::DOUBLE
             |      * sum(round(a::DOUBLE - atil, 12)
             |        ::DECIMAL(28,12))::DOUBLE
             |      / sum(round(vv, 12)::DECIMAL(28,12))::DOUBLE, 6)
             |    AS tarone_r,
             |  count(*) - 1 AS df
             |FROM v""".stripMargin),
      (s, d) => {
        val j = orders(s, d).join(customer(s, d),
          col("o_custkey") === col("c_custkey"))
        Posthoc.breslowDay(j, "c_mktsegment",
          col("o_orderpriority") === "1-URGENT",
          col("o_totalprice") > 150000)
      }))
}
