package graft.queries

import graft.ops.Nonparam
import graft.util.Tables._

/** Round-12 scale/location nonparametrics batch: the dispersion and
  * ordered-alternative rank tests that complete the two-sample family
  * around q302's Mann–Whitney — Ansari–Bradley and Mood for SCALE,
  * Lepage for location+scale jointly, Mood's median for the crudest
  * k-sample location check, and Jonckheere–Terpstra for ordered
  * groups.
  *
  * All run on the [[graft.ops.Nonparam.twoSampleCore]] posture: one
  * corpus hash-agg to the distinct-value grid, banded prefix sums
  * (never an unpartitioned window over values), closed-form positional
  * score-range sums, 12-dp DECIMAL term accumulation for the
  * tie-averaged rationals. Values enter as exact cents.
  */
object SpreadQueries {

  /** Two-sample grid as SQL: cents value + A/B class counts + prefix
    * machinery + g2/f3 closed-form score sums (mirrors twoSampleCore
    * verbatim). */
  private def coreSql(aVal: String, bVal: String): String =
    s"""src AS (
       |  SELECT CAST(round(value * 100) AS BIGINT) AS v,
       |    event_type AS g
       |  FROM events WHERE event_type IN ('$aVal', '$bVal')),
       |per AS (SELECT v,
       |  sum(CASE WHEN g = '$aVal' THEN 1 ELSE 0 END)::BIGINT AS na,
       |  sum(CASE WHEN g = '$bVal' THEN 1 ELSE 0 END)::BIGINT AS nb
       |  FROM src GROUP BY 1),
       |c1 AS (SELECT v, na, nb, na + nb AS m,
       |  sum(na + nb) OVER (ORDER BY v)::BIGINT AS r,
       |  coalesce(sum(na) OVER (ORDER BY v
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    ::BIGINT AS ca
       |  FROM per),
       |tot AS (SELECT sum(na + nb)::BIGINT AS n FROM per),
       |g AS (SELECT v, na, nb, m, r, r - m AS l,
       |  (r - m) - ca AS cb, n, (n + 1) // 2 AS c
       |  FROM c1, tot),
       |gg AS (SELECT *,
       |  (CASE WHEN r <= c THEN r * (r + 1)
       |    ELSE 2 * c * (c + 1) + 2 * (r - c) * (n + 1) - r * (r + 1)
       |    END)
       |  - (CASE WHEN l <= c THEN l * (l + 1)
       |    ELSE 2 * c * (c + 1) + 2 * (l - c) * (n + 1) - l * (l + 1)
       |    END) AS s2,
       |  (2 * r * (r + 1) * (2 * r + 1) - 6 * (n + 1) * r * (r + 1)
       |    + 3 * (n + 1) * (n + 1) * r)
       |  - (2 * l * (l + 1) * (2 * l + 1) - 6 * (n + 1) * l * (l + 1)
       |    + 3 * (n + 1) * (n + 1) * l) AS q3
       |  FROM g),
       |a AS (SELECT sum(na)::BIGINT AS n_a, sum(nb)::BIGINT AS n_b,
       |  any_value(n) AS n,
       |  sum(na * (2 * cb + nb))::BIGINT AS u2,
       |  sum(m * m * m - m)::BIGINT AS tieterm,
       |  sum(round(na::DOUBLE * (s2::DOUBLE
       |    / (m::DOUBLE * n::DOUBLE)), 12)
       |    ::DECIMAL(28,12))::DOUBLE AS w2,
       |  sum(round(m::DOUBLE * (s2::DOUBLE
       |      / (m::DOUBLE * n::DOUBLE) / 2)
       |    * (s2::DOUBLE / (m::DOUBLE * n::DOUBLE) / 2), 12)
       |    ::DECIMAL(28,12))::DOUBLE AS saab2,
       |  sum(round(na::DOUBLE * (q3::DOUBLE
       |    / (12.0 * m::DOUBLE * n::DOUBLE * n::DOUBLE)), 12)
       |    ::DECIMAL(28,12))::DOUBLE AS tmood,
       |  sum(round(m::DOUBLE * (q3::DOUBLE
       |      / (12.0 * m::DOUBLE * n::DOUBLE * n::DOUBLE))
       |    * (q3::DOUBLE
       |      / (12.0 * m::DOUBLE * n::DOUBLE * n::DOUBLE)), 12)
       |    ::DECIMAL(28,12))::DOUBLE AS samood2
       |  FROM gg)""".stripMargin

  /** The sampling-without-replacement z as SQL (mirrors rankZ),
    * rounded at `digits`. */
  private def zSql(w: String, sa: String, sa2: String,
      digits: Int = 6): String =
    s"""CASE WHEN n_a::DOUBLE * n_b::DOUBLE * (n * $sa2 - ($sa) * ($sa))
       |      / (n::DOUBLE * n::DOUBLE * (n - 1)) > 0
       |  THEN round(($w - n_a::DOUBLE * ($sa) / n)
       |    / sqrt(n_a::DOUBLE * n_b::DOUBLE * (n * $sa2 - ($sa) * ($sa))
       |      / (n::DOUBLE * n::DOUBLE * (n - 1))), $digits)
       |  END""".stripMargin

  // closed-form Σa totals, in the core's N/N²-normalized units
  private val AbSa =
    "(2.0 * ((n + 1) // 2) * (((n + 1) // 2) + 1) " +
      "+ 2.0 * (n - ((n + 1) // 2)) * (n + 1) - n * (n + 1)) / 2 / n"
  private val MoodSa =
    "(2.0 * n * (n + 1) * (2.0 * n + 1) - 6.0 * (n + 1) * n * (n + 1) " +
      "+ 3.0 * (n + 1) * (n + 1) * n) / 12 / (n::DOUBLE * n::DOUBLE)"

  private def eventsCents(s: org.apache.spark.sql.SparkSession,
      d: String) = {
    import org.apache.spark.sql.functions._
    events(s, d).select(col("event_type"),
      round(col("value") * 100).cast("bigint").as("v"))
  }

  val all: Seq[Q] = Seq(

    // Ansari–Bradley scale test: do purchase values SPREAD wider than
    // view values around a common center?
    Q("q468_ansari_bradley",
      Some(s"""WITH ${coreSql("view", "purchase")}
              |SELECT n_a, n_b, round(w2 / 2 * n, 6) AS ab_w_r,
              |  ${zSql("w2 / 2", AbSa, "saab2")} AS z_r
              |FROM a""".stripMargin),
      (s, d) => Nonparam.ansariBradley(eventsCents(s, d), "v",
        "event_type", "view", "purchase", 1024.0)),

    // Mood scale test on the same pair: quadratic center-distance
    // scores (the variance-weighted sibling).
    Q("q469_mood_scale",
      Some(s"""WITH ${coreSql("view", "purchase")}
              |SELECT n_a, n_b, round(tmood, 6) AS mood_t_r,
              |  ${zSql("tmood", MoodSa, "samood2")} AS z_r
              |FROM a""".stripMargin),
      (s, d) => Nonparam.moodScale(eventsCents(s, d), "v",
        "event_type", "view", "purchase", 1024.0)),

    // Lepage portmanteau (click vs error): Wilcoxon z (location) +
    // Ansari–Bradley z (scale), L = z_W² + z_AB² ~ χ²₂.
    Q("q470_lepage",
      Some(s"""WITH ${coreSql("click", "error")},
              |zz AS (SELECT n_a, n_b,
              |  round(CASE WHEN sqrt(n_a::DOUBLE * n_b::DOUBLE / 12.0
              |      * ((n::DOUBLE + 1) - tieterm::DOUBLE
              |        / (n::DOUBLE * (n::DOUBLE - 1)))) > 0
              |    THEN (u2 - n_a * n_b)::DOUBLE
              |      / (2.0 * sqrt(n_a::DOUBLE * n_b::DOUBLE / 12.0
              |        * ((n::DOUBLE + 1) - tieterm::DOUBLE
              |          / (n::DOUBLE * (n::DOUBLE - 1))))) END, 12)
              |    AS zw,
              |  round(${zSql("w2 / 2", AbSa, "saab2", 12)}, 12) AS zab
              |  FROM a)
              |SELECT n_a, n_b, round(zw, 6) AS zw_r,
              |  round(zab, 6) AS zab_r,
              |  round(zw * zw + zab * zab, 6) AS lepage_r
              |FROM zz""".stripMargin),
      (s, d) => Nonparam.lepage(eventsCents(s, d), "v",
        "event_type", "click", "error", 1024.0)),

    // Mood's MEDIAN test across all five event types: k×2 χ² of
    // above/not-above the pooled upper-middle median (the ⌈(N+1)/2⌉-th
    // order statistic, Nonparam.moodMedian's documented convention —
    // the shared 2·C ≥ N+1 predicate selects it).
    Q("q471_mood_median",
      Some("""WITH src AS (
             |  SELECT event_type AS g,
             |    CAST(round(value * 100) AS BIGINT) AS v FROM events),
             |per AS (SELECT v, count(*)::BIGINT AS m FROM src
             |  GROUP BY 1),
             |cum AS (SELECT v, sum(m) OVER (ORDER BY v)::BIGINT AS r
             |  FROM per),
             |tot AS (SELECT sum(m)::BIGINT AS n FROM per),
             |med AS (SELECT min(v) AS med, any_value(n) AS n
             |  FROM cum, tot WHERE 2 * r >= n + 1),
             |cls AS (SELECT g,
             |  sum(CASE WHEN v > med THEN 1 ELSE 0 END)::BIGINT AS ab,
             |  sum(CASE WHEN v > med THEN 0 ELSE 1 END)::BIGINT AS nab,
             |  any_value(med) AS med, any_value(n) AS n
             |  FROM src, med GROUP BY 1),
             |tots AS (SELECT count(*)::BIGINT AS k,
             |  sum(ab)::BIGINT AS tab, sum(nab)::BIGINT AS tnab,
             |  any_value(med) AS med, any_value(n) AS n FROM cls),
             |terms AS (SELECT t.k, t.n, t.med,
             |  round((c.ab::DOUBLE - (c.ab + c.nab)::DOUBLE
             |      * t.tab::DOUBLE / t.n::DOUBLE)
             |    * (c.ab::DOUBLE - (c.ab + c.nab)::DOUBLE
             |      * t.tab::DOUBLE / t.n::DOUBLE)
             |    / ((c.ab + c.nab)::DOUBLE * t.tab::DOUBLE
             |      / t.n::DOUBLE)
             |  + (c.nab::DOUBLE - (c.ab + c.nab)::DOUBLE
             |      * t.tnab::DOUBLE / t.n::DOUBLE)
             |    * (c.nab::DOUBLE - (c.ab + c.nab)::DOUBLE
             |      * t.tnab::DOUBLE / t.n::DOUBLE)
             |    / ((c.ab + c.nab)::DOUBLE * t.tnab::DOUBLE
             |      / t.n::DOUBLE), 12)::DECIMAL(28,12) AS term
             |  FROM cls c, tots t)
             |SELECT n, k, med::DOUBLE AS median_r,
             |  round(sum(term)::DOUBLE, 6) AS chi2_r, k - 1 AS df
             |FROM terms GROUP BY k, n, med""".stripMargin),
      (s, d) => Nonparam.moodMedian(eventsCents(s, d), "v",
        "event_type", 1024.0)),

    // Jonckheere–Terpstra ordered trend across the five order
    // priorities (1-URGENT < … < 5-LOW): does total price trend
    // monotonically with priority class?
    Q("q472_jonckheere",
      Some("""WITH src AS (SELECT o_orderpriority AS g,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
             |  FROM orders),
             |pg AS (SELECT g, v, count(*)::BIGINT AS cnt FROM src
             |  GROUP BY 1, 2),
             |grid AS (SELECT vv.v, ggg.g,
             |  coalesce(pg.cnt, 0)::BIGINT AS cnt
             |  FROM (SELECT DISTINCT v FROM pg) vv
             |  CROSS JOIN (SELECT DISTINCT g FROM pg) ggg
             |  LEFT JOIN pg ON pg.v = vv.v AND pg.g = ggg.g),
             |cum AS (SELECT g, v, cnt,
             |  coalesce(sum(cnt) OVER (PARTITION BY g ORDER BY v
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |    ::BIGINT AS clt FROM grid),
             |pairs AS (SELECT a.v, a.cnt AS ni, a.clt AS ci,
             |  b.cnt AS nj
             |  FROM cum a JOIN cum b ON a.v = b.v AND a.g < b.g),
             |j2t AS (SELECT sum(nj * (2 * ci + ni))::BIGINT AS j2
             |  FROM pairs),
             |gs AS (SELECT count(*)::BIGINT AS k, sum(ng)::BIGINT AS n,
             |  sum(ng * ng)::BIGINT AS sn2,
             |  sum(ng * (ng - 1) * (2 * ng + 5))::BIGINT AS g25,
             |  sum(ng * (ng - 1) * (ng - 2))::BIGINT AS g3,
             |  sum(ng * (ng - 1))::BIGINT AS g2
             |  FROM (SELECT g, sum(cnt)::BIGINT AS ng FROM pg
             |    GROUP BY 1)),
             |ties AS (SELECT
             |  sum(t * (t - 1) * (2 * t + 5))::BIGINT AS t25,
             |  sum(t * (t - 1) * (t - 2))::BIGINT AS t3,
             |  sum(t * (t - 1))::BIGINT AS t2
             |  FROM (SELECT v, sum(cnt)::BIGINT AS t FROM pg
             |    GROUP BY 1)),
             |f AS (SELECT n, k, j2,
             |  ((n::DOUBLE * (n - 1) * (2.0 * n + 5)
             |      - g25::DOUBLE - t25::DOUBLE) / 72
             |    + g3::DOUBLE * t3::DOUBLE
             |      / (36.0 * n::DOUBLE * (n - 1) * (n - 2))
             |    + g2::DOUBLE * t2::DOUBLE
             |      / (8.0 * n::DOUBLE * (n - 1))) AS varj,
             |  (n * n - sn2)::DOUBLE / 2 AS e2
             |  FROM j2t, gs, ties)
             |SELECT n, k, j2,
             |  CASE WHEN varj > 0 THEN
             |    round((j2::DOUBLE - e2) / (2.0 * sqrt(varj)), 6) END
             |    AS z_r
             |FROM f""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.functions._
        val src = orders(s, d).select(col("o_orderpriority"),
          round(col("o_totalprice") * 100).cast("bigint").as("v"))
        Nonparam.jonckheere(src, "v", "o_orderpriority", 1048576.0)
      }))
}
