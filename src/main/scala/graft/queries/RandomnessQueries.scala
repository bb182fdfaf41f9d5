package graft.queries

import graft.ops.{Control, Randomness}
import graft.util.Tables._

/** Round-13 sequence-randomness + capability batch: the classic "is
  * this metric stream noise" battery (runs / difference-sign /
  * Cox–Stuart / rank von Neumann) over daily event counts, plus the
  * Cp/Cpk process-capability index against baseline-learned spec
  * limits — next to q466's point-by-point I-MR alarms, q464's
  * turning points, and q246's Theil–Sen trend magnitude.
  */
object RandomnessQueries {

  private val DailyCte =
    """daily AS (
      |  SELECT ts::DATE AS day, count(*)::BIGINT AS x
      |  FROM events GROUP BY 1)""".stripMargin

  val all: Seq[Q] = Seq(

    // Wald–Wolfowitz runs test around the pooled upper-middle median:
    // too few same-side runs = level regimes, too many = oscillation.
    Q("q512_runs_test",
      Some(s"""WITH $DailyCte,
              |per AS (SELECT x, count(*)::BIGINT AS m FROM daily
              |  GROUP BY 1),
              |cum AS (SELECT x, sum(m) OVER (ORDER BY x)::BIGINT AS r
              |  FROM per),
              |tot AS (SELECT sum(m)::BIGINT AS n FROM per),
              |med AS (SELECT min(x) AS med FROM cum, tot
              |  WHERE 2 * r >= n + 1),
              |sgn AS (SELECT day,
              |  CASE WHEN x > med THEN 1 ELSE -1 END AS s
              |  FROM daily, med WHERE x <> med),
              |chg AS (SELECT s,
              |  CASE WHEN lag(s) OVER (ORDER BY day) IS NULL
              |    OR lag(s) OVER (ORDER BY day) <> s
              |  THEN 1 ELSE 0 END AS c FROM sgn),
              |a AS (SELECT sum(c)::BIGINT AS runs,
              |  sum(CASE WHEN s = 1 THEN 1 ELSE 0 END)::BIGINT
              |    AS n_above,
              |  sum(CASE WHEN s = -1 THEN 1 ELSE 0 END)::BIGINT
              |    AS n_below FROM chg)
              |SELECT (n_above + n_below)::BIGINT AS n_days,
              |  n_above, n_below, runs,
              |  round(CASE WHEN n_above > 0 AND n_below > 0
              |    THEN 1.0 + 2.0 * n_above::DOUBLE * n_below::DOUBLE
              |      / (n_above + n_below)::DOUBLE END, 6) AS e_runs_r,
              |  round(CASE WHEN n_above > 0 AND n_below > 0
              |      AND n_above + n_below > 1
              |    THEN (runs::DOUBLE - (1.0 + 2.0 * n_above::DOUBLE
              |        * n_below::DOUBLE / (n_above + n_below)::DOUBLE))
              |      / sqrt((2.0 * n_above::DOUBLE * n_below::DOUBLE
              |          * (2.0 * n_above::DOUBLE * n_below::DOUBLE
              |            - (n_above + n_below)::DOUBLE))
              |        / ((n_above + n_below)::DOUBLE
              |          * (n_above + n_below)::DOUBLE
              |          * ((n_above + n_below)::DOUBLE - 1)))
              |    END, 6) AS z_r
              |FROM a""".stripMargin),
      (s, d) => Randomness.runsTest(events(s, d), "ts")),

    // Difference-sign test on day-over-day increments: a monotone
    // trend inflates the increase count (ties excluded).
    Q("q513_difference_sign",
      Some(s"""WITH $DailyCte,
              |dd AS (SELECT x - lag(x) OVER (ORDER BY day) AS d
              |  FROM daily),
              |a AS (SELECT count(*)::BIGINT AS n_incr,
              |  sum(CASE WHEN d > 0 THEN 1 ELSE 0 END)::BIGINT AS n_up
              |  FROM dd WHERE d IS NOT NULL AND d <> 0)
              |SELECT n_incr, n_up,
              |  round(CASE WHEN n_incr > 0
              |    THEN (n_up::DOUBLE - n_incr::DOUBLE / 2)
              |      / sqrt((n_incr::DOUBLE + 2) / 12) END, 6) AS z_r
              |FROM a""".stripMargin),
      (s, d) => Randomness.differenceSign(events(s, d), "ts")),

    // Cox–Stuart paired sign test: first half vs second half of the
    // day series, middle day dropped — the distribution-free monotone
    // trend detector next to q246's Theil–Sen magnitude.
    Q("q514_cox_stuart",
      Some(s"""WITH $DailyCte,
              |idx AS (SELECT x,
              |  CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
              |  FROM daily),
              |nn AS (SELECT count(*)::BIGINT AS n FROM idx),
              |p AS (SELECT b.x - a.x AS d
              |  FROM idx a JOIN idx b
              |    ON b.i = a.i + (SELECT (n + 1) // 2 FROM nn)
              |  WHERE a.i <= (SELECT n // 2 FROM nn)),
              |a2 AS (SELECT count(*)::BIGINT AS n_pairs,
              |  sum(CASE WHEN d > 0 THEN 1 ELSE 0 END)::BIGINT AS n_pos
              |  FROM p WHERE d <> 0)
              |SELECT n_pairs, n_pos,
              |  round(CASE WHEN n_pairs > 0
              |    THEN (n_pos::DOUBLE - n_pairs::DOUBLE / 2)
              |      / sqrt(n_pairs::DOUBLE / 4) END, 6) AS z_r
              |FROM a2""".stripMargin),
      (s, d) => Randomness.coxStuart(events(s, d), "ts")),

    // Bartels rank von Neumann ratio: rank-robust serial correlation
    // (RVN < 2 = positive autocorrelation). Doubled midranks keep
    // everything integer until the final ratio.
    Q("q515_rank_von_neumann",
      Some(s"""WITH $DailyCte,
              |per AS (SELECT x, count(*)::BIGINT AS m FROM daily
              |  GROUP BY 1),
              |cum AS (SELECT x, m,
              |  (sum(m) OVER (ORDER BY x) - m)::BIGINT AS clt FROM per),
              |r2v AS (SELECT x, (2 * clt + m + 1)::BIGINT AS r2
              |  FROM cum),
              |s AS (SELECT day, r2, lead(r2) OVER (ORDER BY day) AS nx
              |  FROM daily JOIN r2v USING (x)),
              |t AS (SELECT count(*)::BIGINT AS n_days,
              |  sum(CASE WHEN nx IS NOT NULL
              |    THEN (r2 - nx) * (r2 - nx) ELSE 0 END)::BIGINT AS num
              |  FROM s),
              |dn AS (SELECT max(n_days)::BIGINT AS n_days,
              |  max(num)::BIGINT AS num,
              |  sum((r2 - (n_days + 1)) * (r2 - (n_days + 1)))::BIGINT
              |    AS den
              |  FROM s, t)
              |SELECT n_days,
              |  round(CASE WHEN den > 0
              |    THEN num::DOUBLE / den::DOUBLE END, 6) AS rvn_r,
              |  round(CASE WHEN den > 0
              |    THEN (num::DOUBLE / den::DOUBLE - 2)
              |      / sqrt(4.0 / n_days::DOUBLE) END, 6) AS z_r
              |FROM dn""".stripMargin),
      (s, d) => Randomness.rankVonNeumann(events(s, d), "ts")),

    // Cp/Cpk process capability of the daily-count tail against
    // baseline-learned μ₀ ± 3σ̂₀ spec limits (σ̂ = M̄R/d₂, the q466
    // I-MR convention; out-of-limits counted with the exact
    // cross-multiplied integer predicate).
    Q("q516_capability",
      Some(s"""WITH $DailyCte,
              |idx AS (SELECT day, x,
              |  CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
              |  CAST(count(*) OVER () AS BIGINT) AS n FROM daily),
              |base AS (SELECT count(*)::BIGINT AS n_base,
              |  sum(x)::BIGINT AS sx0, sum(mr)::BIGINT AS smr0
              |  FROM (SELECT x,
              |    abs(x - lag(x) OVER (ORDER BY day)) AS mr
              |    FROM idx WHERE i <= (7 * n) // 10)),
              |ev AS (SELECT count(*)::BIGINT AS n_eval,
              |  sum(x)::BIGINT AS sx1, sum(mr)::BIGINT AS smr1
              |  FROM (SELECT x,
              |    abs(x - lag(x) OVER (ORDER BY day)) AS mr
              |    FROM idx WHERE i > (7 * n) // 10)),
              |outs AS (SELECT sum(CASE WHEN 1128 * (n_base - 1)
              |    * abs(n_base * x - sx0) > 3000 * n_base * smr0
              |  THEN 1 ELSE 0 END)::BIGINT AS nout
              |  FROM idx, base WHERE i > (7 * n) // 10)
              |SELECT n_base, n_eval,
              |  round(CASE WHEN smr0 > 0 AND smr1 > 0
              |      AND n_base > 1 AND n_eval > 1
              |    THEN (smr0::DOUBLE / (n_base - 1)::DOUBLE / 1.128)
              |      / (smr1::DOUBLE / (n_eval - 1)::DOUBLE / 1.128)
              |    END, 6) AS cp_r,
              |  round(CASE WHEN smr0 > 0 AND smr1 > 0
              |      AND n_base > 1 AND n_eval > 1
              |    THEN least(sx0::DOUBLE / n_base::DOUBLE
              |        + 3.0 * (smr0::DOUBLE / (n_base - 1)::DOUBLE
              |          / 1.128) - sx1::DOUBLE / n_eval::DOUBLE,
              |      sx1::DOUBLE / n_eval::DOUBLE
              |        - (sx0::DOUBLE / n_base::DOUBLE
              |          - 3.0 * (smr0::DOUBLE / (n_base - 1)::DOUBLE
              |            / 1.128)))
              |      / (3.0 * (smr1::DOUBLE / (n_eval - 1)::DOUBLE
              |        / 1.128))
              |    END, 6) AS cpk_r,
              |  round(nout::DOUBLE / n_eval::DOUBLE, 6) AS frac_out_r
              |FROM base, ev, outs""".stripMargin),
      (s, d) => Control.capability(events(s, d), "ts")))
}
