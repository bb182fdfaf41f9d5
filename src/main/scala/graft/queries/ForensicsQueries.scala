package graft.queries

import graft.ops.Forensics
import graft.util.Tables._

/** Round-14 data-forensics batch: Benford first-digit conformity,
  * last-digit uniformity, round-amount excess, inter-event
  * burstiness/memory, and the running-record test — the "does this
  * feed look fabricated or degraded" battery next to the
  * [[graft.ops.Randomness]] serial-structure suite. Amounts enter as
  * exact integer cents; the only transcendentals are the 9 Benford
  * probabilities (Scala literals shared verbatim with the oracle).
  */
object ForensicsQueries {

  /** Benford probabilities as SQL VALUES literals (the spectralPower
    * weight-table idiom: Scala-computed doubles, no engine log10). */
  private val benfordValues = Forensics.BenfordP
    .map { case (d, p) => s"($d, ${p}::DOUBLE)" }.mkString(", ")

  val all: Seq[Q] = Seq(

    // Benford first-digit audit of order totals: digit counts from
    // exact cents vs n·log10(1+1/d), χ² + Nigrini MAD.
    Q("q522_benford",
      Some(s"""WITH c AS MATERIALIZED (
              |  SELECT cast(round(o_totalprice * 100) AS BIGINT) AS c
              |  FROM orders
              |  WHERE cast(round(o_totalprice * 100) AS BIGINT) > 0),
              |fd AS (SELECT substr(c::VARCHAR, 1, 1)::INT AS digit,
              |  count(*)::BIGINT AS n_d FROM c GROUP BY 1),
              |p(digit, p) AS (VALUES $benfordValues),
              |g AS MATERIALIZED (SELECT p.digit, p.p,
              |  coalesce(fd.n_d, 0)::BIGINT AS n_d
              |  FROM p LEFT JOIN fd USING (digit)),
              |t AS (SELECT sum(n_d)::BIGINT AS n FROM g),
              |st AS (SELECT
              |  sum(round(((n_d::DOUBLE - t.n::DOUBLE * p)
              |      * (n_d::DOUBLE - t.n::DOUBLE * p))
              |    / (t.n::DOUBLE * p), 12)::DECIMAL(28,12))::DOUBLE
              |    AS chi2,
              |  sum(round(abs(n_d::DOUBLE / t.n::DOUBLE - p), 12)
              |    ::DECIMAL(28,12))::DOUBLE AS sad
              |  FROM g, t)
              |SELECT g.digit, g.n_d,
              |  round(t.n::DOUBLE * g.p, 6) AS e_r,
              |  round(st.chi2, 6) AS chi2_r,
              |  round(st.sad / 9.0, 6) AS mad_r
              |FROM g, t, st ORDER BY digit""".stripMargin),
      (s, d) => Forensics.benfordFirstDigit(orders(s, d),
        "o_totalprice")),

    // Last-digit uniformity of line-item prices: terminal cents
    // digits vs uniform n/10, χ² + max count deviation.
    Q("q523_last_digit",
      Some("""WITH c AS MATERIALIZED (
             |  SELECT cast(round(l_extendedprice * 100) AS BIGINT) AS c
             |  FROM lineitem
             |  WHERE cast(round(l_extendedprice * 100) AS BIGINT) > 0),
             |ld AS (SELECT (c % 10)::INT AS digit,
             |  count(*)::BIGINT AS n_d FROM c GROUP BY 1),
             |dg(digit) AS (VALUES (0), (1), (2), (3), (4), (5), (6),
             |  (7), (8), (9)),
             |g AS MATERIALIZED (SELECT dg.digit,
             |  coalesce(ld.n_d, 0)::BIGINT AS n_d
             |  FROM dg LEFT JOIN ld USING (digit)),
             |t AS (SELECT sum(n_d)::BIGINT AS n FROM g),
             |st AS (SELECT
             |  sum(round(((n_d::DOUBLE - t.n::DOUBLE / 10.0)
             |      * (n_d::DOUBLE - t.n::DOUBLE / 10.0))
             |    / (t.n::DOUBLE / 10.0), 12)::DECIMAL(28,12))::DOUBLE
             |    AS chi2,
             |  max(abs(n_d::DOUBLE - t.n::DOUBLE / 10.0)) AS mx
             |  FROM g, t)
             |SELECT g.digit, g.n_d,
             |  round(t.n::DOUBLE / 10.0, 6) AS e_r,
             |  round(st.chi2, 6) AS chi2_r,
             |  round(st.mx, 6) AS maxdev_r
             |FROM g, t, st ORDER BY digit""".stripMargin),
      (s, d) => Forensics.lastDigitUniformity(lineitem(s, d),
        "l_extendedprice")),

    // Round-amount excess in event values: whole/half/quarter-dollar
    // shares vs uniform-cents nulls, binomial z each.
    Q("q524_round_amounts",
      Some("""WITH c AS MATERIALIZED (
             |  SELECT cast(round(value * 100) AS BIGINT) AS c
             |  FROM events
             |  WHERE cast(round(value * 100) AS BIGINT) > 0),
             |a AS (SELECT count(*)::BIGINT AS n,
             |  sum(CASE WHEN c % 100 = 0 THEN 1 ELSE 0 END)::BIGINT
             |    AS n_whole,
             |  sum(CASE WHEN c % 50 = 0 THEN 1 ELSE 0 END)::BIGINT
             |    AS n_half,
             |  sum(CASE WHEN c % 25 = 0 THEN 1 ELSE 0 END)::BIGINT
             |    AS n_quarter
             |  FROM c)
             |SELECT n, n_whole,
             |  round((n_whole::DOUBLE - n::DOUBLE * 0.01)
             |    / sqrt(n::DOUBLE * 0.01 * (1.0 - 0.01)), 6)
             |    AS z_whole_r,
             |  n_half,
             |  round((n_half::DOUBLE - n::DOUBLE * 0.02)
             |    / sqrt(n::DOUBLE * 0.02 * (1.0 - 0.02)), 6)
             |    AS z_half_r,
             |  n_quarter,
             |  round((n_quarter::DOUBLE - n::DOUBLE * 0.04)
             |    / sqrt(n::DOUBLE * 0.04 * (1.0 - 0.04)), 6)
             |    AS z_quarter_r
             |FROM a""".stripMargin),
      (s, d) => Forensics.roundAmountExcess(events(s, d), "value")),

    // Burstiness B and memory M of inter-event micro gaps per event
    // type (Goh & Barabási): exact integer gap moments, the n factors
    // cancelled so each sqrt argument is one exact integer. q168 has
    // per-user B; the new coordinate here is M (lag-1 gap correlation)
    // completing the (B, M) phase plane at the stream grain.
    Q("q525_burstiness",
      Some("""WITH g0 AS (SELECT event_type,
             |  epoch_us(ts)::BIGINT AS t, event_id FROM events),
             |g1 AS (SELECT event_type, t, event_id,
             |  t - lag(t) OVER w AS g FROM g0
             |  WINDOW w AS (PARTITION BY event_type
             |    ORDER BY t, event_id)),
             |g2 AS (SELECT event_type, g, lead(g) OVER w AS gn
             |  FROM g1
             |  WINDOW w AS (PARTITION BY event_type
             |    ORDER BY t, event_id)),
             |gf AS MATERIALIZED (SELECT event_type, g, gn FROM g2
             |  WHERE g IS NOT NULL),
             |a AS (SELECT event_type, count(*)::BIGINT AS n_gaps,
             |  sum(g::HUGEINT)::HUGEINT AS sg,
             |  sum(g::HUGEINT * g)::HUGEINT AS sg2,
             |  count(gn)::BIGINT AS n1,
             |  sum(CASE WHEN gn IS NOT NULL THEN g::HUGEINT END)
             |    ::HUGEINT AS sa,
             |  sum(CASE WHEN gn IS NOT NULL THEN g::HUGEINT * g END)
             |    ::HUGEINT AS sa2,
             |  sum(gn::HUGEINT)::HUGEINT AS sb,
             |  sum(gn::HUGEINT * gn)::HUGEINT AS sb2,
             |  sum(g::HUGEINT * gn)::HUGEINT AS sab
             |  FROM gf GROUP BY 1)
             |SELECT event_type, n_gaps,
             |  round((sqrt((n_gaps::HUGEINT * sg2 - sg * sg)::DOUBLE)
             |      - sg::DOUBLE)
             |    / (sqrt((n_gaps::HUGEINT * sg2 - sg * sg)::DOUBLE)
             |      + sg::DOUBLE), 6) AS burstiness_r,
             |  round(CASE WHEN (n1::HUGEINT * sa2 - sa * sa)::DOUBLE > 0
             |      AND (n1::HUGEINT * sb2 - sb * sb)::DOUBLE > 0 THEN
             |    (n1::HUGEINT * sab - sa * sb)::DOUBLE
             |      / (sqrt((n1::HUGEINT * sa2 - sa * sa)::DOUBLE)
             |        * sqrt((n1::HUGEINT * sb2 - sb * sb)::DOUBLE))
             |    END, 6) AS memory_r
             |FROM a ORDER BY event_type""".stripMargin),
      (s, d) => Forensics.burstinessMemory(events(s, d), "event_type",
        "ts", "event_id")),

    // Running-record test on the daily count series: up/down records
    // vs the i.i.d. null E[R] = H_n, Var[R] = H_n − H_n⁽²⁾.
    Q("q526_records_test",
      Some("""WITH daily AS (SELECT ts::DATE AS day,
             |  count(*)::BIGINT AS x FROM events GROUP BY 1),
             |r AS (SELECT day, x,
             |  max(x) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
             |    PRECEDING AND 1 PRECEDING) AS mx,
             |  min(x) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
             |    PRECEDING AND 1 PRECEDING) AS mn
             |  FROM daily),
             |rec AS MATERIALIZED (SELECT count(*)::BIGINT AS n_days,
             |  sum(CASE WHEN mx IS NULL OR x > mx THEN 1 ELSE 0 END)
             |    ::BIGINT AS n_up,
             |  sum(CASE WHEN mn IS NULL OR x < mn THEN 1 ELSE 0 END)
             |    ::BIGINT AS n_down FROM r),
             |h AS (SELECT
             |  sum(round(1.0 / k::DOUBLE, 12)::DECIMAL(28,12))::DOUBLE
             |    AS h1,
             |  sum(round(1.0 / k::DOUBLE - 1.0
             |    / (k::DOUBLE * k::DOUBLE), 12)::DECIMAL(28,12))
             |    ::DOUBLE AS hv
             |  FROM rec, unnest(generate_series(1, rec.n_days)) s(k))
             |SELECT n_days, n_up, n_down,
             |  round(h.h1, 6) AS e_records_r,
             |  round(h.hv, 6) AS var_records_r
             |FROM rec, h""".stripMargin),
      (s, d) => Forensics.recordsTest(events(s, d), "ts"))
  )
}
