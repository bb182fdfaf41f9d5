package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Graphs, Markov, Profile, Sequence, TimeSeries}
import graft.util.Tables._

/** Round-14 capstone batch: permutation entropy (the local-shape
  * complement of the Randomness battery), ABC-XYZ inventory
  * segmentation on the banded-prefix machinery, the small-world σ
  * capstone over the graph families, the entropy-production
  * (time-irreversibility) rate of the event-type chain, and spectral
  * flatness over the literal period basis.
  */
object CapstoneQueries {

  private val FlatPeriods = (2 to 14).toSeq
  private val Landmarks = 32
  private val MaxHops = 3

  private val suppEdges = // the q214 supplier co-occurrence CTE
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS g, l_suppkey AS i FROM lineitem),
      |edges AS (
      |  SELECT a.i AS src, b.i AS dst
      |  FROM items a JOIN items b ON a.g = b.g AND a.i < b.i
      |  GROUP BY 1, 2 HAVING count(*) >= 5)""".stripMargin

  private val flatWeightValues = FlatPeriods.flatMap(p =>
    (0 until p).map { r =>
      val c = math.cos(2 * math.Pi * r / p)
      val sn = math.sin(2 * math.Pi * r / p)
      s"($p, $r, ${c}::DOUBLE, ${sn}::DOUBLE)"
    }).mkString(",\n    ")

  val all: Seq[Q] = Seq(

    // Permutation entropy (order 3, position-stable ties) of the
    // daily count series: do the stream's local up-down shapes
    // repeat? Normalized by ln 6.
    Q("q532_permutation_entropy",
      Some("""WITH daily AS (SELECT ts::DATE AS day,
             |  count(*)::BIGINT AS x FROM events GROUP BY 1),
             |tri AS (SELECT x AS a, lead(x, 1) OVER (ORDER BY day)
             |    AS b1,
             |  lead(x, 2) OVER (ORDER BY day) AS c1 FROM daily),
             |pat AS (SELECT (CASE WHEN a <= b1 THEN 4 ELSE 0 END
             |  + CASE WHEN a <= c1 THEN 2 ELSE 0 END
             |  + CASE WHEN b1 <= c1 THEN 1 ELSE 0 END) AS pattern
             |  FROM tri WHERE c1 IS NOT NULL),
             |cnt AS (SELECT pattern, count(*)::BIGINT AS n_p
             |  FROM pat GROUP BY 1),
             |pp(pattern) AS (VALUES (0), (1), (3), (4), (6), (7)),
             |g AS (SELECT pp.pattern,
             |  coalesce(cnt.n_p, 0)::BIGINT AS n_p
             |  FROM pp LEFT JOIN cnt USING (pattern)),
             |t AS (SELECT sum(n_p)::BIGINT AS n FROM g),
             |h AS (SELECT sum(CASE WHEN n_p > 0 THEN
             |    round(-(n_p::DOUBLE / t.n::DOUBLE)
             |      * ln(n_p::DOUBLE / t.n::DOUBLE), 12)
             |      ::DECIMAL(28,12)
             |  ELSE 0::DECIMAL(28,12) END)::DOUBLE AS h FROM g, t)
             |SELECT g.pattern, g.n_p,
             |  round(g.n_p::DOUBLE / t.n::DOUBLE, 6) AS p_r,
             |  round(h.h, 6) AS h_r,
             |  round(h.h / ln(6.0), 6) AS hnorm_r
             |FROM g, t, h ORDER BY pattern""".stripMargin),
      (s, d) => Sequence.permutationEntropy(events(s, d), "ts")),

    // ABC (cumulative revenue share, exact cross-multiplied 70/90
    // cuts) x XYZ (weekly-demand cv bands 0.5/1.0, exact integers)
    // part segmentation — the planner's 3x3, zero-filled.
    Q("q533_abc_xyz",
      Some("""WITH base AS MATERIALIZED (
             |  SELECT l_partkey AS p,
             |    cast(round(l_extendedprice * 100) AS BIGINT) AS cents,
             |    l_quantity::BIGINT AS q,
             |    date_trunc('week', l_shipdate) AS wk
             |  FROM lineitem),
             |w AS (SELECT count(DISTINCT wk)::BIGINT AS w FROM base),
             |pw AS (SELECT p, wk, sum(q)::BIGINT AS wq FROM base
             |  GROUP BY 1, 2),
             |parts AS (SELECT p, sum(wq)::BIGINT AS sq,
             |  sum(wq * wq)::BIGINT AS sq2 FROM pw GROUP BY 1),
             |rev AS (SELECT p, sum(cents)::BIGINT AS rev FROM base
             |  GROUP BY 1),
             |j AS (SELECT parts.p, parts.sq, parts.sq2, rev.rev
             |  FROM parts JOIN rev USING (p)),
             |t AS (SELECT sum(rev)::BIGINT AS t FROM j),
             |cum AS (SELECT p, rev, sq, sq2,
             |  sum(rev) OVER (ORDER BY rev DESC, p)::BIGINT AS runsum
             |  FROM j),
             |cl AS (SELECT
             |  CASE WHEN runsum * 10 <= t.t * 7 THEN 'A'
             |       WHEN runsum * 10 <= t.t * 9 THEN 'B'
             |       ELSE 'C' END AS abc,
             |  CASE WHEN (w.w * sq2 - sq * sq) * 4 <= sq * sq THEN 'X'
             |       WHEN (w.w * sq2 - sq * sq) <= sq * sq THEN 'Y'
             |       ELSE 'Z' END AS xyz,
             |  rev FROM cum, t, w),
             |ag AS (SELECT abc, xyz, count(*)::BIGINT AS n_parts,
             |  sum(rev)::BIGINT AS revenue_cents FROM cl GROUP BY 1, 2),
             |g(abc, xyz) AS (VALUES ('A','X'), ('A','Y'), ('A','Z'),
             |  ('B','X'), ('B','Y'), ('B','Z'), ('C','X'), ('C','Y'),
             |  ('C','Z'))
             |SELECT g.abc, g.xyz,
             |  coalesce(ag.n_parts, 0)::BIGINT AS n_parts,
             |  coalesce(ag.revenue_cents, 0)::BIGINT AS revenue_cents
             |FROM g LEFT JOIN ag USING (abc, xyz)
             |ORDER BY abc, xyz""".stripMargin),
      (s, d) => Profile.abcXyz(lineitem(s, d), "l_partkey",
        "l_extendedprice", "l_quantity", "l_shipdate")),

    // Small-world sigma of the supplier co-occurrence graph:
    // (C/C_rand)/(L/L_rand) from the measured clustering + sampled
    // path length vs the Erdos-Renyi baselines.
    Q("q534_small_world",
      Some(s"""$suppEdges,
              |sym AS (SELECT src, dst FROM edges
              |        UNION ALL SELECT dst, src FROM edges),
              |deg AS (
              |  SELECT src AS vertex, count(*)::BIGINT AS deg
              |  FROM sym GROUP BY 1),
              |tri AS (
              |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
              |  FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
              |  WHERE EXISTS (SELECT 1 FROM edges e3
              |                WHERE e3.src = e1.src
              |                  AND e3.dst = e2.dst)),
              |verts AS (
              |  SELECT a AS vertex FROM tri
              |  UNION ALL SELECT b FROM tri
              |  UNION ALL SELECT c FROM tri),
              |tcnt AS (SELECT vertex, count(*)::BIGINT AS n_tri
              |  FROM verts GROUP BY 1),
              |cbase AS (
              |  SELECT deg.vertex, deg.deg,
              |    CASE WHEN deg.deg >= 2
              |      THEN round(2.0 * coalesce(tcnt.n_tri, 0)
              |        / (deg.deg * (deg.deg - 1)), 6) END AS c_r
              |  FROM deg LEFT JOIN tcnt USING (vertex)),
              |cg AS (SELECT sum(c_r::DECIMAL(18,6))::DOUBLE AS cs,
              |  sum(CASE WHEN c_r IS NOT NULL THEN 1 ELSE 0 END)
              |    ::BIGINT AS cn FROM cbase),
              |nv AS (SELECT count(DISTINCT src)::BIGINT AS n FROM sym),
              |ne AS (SELECT count(*)::BIGINT AS m FROM edges),
              |seeds AS (
              |  SELECT l FROM (SELECT DISTINCT src AS l FROM sym) t
              |  ORDER BY ('0x' || substr(md5(l::VARCHAR), 1, 15))
              |    ::BIGINT, l LIMIT $Landmarks),
              |rec AS (
              |  SELECT l, l AS v, 0 AS d FROM seeds
              |  UNION
              |  SELECT r.l, s.dst AS v, r.d + 1 AS d
              |  FROM rec r JOIN sym s ON r.v = s.src
              |  WHERE r.d < $MaxHops),
              |dist AS (SELECT l, v, min(d) AS d FROM rec GROUP BY 1, 2
              |  HAVING min(d) > 0),
              |bfs AS (SELECT count(*)::BIGINT AS np,
              |  sum(d)::BIGINT AS sd FROM dist),
              |fin AS (SELECT nv.n, ne.m,
              |  CASE WHEN cg.cn > 0 THEN round(cg.cs / cg.cn, 6) END
              |    AS cavg, bfs.np, bfs.sd
              |  FROM nv, ne, cg, bfs)
              |SELECT n AS n_vertices, m AS n_edges, cavg AS c_avg_r,
              |  round(sd::DOUBLE / np::DOUBLE, 6) AS l_mean_r,
              |  round((cavg / (2.0 * m::DOUBLE
              |      / (n::DOUBLE * (n::DOUBLE - 1.0))))
              |    / ((sd::DOUBLE / np::DOUBLE)
              |      / (ln(n::DOUBLE)
              |        / ln(2.0 * m::DOUBLE / n::DOUBLE))), 6)
              |    AS sigma_r
              |FROM fin""".stripMargin
        .replaceFirst("WITH ", "WITH RECURSIVE ")),
      (s, d) => Graphs.smallWorldSigma(
        suppEdgeTable(s, d).cache(), Landmarks, MaxHops)),

    // Entropy production (Schnakenberg time-irreversibility) of the
    // within-user event-type chain: zero iff detailed balance holds;
    // one-sided flows excluded and counted.
    Q("q535_entropy_production",
      Some("""WITH e AS (SELECT user_id, event_type,
             |  epoch_us(ts)::BIGINT AS us, event_id FROM events),
             |s2 AS (SELECT user_id, event_type,
             |  lead(event_type) OVER (PARTITION BY user_id
             |    ORDER BY us, event_id) AS nxt FROM e),
             |tr AS (SELECT event_type AS a, nxt AS b,
             |  count(*)::BIGINT AS n FROM s2 WHERE nxt IS NOT NULL
             |  GROUP BY 1, 2),
             |rv AS (SELECT b AS a, a AS b, n AS nr FROM tr),
             |p AS (SELECT a, b, tr.n, rv.nr
             |  FROM tr FULL OUTER JOIN rv USING (a, b) WHERE a < b),
             |t AS (SELECT sum(n)::BIGINT AS n_transitions FROM tr),
             |ag AS (SELECT
             |  sum(CASE WHEN n IS NOT NULL AND nr IS NOT NULL THEN 1
             |    ELSE 0 END)::BIGINT AS n_pairs,
             |  sum(CASE WHEN n IS NULL OR nr IS NULL THEN 1 ELSE 0
             |    END)::BIGINT AS n_onesided,
             |  coalesce(sum(CASE WHEN n IS NOT NULL AND nr IS NOT NULL
             |    THEN round((n - nr)::DOUBLE
             |      * ln(n::DOUBLE / nr::DOUBLE), 12)::DECIMAL(28,12)
             |    END), 0::DECIMAL(28,12))::DOUBLE AS ep FROM p)
             |SELECT n_transitions, n_pairs, n_onesided,
             |  round(ep, 6) AS ep_r,
             |  round(ep / n_transitions::DOUBLE, 6) AS ep_per_step_r
             |FROM t, ag""".stripMargin),
      (s, d) => Markov.entropyProduction(events(s, d), "user_id",
        "event_type", Seq(col("ts"), col("event_id")))),

    // Spectral flatness (Wiener entropy) over the period-2..14 basis
    // of the global daily series, with the peak bin named.
    Q("q536_spectral_flatness",
      Some(s"""WITH daily AS (SELECT ts::DATE AS day,
              |  count(*)::BIGINT AS x FROM events GROUP BY 1),
              |bounds AS (SELECT min(day) AS d0, max(day) AS d1
              |  FROM daily),
              |spine AS (SELECT b.d0,
              |  unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY))
              |    ::DATE AS day FROM bounds b),
              |filled AS (SELECT (s.day - s.d0)::BIGINT AS t,
              |  coalesce(d.x, 0)::BIGINT AS x
              |  FROM spine s LEFT JOIN daily d USING (day)),
              |wt(period, r, c, sn) AS (VALUES
              |    $flatWeightValues),
              |j AS (SELECT w.period, f.x, w.c, w.sn
              |  FROM filled f JOIN wt w ON f.t % w.period = w.r),
              |a AS (SELECT period, count(*)::BIGINT AS n_days,
              |    sum(x)::DOUBLE AS sx,
              |    sum(round(x * c, 12)::DECIMAL(28,12))::DOUBLE AS sc,
              |    sum(round(x * sn, 12)::DECIMAL(28,12))::DOUBLE AS ss,
              |    sum(round(c, 12)::DECIMAL(28,12))::DOUBLE AS wc,
              |    sum(round(sn, 12)::DECIMAL(28,12))::DOUBLE AS ws
              |  FROM j GROUP BY 1),
              |pw AS (SELECT period,
              |  round((sc - sx / n_days * wc) * (sc - sx / n_days * wc)
              |    + (ss - sx / n_days * ws) * (ss - sx / n_days * ws),
              |    6) AS power_r FROM a),
              |ag AS (SELECT count(*)::BIGINT AS n_periods,
              |  sum(CASE WHEN power_r > 0 THEN 1 ELSE 0 END)::BIGINT
              |    AS npos,
              |  coalesce(sum(CASE WHEN power_r > 0 THEN
              |    round(ln(power_r), 12)::DECIMAL(28,12) END),
              |    0::DECIMAL(28,12))::DOUBLE AS sln,
              |  sum(round(power_r, 12)::DECIMAL(28,12))::DOUBLE AS sp
              |  FROM pw),
              |pk AS (SELECT period AS peak_period,
              |  power_r AS peak_power_r FROM pw
              |  ORDER BY power_r DESC, period LIMIT 1)
              |SELECT n_periods,
              |  round(CASE WHEN npos = n_periods THEN
              |    exp(sln / n_periods::DOUBLE)
              |      / (sp / n_periods::DOUBLE) END, 6) AS flatness_r,
              |  peak_period, peak_power_r
              |FROM ag, pk""".stripMargin),
      (s, d) => TimeSeries.spectralFlatness(events(s, d), "ts",
        FlatPeriods))
  )
}
