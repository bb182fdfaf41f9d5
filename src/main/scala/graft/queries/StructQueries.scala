package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Behavior, Graphs, Markov, Profile, Ranks}
import graft.util.Tables._

/** Round-10 distributional/structural audit batch: Theil inequality
  * decomposition indices ([[graft.ops.Profile.theilInequality]] — the
  * entropy complement of q286's Gini/HHI), the Markov order test
  * ([[graft.ops.Markov.orderTest]] — is the q312 attribution model's
  * first-order assumption even true?), the per-user behavioral-entropy
  * distribution ([[graft.ops.Behavior.typeEntropy]]), the rich-club
  * coefficient sweep ([[graft.ops.Graphs.richClub]] — do the q213
  * hubs form a core?), and the experiment-assignment health audit
  * ([[graft.ops.Behavior.armBalanceAudit]] — SRM + covariate SMD, the
  * pre-read gate for every q198/q204/q207-style readout).
  */
object StructQueries {

  /** SUPPLIER co-occurrence graph (support ≥ 5) — q89/q214's dense
    * fixture. MATERIALIZED: DuckDB inlines plain CTEs at every
    * reference, and the unrolled truss peel references each round's
    * frame ~10× — un-materialized, the expansion compounds to
    * thousands of parquet re-opens ("Too many open files"). */
  private val suppEdgesMat =
    """WITH items AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey AS g, l_suppkey AS i FROM lineitem),
      |e0 AS MATERIALIZED (
      |  SELECT a.i AS src, b.i AS dst
      |  FROM items a JOIN items b ON a.g = b.g AND a.i < b.i
      |  GROUP BY 1, 2 HAVING count(*) >= 5)""".stripMargin

  /** One truss-peel round: enumerate oriented triangles of `prev`,
    * credit each triangle's three edges, keep edges with support
    * ≥ k−2 (the kTruss loop body, unrolled; every frame MATERIALIZED
    * — see [[suppEdgesMat]]). */
  private def trussPeelSql(r: Int, prev: String, k: Int): String =
    s"""t$r AS MATERIALIZED (
       |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
       |  FROM $prev e1 JOIN $prev e2 ON e1.dst = e2.src
       |  WHERE EXISTS (SELECT 1 FROM $prev e3
       |    WHERE e3.src = e1.src AND e3.dst = e2.dst)),
       |u$r AS MATERIALIZED (
       |  SELECT src, dst, count(*)::BIGINT AS support FROM (
       |    SELECT a AS src, b AS dst FROM t$r
       |    UNION ALL SELECT b, c FROM t$r
       |    UNION ALL SELECT a, c FROM t$r)
       |  GROUP BY 1, 2),
       |s$r AS MATERIALIZED (
       |  SELECT e.src, e.dst FROM $prev e
       |  JOIN u$r u USING (src, dst)
       |  WHERE u.support >= ${k - 2})""".stripMargin

  /** PART co-occurrence graph (support ≥ 2) — q213's fixture. */
  private val partEdges =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
      |e0 AS (
      |  SELECT a.i AS src, b.i AS dst
      |  FROM items a JOIN items b ON a.g = b.g AND a.i < b.i
      |  GROUP BY 1, 2 HAVING count(*) >= 2)""".stripMargin

  /** The q198/q204 md5 50/50 arm split, verbatim. */
  private val armSql =
    "('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 100 >= 50"

  /** Unrolled MMR greedy recursion (the q312 fixed-step oracle
    * convention): step i picks the argmax of
    * 0.7·rel − (1.0 − 0.7)·max-sim-to-selected over the pool minus
    * steps 1..i−1. (1.0 − 0.7) is kept as an EXPRESSION — the double
    * it evaluates to is not the literal 0.3. */
  private def mmrOracle(qid: Long, poolK: Int, selectK: Int): String = {
    val steps = (2 to selectK).map { i =>
      val selUnion = (1 until i)
        .map(j => s"SELECT vec_id FROM s$j").mkString(" UNION ALL ")
      s"""s$i AS (
         |  SELECT p.vec_id, p.rel, m.maxsim,
         |    0.7 * p.rel - (1.0 - 0.7) * m.maxsim AS mmr
         |  FROM pool p JOIN (
         |    SELECT ia AS vec_id, max(sim) AS maxsim FROM sims
         |    WHERE ib IN ($selUnion) GROUP BY 1) m USING (vec_id)
         |  WHERE p.vec_id NOT IN ($selUnion)
         |  ORDER BY mmr DESC, p.vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val finals = (1 to selectK).map(i =>
      s"SELECT $i AS step, vec_id, round(rel, 9) AS rel_r, " +
        s"round(maxsim, 9) AS maxsim_r, round(mmr, 9) AS mmr_r FROM s$i")
      .mkString(" UNION ALL ")
    s"""WITH q AS (
       |  SELECT embedding::DOUBLE[] AS qe FROM embeddings
       |  WHERE vec_id = $qid),
       |rel0 AS (
       |  SELECT e.vec_id, e.embedding::DOUBLE[] AS ve,
       |    list_cosine_similarity(e.embedding::DOUBLE[], q.qe) AS rel
       |  FROM embeddings e, q WHERE e.vec_id <> $qid),
       |pool AS (
       |  SELECT vec_id, ve, rel FROM rel0 WHERE rel IS NOT NULL
       |  ORDER BY rel DESC, vec_id LIMIT $poolK),
       |sims AS (
       |  SELECT a.vec_id AS ia, b.vec_id AS ib,
       |    list_cosine_similarity(a.ve, b.ve) AS sim
       |  FROM pool a, pool b WHERE a.vec_id <> b.vec_id),
       |s1 AS (
       |  SELECT vec_id, rel, 0.0 AS maxsim,
       |    0.7 * rel - (1.0 - 0.7) * 0.0 AS mmr
       |  FROM pool ORDER BY mmr DESC, vec_id LIMIT 1),
       |$steps
       |SELECT * FROM ($finals) ORDER BY step""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // Theil T + mean-log-deviation L of customer revenue per market
    // segment: the decomposable inequality indices next to q286's
    // Gini/HHI. Positive spenders only (ln); per-row terms 12-dp
    // DECIMAL-summed, mu as ONE double division of exact cents.
    Q("q354_theil_inequality",
      Some("""WITH cust AS (
             |  SELECT c_mktsegment AS seg, c_custkey,
             |    sum(round(o_totalprice * 100)::BIGINT) AS x
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1, 2),
             |pos AS (SELECT seg, x FROM cust WHERE x > 0),
             |g AS (
             |  SELECT seg, count(*)::BIGINT AS n,
             |    sum(x)::HUGEINT AS total
             |  FROM pos GROUP BY 1),
             |t AS (
             |  SELECT p.seg,
             |    round((p.x::DOUBLE / (g.total::DOUBLE / g.n::DOUBLE))
             |      * ln(p.x::DOUBLE / (g.total::DOUBLE / g.n::DOUBLE)),
             |      12)::DECIMAL(28,12) AS tt,
             |    round(ln(p.x::DOUBLE / (g.total::DOUBLE / g.n::DOUBLE)),
             |      12)::DECIMAL(28,12) AS ll
             |  FROM pos p JOIN g USING (seg)),
             |a AS (
             |  SELECT seg, sum(tt)::DOUBLE AS st, sum(ll)::DOUBLE AS sl
             |  FROM t GROUP BY 1)
             |SELECT g.seg, g.n, g.total::BIGINT AS total,
             |  round(a.st / g.n::DOUBLE, 6) AS theil_t_r,
             |  round(-a.sl / g.n::DOUBLE, 6) AS theil_l_r
             |FROM g JOIN a USING (seg) ORDER BY seg""".stripMargin),
      (s, d) => {
        val cust = orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment").as("seg"), col("c_custkey"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long"))
            .as("x"))
        // dtype seam: the op keeps `total` as exact DECIMAL(38,0); the
        // driver hashes dumped parquet by PHYSICAL type, and the DuckDB
        // oracle's HUGEINT fetches as float64 — emit BIGINT on BOTH
        // sides (the r10 hash-only red: values matched, dtypes didn't).
        Profile.theilInequality(cust, "seg", "x")
          .withColumn("total", col("total").cast("long"))
          .orderBy("seg")
      }),

    // Markov order test over user journeys: LR of first- vs
    // second-order on within-user event-type trigrams — the
    // model-validity gate for q312/q313's transition-matrix math.
    Q("q355_markov_order",
      Some("""WITH seq AS (
             |  SELECT user_id, event_type AS c,
             |    lag(event_type, 1) OVER w AS b,
             |    lag(event_type, 2) OVER w AS a
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |tri AS (
             |  SELECT a, b, c, count(*)::BIGINT AS n_abc FROM seq
             |  WHERE a IS NOT NULL GROUP BY 1, 2, 3),
             |nab AS (
             |  SELECT a, b, sum(n_abc)::BIGINT AS n_ab FROM tri
             |  GROUP BY 1, 2),
             |nbc AS (
             |  SELECT b, c, sum(n_abc)::BIGINT AS n_bc FROM tri
             |  GROUP BY 1, 2),
             |nb AS (SELECT b, sum(n_abc)::BIGINT AS n_b FROM tri
             |  GROUP BY 1),
             |m AS (
             |  SELECT count(DISTINCT s)::BIGINT AS m_states FROM (
             |    SELECT a AS s FROM tri UNION ALL SELECT b FROM tri
             |    UNION ALL SELECT c FROM tri)),
             |g AS (
             |  SELECT sum(n_abc)::BIGINT AS n_trigrams,
             |    sum(round(n_abc::DOUBLE
             |      * ln((tri.n_abc * nb.n_b)::DOUBLE
             |        / (nab.n_ab * nbc.n_bc)::DOUBLE), 12)
             |      ::DECIMAL(28,12))::DOUBLE AS sg
             |  FROM tri JOIN nab USING (a, b) JOIN nbc USING (b, c)
             |    JOIN nb USING (b))
             |SELECT n_trigrams, m_states,
             |  (m_states * (m_states - 1) * (m_states - 1))::BIGINT
             |    AS df,
             |  round(2.0 * sg, 6) AS g2_r
             |FROM g, m""".stripMargin),
      (s, d) => Markov.orderTest(events(s, d), "user_id", "event_type",
        Seq(col("ts"), col("event_id")))),

    // Behavioral-entropy distribution: per-user event-type Shannon
    // entropy (12-dp DECIMAL term sums -> exact-grid H), summarized as
    // mean + exact quartiles (bandedRank quantiles, no global sort).
    Q("q356_user_entropy",
      Some("""WITH cnt AS (
             |  SELECT user_id, event_type, count(*)::BIGINT AS c
             |  FROM events GROUP BY 1, 2),
             |tot AS (
             |  SELECT user_id, sum(c)::BIGINT AS n FROM cnt GROUP BY 1),
             |hu AS (
             |  SELECT cnt.user_id,
             |    sum(round(-(c::DOUBLE / n::DOUBLE)
             |      * ln(c::DOUBLE / n::DOUBLE), 12)::DECIMAL(28,12))
             |      AS h
             |  FROM cnt JOIN tot USING (user_id) GROUP BY 1),
             |s AS (
             |  SELECT count(*)::BIGINT AS n_users, sum(h)::DOUBLE AS sh,
             |    quantile_cont(h::DOUBLE, 0.25) AS q1,
             |    quantile_cont(h::DOUBLE, 0.5) AS q2,
             |    quantile_cont(h::DOUBLE, 0.75) AS q3
             |  FROM hu)
             |SELECT n_users, round(sh / n_users::DOUBLE, 6) AS mean_h_r,
             |  round(q1, 6) AS h_p25_r, round(q2, 6) AS h_p50_r,
             |  round(q3, 6) AS h_p75_r
             |FROM s""".stripMargin),
      (s, d) => {
        val he = Behavior.typeEntropy(events(s, d), "user_id",
          "event_type")
        val mean = he.agg(count(lit(1)).as("n_users"),
          sum(col("h")).cast("double").as("_sh"))
        val hq = he.select(lit(0).as("_g"),
          col("h").cast("double").as("_h"), col("user_id"))
        val qs = Ranks.exactQuantiles(hq, "_g", "_h", "user_id",
          bandWidth = 0.25, nums = Seq(1, 2, 3), den = 4)
        val piv = qs.groupBy(col("_g"))
          .agg(max(when(col("q") === 0.25, col("q_val"))).as("_q1"),
            max(when(col("q") === 0.5, col("q_val"))).as("_q2"),
            max(when(col("q") === 0.75, col("q_val"))).as("_q3"))
        mean.crossJoin(broadcast(piv))
          .select(col("n_users"),
            round(col("_sh") / col("n_users").cast("double"), 6)
              .as("mean_h_r"),
            round(col("_q1"), 6).as("h_p25_r"),
            round(col("_q2"), 6).as("h_p50_r"),
            round(col("_q3"), 6).as("h_p75_r"))
      }),

    // Rich-club sweep over the PART co-occurrence graph: is there a
    // hub core the q103/q140 traversals will funnel through? Per-k
    // answers come from bounded degree histograms — no per-k rescans.
    Q("q357_rich_club",
      Some(s"""$partEdges,
              |sym AS (SELECT src, dst FROM e0
              |        UNION ALL SELECT dst, src FROM e0),
              |deg AS (
              |  SELECT src AS v, count(*)::BIGINT AS deg FROM sym
              |  GROUP BY 1),
              |e AS (
              |  SELECT least(d1.deg, d2.deg) AS mindeg
              |  FROM e0 JOIN deg d1 ON e0.src = d1.v
              |  JOIN deg d2 ON e0.dst = d2.v),
              |nh AS (SELECT deg, count(*)::BIGINT AS nv FROM deg
              |  GROUP BY 1),
              |eh AS (SELECT mindeg, count(*)::BIGINT AS ne FROM e
              |  GROUP BY 1),
              |ks AS (SELECT unnest([1, 2, 4, 8, 16]) AS k),
              |n AS (
              |  SELECT k, sum(CASE WHEN deg > k THEN nv ELSE 0 END)
              |    ::BIGINT AS n_nodes
              |  FROM ks CROSS JOIN nh GROUP BY 1),
              |e2 AS (
              |  SELECT k, sum(CASE WHEN mindeg > k THEN ne ELSE 0 END)
              |    ::BIGINT AS n_edges
              |  FROM ks CROSS JOIN eh GROUP BY 1)
              |SELECT n.k, n_nodes, n_edges,
              |  CASE WHEN n_nodes >= 2 THEN
              |    round(2.0 * n_edges / (n_nodes::DOUBLE
              |      * (n_nodes::DOUBLE - 1)), 6) END AS phi_r
              |FROM n JOIN e2 USING (k) ORDER BY k""".stripMargin),
      (s, d) => Graphs.richClub(
          partEdgeTable(s, d).cache(),
          Seq(1, 2, 4, 8, 16))
        .orderBy("k")),

    // Experiment-assignment health: SRM z/chi2 on the md5 50/50 split
    // + standardized mean difference of two pre-read covariates —
    // the gate to run BEFORE believing q198/q204/q207.
    Q("q358_srm_balance",
      Some(s"""WITH u AS (
              |  SELECT user_id, count(*)::BIGINT AS n_events,
              |    sum(coalesce(round(value * 100)::BIGINT, 0))::BIGINT
              |      AS spend_cents,
              |    $armSql AS armb
              |  FROM events GROUP BY user_id),
              |m AS (
              |  SELECT cov, armb, count(*)::BIGINT AS n,
              |    sum(x)::HUGEINT AS sx, sum(x * x)::HUGEINT AS sxx
              |  FROM (
              |    SELECT armb, 'n_events' AS cov, n_events AS x FROM u
              |    UNION ALL
              |    SELECT armb, 'spend_cents', spend_cents FROM u)
              |  GROUP BY 1, 2),
              |p AS (
              |  SELECT cov,
              |    max(CASE WHEN NOT armb THEN n END) AS n_a,
              |    max(CASE WHEN NOT armb THEN sx END)::DOUBLE AS sxa,
              |    max(CASE WHEN NOT armb THEN sxx END)::DOUBLE AS sxxa,
              |    max(CASE WHEN armb THEN n END) AS n_b,
              |    max(CASE WHEN armb THEN sx END)::DOUBLE AS sxb,
              |    max(CASE WHEN armb THEN sxx END)::DOUBLE AS sxxb
              |  FROM m GROUP BY 1),
              |f AS (
              |  SELECT cov, n_a, n_b,
              |    sxa / n_a::DOUBLE AS ma, sxb / n_b::DOUBLE AS mb,
              |    (sxxa - sxa * sxa / n_a::DOUBLE)
              |      / (n_a::DOUBLE - 1) AS va,
              |    (sxxb - sxb * sxb / n_b::DOUBLE)
              |      / (n_b::DOUBLE - 1) AS vb,
              |    (n_b::DOUBLE - n_a::DOUBLE)
              |      / sqrt(n_a::DOUBLE + n_b::DOUBLE) AS z
              |  FROM p)
              |SELECT cov AS covariate, n_a, n_b,
              |  round(ma, 6) AS mean_a_r, round(mb, 6) AS mean_b_r,
              |  CASE WHEN n_a > 1 AND n_b > 1 AND va + vb > 0 THEN
              |    round((mb - ma) / sqrt((va + vb) / 2), 6) END
              |    AS smd_r,
              |  round(z, 6) AS srm_z_r,
              |  round(z * z, 6) AS srm_chi2_r
              |FROM f ORDER BY covariate""".stripMargin),
      (s, d) => {
        val units = events(s, d).groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(coalesce(round(col("value") * 100).cast("long"),
              lit(0L))).as("spend_cents"))
          .withColumn("_arm",
            conv(substring(md5(col("user_id").cast("string")), 1, 8),
              16, 10).cast("long") % 100 >= 50)
        Behavior.armBalanceAudit(units, col("_arm"),
          Seq("n_events", "spend_cents")).orderBy("covariate")
      }),

    // LEFT SEMI stream-stream join — the join-type matrix closer
    // (inner q62 / left q272 / full q319): matched purchases emit on
    // first match with no no-match proof needed, so the finite-input
    // result equals the batch EXISTS.
    Q("q359_stream_stream_semi",
      Some("""SELECT p.event_id AS p_id FROM events p
             |WHERE p.event_type = 'purchase' AND EXISTS (
             |  SELECT 1 FROM events s
             |  WHERE s.event_type = 'signup'
             |    AND s.user_id = p.user_id AND s.ts <= p.ts
             |    AND s.ts >= p.ts - INTERVAL '1 day')
             |ORDER BY p_id""".stripMargin),
      (s, d) => graft.streaming.Streams.streamStreamSemiJoin(s, d,
        "1 DAY").orderBy("p_id")),

    // Hurst exponent (rescaled-range) of daily revenue: long-memory
    // vs mean reversion, with block cumulatives kept in EXACT integer
    // arithmetic (n·Z_i = n·W_i − i·S_n) so no engine-ordered float
    // prefix sum exists anywhere.
    Q("q360_hurst_rs",
      Some("""WITH grain AS (
             |  SELECT o_orderdate::DATE AS day,
             |    sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS y
             |  FROM orders GROUP BY 1),
             |t AS (
             |  SELECT (day - (SELECT min(day) FROM grain))::BIGINT AS t,
             |    y FROM grain),
             |rws AS (
             |  SELECT n, (t.t // n)::BIGINT AS blk, t.t, y
             |  FROM t CROSS JOIN
             |    (SELECT unnest([8, 16, 32, 64]) AS n) ks),
             |ann AS (
             |  SELECT n, blk, t, y,
             |    count(*) OVER wb AS cnt,
             |    sum(y) OVER wcum AS w,
             |    row_number() OVER (PARTITION BY n, blk ORDER BY t)
             |      AS i,
             |    sum(y) OVER wb AS sn,
             |    sum(y::HUGEINT * y::HUGEINT) OVER wb AS syy
             |  FROM rws
             |  WINDOW wb AS (PARTITION BY n, blk),
             |    wcum AS (PARTITION BY n, blk ORDER BY t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |blkv AS (
             |  SELECT n, blk,
             |    max(n * w - i * sn)::BIGINT AS zmax,
             |    min(n * w - i * sn)::BIGINT AS zmin,
             |    max(sn)::BIGINT AS sn, max(syy)::HUGEINT AS syy
             |  FROM ann WHERE cnt = n GROUP BY 1, 2),
             |sd AS (
             |  SELECT n, blk,
             |    (greatest(zmax, 0) - least(zmin, 0))::DOUBLE
             |      / n::DOUBLE AS r,
             |    sqrt((syy::DOUBLE - sn::DOUBLE * sn::DOUBLE
             |      / n::DOUBLE) / n::DOUBLE) AS sdev
             |  FROM blkv),
             |rs AS (
             |  SELECT n, round(r / sdev, 12)::DECIMAL(28,12) AS rst
             |  FROM sd WHERE sdev > 0),
             |ps AS (
             |  SELECT n, count(*)::BIGINT AS n_blocks,
             |    sum(rst)::DOUBLE AS srs
             |  FROM rs GROUP BY 1),
             |ps2 AS (
             |  SELECT n, n_blocks, srs / n_blocks::DOUBLE AS meanrs
             |  FROM ps WHERE srs / n_blocks::DOUBLE > 0),
             |m AS (
             |  SELECT count(*)::BIGINT AS k,
             |    sum(round(ln(n::DOUBLE), 12)::DECIMAL(28,12))::DOUBLE
             |      AS sx,
             |    sum(round(ln(meanrs), 12)::DECIMAL(28,12))::DOUBLE
             |      AS sy,
             |    sum(round(ln(n::DOUBLE) * ln(n::DOUBLE), 12)
             |      ::DECIMAL(28,12))::DOUBLE AS sxx,
             |    sum(round(ln(n::DOUBLE) * ln(meanrs), 12)
             |      ::DECIMAL(28,12))::DOUBLE AS sxy
             |  FROM ps2),
             |h AS (
             |  SELECT CASE WHEN k >= 2
             |      AND k::DOUBLE * sxx - sx * sx > 0 THEN
             |    (k::DOUBLE * sxy - sx * sy)
             |      / (k::DOUBLE * sxx - sx * sx) END AS h
             |  FROM m)
             |SELECT n, n_blocks, round(meanrs, 6) AS mean_rs_r,
             |  round(h, 6) AS h_r
             |FROM ps2 CROSS JOIN h ORDER BY n""".stripMargin),
      (s, d) => {
        val daily = orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long"))
            .as("y"))
        val d0 = daily.agg(min(col("day")).as("_d0"))
        val grain = daily.crossJoin(broadcast(d0))
          .select(datediff(col("day"), col("_d0")).cast("long").as("t"),
            col("y"))
        graft.ops.TimeSeries.hurstRs(grain, "t", "y",
          Seq(8, 16, 32, 64)).orderBy("n")
      }),

    // MMR diversified re-ranking: top-20 cosine pool for one query
    // vector, then the 5-step greedy lambda = 0.7 selection — the
    // near-duplicate-suppressing top-k (the distributed part is one
    // cosineTopK-class scan; the recursion lives on the 20-row pool).
    Q("q361_mmr_rerank",
      Some(mmrOracle(qid = 7L, poolK = 20, selectK = 5)),
      (s, d) => graft.ops.Similarity.mmrRerank(embeddings(s, d),
        queryId = 7L, poolK = 20, selectK = 5, lam = 0.7)
        .orderBy("step")),

    // transformWithState running-spend enrichment (Spark 4 typed-state
    // API on RocksDB): per-user ValueState accumulator, one row per
    // purchase; over AvailableNow the result equals the batch
    // prefix-sum window (exact integer cents).
    Q("q362_tws_running_spend",
      Some("""SELECT user_id,
             |  row_number() OVER w AS purchase_seq, event_id,
             |  (sum(coalesce(round(value * 100)::BIGINT, 0)) OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    )::BIGINT AS cum_cents
             |FROM events WHERE event_type = 'purchase'
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY user_id, purchase_seq""".stripMargin),
      (s, d) => graft.streaming.StatefulTws.runningSpend(s, d)
        .orderBy("user_id", "purchase_seq")),

    // 4-truss of the SUPPLIER graph after 3 fixed peel rounds
    // (GraphsSpec asserts 3 rounds reach the fixpoint; the probe
    // measured fixpoint at 1 round on sf0.001/sf0.01 and 2 on sf0.1):
    // surviving edges with their in-truss triangle support — the
    // edge-grained cohesion core between q214's triangles and q224's
    // vertex k-core.
    Q("q363_ktruss",
      Some(s"""$suppEdgesMat,
              |${trussPeelSql(1, "e0", 4)},
              |${trussPeelSql(2, "s1", 4)},
              |${trussPeelSql(3, "s2", 4)},
              |${trussPeelSql(4, "s3", 4)}
              |SELECT e.src, e.dst,
              |  coalesce(u.support, 0)::BIGINT AS support
              |FROM s3 e LEFT JOIN u4 u USING (src, dst)
              |ORDER BY src, dst""".stripMargin),
      (s, d) => graft.ops.Graphs.kTruss(
          suppEdgeTable(s, d).cache(),
          k = 4, rounds = 3)
        .orderBy("src", "dst")),

    // Wilcoxon signed-rank on week-over-week paired daily revenue:
    // the paired location test (q302 Mann–Whitney's matched sibling)
    // — is this week's revenue shifted vs the same weekday last week?
    Q("q364_wilcoxon_signed_rank",
      Some("""WITH grain AS (
             |  SELECT o_orderdate::DATE AS day,
             |    sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS y
             |  FROM orders GROUP BY 1),
             |t AS (
             |  SELECT (day - (SELECT min(day) FROM grain))::BIGINT AS t,
             |    y FROM grain),
             |dd AS (SELECT a.y - b.y AS d FROM t a JOIN t b
             |  ON a.t = b.t + 7),
             |nz AS (SELECT d FROM dd WHERE d <> 0),
             |per AS (
             |  SELECT abs(d)::BIGINT AS ad, count(*)::BIGINT AS t,
             |    sum(CASE WHEN d > 0 THEN 1 ELSE 0 END)::BIGINT AS p
             |  FROM nz GROUP BY 1),
             |cum AS (
             |  SELECT ad, t, p,
             |    sum(t) OVER (ORDER BY ad ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND CURRENT ROW) - t AS cb
             |  FROM per),
             |a AS (
             |  SELECT sum(t)::BIGINT AS n,
             |    sum(p * (2 * cb + t + 1))::BIGINT AS w2_plus,
             |    sum(t * t * t - t)::BIGINT AS tie
             |  FROM cum),
             |f AS (
             |  SELECT n, w2_plus,
             |    (w2_plus - n * (n + 1) / 2)::DOUBLE AS num,
             |    sqrt((2 * n * (n + 1) * (n * 2 + 1) - tie)::DOUBLE
             |      / 48.0) AS sigma
             |  FROM a)
             |SELECT n, w2_plus,
             |  round(CASE WHEN sigma > 0 AND num <> 0
             |      THEN (num - sign(num)) / (2.0 * sigma)
             |      WHEN sigma > 0 THEN 0.0 END, 6) AS z_r,
             |  round(num / (n * (n + 1) / 2)::DOUBLE, 6)
             |    AS rank_biserial_r
             |FROM f""".stripMargin),
      (s, d) => {
        val daily = orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long"))
            .as("y"))
        val d0 = daily.agg(min(col("day")).as("_d0"))
        val t = daily.crossJoin(broadcast(d0))
          .select(datediff(col("day"), col("_d0")).cast("long").as("t"),
            col("y"))
        val pairs = t.alias("a")
          .join(t.alias("b"), col("a.t") === col("b.t") + 7)
          .select((col("a.y") - col("b.y")).as("d"))
        graft.ops.Nonparam.wilcoxonSignedRank(pairs, "d")
      }),

    // Turning-point randomness test on daily revenue: too few strict
    // local extrema = trend/persistence (corroborates q360's Hurst),
    // too many = over-alternation; Kendall's E/Var under i.i.d.
    Q("q365_turning_points",
      Some("""WITH grain AS (
             |  SELECT o_orderdate::DATE AS day,
             |    sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS y
             |  FROM orders GROUP BY 1),
             |t AS (
             |  SELECT (day - (SELECT min(day) FROM grain))::BIGINT AS t,
             |    y FROM grain),
             |l AS (
             |  SELECT y, lag(y) OVER w AS pv, lead(y) OVER w AS nx
             |  FROM t WINDOW w AS (ORDER BY t)),
             |a AS (
             |  SELECT count(*)::BIGINT AS n_days,
             |    sum(CASE WHEN pv IS NOT NULL AND nx IS NOT NULL
             |      AND ((y > pv AND y > nx) OR (y < pv AND y < nx))
             |      THEN 1 ELSE 0 END)::BIGINT AS n_turns
             |  FROM l)
             |SELECT n_days, n_turns,
             |  round(2.0 * (n_days::DOUBLE - 2) / 3.0, 6) AS expected_r,
             |  round(CASE WHEN n_days >= 3 THEN
             |    (n_turns::DOUBLE - 2.0 * (n_days::DOUBLE - 2) / 3.0)
             |      / sqrt((16.0 * n_days::DOUBLE - 29) / 90.0) END, 6)
             |    AS z_r
             |FROM a""".stripMargin),
      (s, d) => {
        val daily = orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long"))
            .as("y"))
        val d0 = daily.agg(min(col("day")).as("_d0"))
        val t = daily.crossJoin(broadcast(d0))
          .select(datediff(col("day"), col("_d0")).cast("long").as("t"),
            col("y"))
        graft.ops.Nonparam.turningPoints(t, "t", "y")
      }),

    // Hellinger distance between every market-segment pair's
    // order-value distribution ($5k bands): the bounded-metric
    // "do these segments spend differently" readout next to q160's
    // token-space Jensen–Shannon.
    Q("q366_hellinger_segments",
      Some("""WITH v AS (
             |  SELECT c_mktsegment AS g,
             |    round(o_totalprice * 100)::BIGINT // 500000 AS b
             |  FROM orders JOIN customer ON o_custkey = c_custkey),
             |cnt AS (SELECT g, b, count(*)::BIGINT AS c FROM v
             |  GROUP BY 1, 2),
             |tot AS (SELECT g, sum(c)::BIGINT AS n FROM cnt GROUP BY 1),
             |bc AS (
             |  SELECT a.g AS group_a, b2.g AS group_b,
             |    sum(round(sqrt((a.c::DOUBLE / ta.n::DOUBLE)
             |      * (b2.c::DOUBLE / tb.n::DOUBLE)), 12)
             |      ::DECIMAL(28,12))::DOUBLE AS bc
             |  FROM cnt a JOIN cnt b2 ON a.b = b2.b AND a.g < b2.g
             |  JOIN tot ta ON ta.g = a.g JOIN tot tb ON tb.g = b2.g
             |  GROUP BY 1, 2),
             |grid AS (
             |  SELECT a.g AS group_a, a.n AS n_a, b.g AS group_b,
             |    b.n AS n_b
             |  FROM tot a JOIN tot b ON a.g < b.g)
             |SELECT group_a, group_b, n_a, n_b,
             |  round(coalesce(bc, 0.0), 6) AS bc_r,
             |  round(sqrt(1.0 - least(coalesce(bc, 0.0), 1.0)), 6)
             |    AS hellinger_r
             |FROM grid LEFT JOIN bc USING (group_a, group_b)
             |ORDER BY group_a, group_b""".stripMargin),
      (s, d) => {
        val v = orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("seg"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
        graft.ops.Nonparam.hellingerPairs(v, "seg", "cents",
            bandCents = 500000L)
          .orderBy("group_a", "group_b")
      })
  )
}
