package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Curation, Graphs, Heavy, Intervals, Quantize, Retrieval,
  Scd, TimeSeries}
import graft.util.Tables._

/** Round-5 depth batch: warehouse temporal history (SCD2), time-series
  * repair, lexical retrieval (BM25), mixture resampling, sketch-assisted
  * exact heavy hitters, graph centrality (PageRank), and embedding
  * quantization. Oracle constants are interpolated from the same Scala
  * values the engine ops receive, so the twins cannot drift.
  */
object DepthQueries {

  // ---- shared DuckDB SQL fragments (same single-source convention as
  // TextQueries: Scala consts → both engines)
  private val normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
  private def hash60Sql(e: String) = s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  // q89's co-occurrence graph, reused by PageRank: suppliers sharing an
  // order, oriented src<dst, support >= 5
  private[queries] val edgesCte =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS g, l_suppkey AS i FROM lineitem),
      |e0 AS (
      |  SELECT a.i AS src, b.i AS dst
      |  FROM items a JOIN items b ON a.g = b.g AND a.i < b.i
      |  GROUP BY 1, 2 HAVING count(*) >= 5),
      |sym AS (SELECT src, dst FROM e0
      |        UNION ALL SELECT dst, src FROM e0),
      |deg AS (SELECT src, count(*)::BIGINT AS deg FROM sym GROUP BY 1),
      |nn AS (SELECT count(*)::DOUBLE AS n FROM deg)""".stripMargin

  // BM25 constants — passed to the op AND interpolated into the oracle
  // (private[queries]: the q145 RRF fusion reuses the same lexical list)
  private[queries] val Bm25K1 = 1.2
  private[queries] val Bm25B = 0.75
  private[queries] val Bm25Terms = Seq("spark", "merge", "window")
  private val Bm25TopN = 20

  /** BM25 scored-docs CTE chain ending in bm25s(doc_id, n_terms_hit,
    * bm25) — shared by q100 and the q145 fusion oracle. */
  private[queries] lazy val bm25Cte: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS term
       |  FROM documents),
       |dl AS (SELECT doc_id, count(*)::BIGINT AS dl
       |       FROM tok GROUP BY 1),
       |consts AS (SELECT count(*)::BIGINT AS n_docs,
       |                  avg(dl) AS avgdl FROM dl),
       |tf AS (
       |  SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok
       |  WHERE term IN (${Bm25Terms.map(t => s"'$t'").mkString(", ")})
       |  GROUP BY 1, 2),
       |dfreq AS (SELECT term, count(*)::BIGINT AS df
       |          FROM tf GROUP BY 1),
       |bm25s AS (
       |  SELECT t.doc_id, count(*) AS n_terms_hit,
       |    round(sum(
       |      ln(1.0 + (c.n_docs - f.df + 0.5) / (f.df + 0.5)) *
       |      (t.tf * ${Bm25K1 + 1.0}::DOUBLE) /
       |      (t.tf + ${Bm25K1}::DOUBLE *
       |        (${1.0 - Bm25B}::DOUBLE +
       |         ${Bm25B}::DOUBLE * d.dl / c.avgdl))
       |    ), 6) AS bm25
       |  FROM tf t JOIN dl d USING (doc_id)
       |    JOIN dfreq f USING (term), consts c
       |  GROUP BY t.doc_id)""".stripMargin

  // heavy-hitter threshold/capacity (k+1 >= 1/phi → exact two-pass)
  private val HhPhi = 0.01
  private val HhK = 199

  // mixture weights — Seq (not Map) so SQL interpolation order is stable
  private val MixWeights = Seq("src0" -> 0.4, "src1" -> 0.3,
    "src2" -> 0.2, "src3" -> 0.05, "src4" -> 0.05)

  // PageRank iteration count / damping
  private val PrIters = 3
  private val PrDamping = 0.85

  // EWMA horizon minus one (generate_series upper bound is inclusive)
  private val EwmaHorizonM1 = 7

  val all: Seq[Q] = Seq(

    // SCD Type-2 dimension history from the orders "changelog": per
    // customer, compress consecutive equal statuses, then version with
    // valid_from/valid_to/is_current. One shuffle (both windows share
    // the o_custkey partitioning).
    Q("q98_scd2_history",
      Some("""WITH ordered AS (
             |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             |    lag(o_orderstatus) OVER w AS prev_status,
             |    lag(o_orderkey) OVER w AS prev_key
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_custkey
             |               ORDER BY o_orderdate, o_orderkey)),
             |kept AS (
             |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
             |  FROM ordered
             |  WHERE prev_key IS NULL
             |     OR o_orderstatus IS DISTINCT FROM prev_status)
             |SELECT o_custkey, o_orderstatus,
             |  o_orderdate AS valid_from,
             |  lead(o_orderdate) OVER wk AS valid_to,
             |  (lead(o_orderdate) OVER wk) IS NULL AS is_current,
             |  row_number() OVER wk AS version
             |FROM kept
             |WINDOW wk AS (PARTITION BY o_custkey
             |              ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, version""".stripMargin),
      (s, d) => Scd.scd2(orders(s, d), "o_custkey", "o_orderdate",
          "o_orderkey", Seq("o_orderstatus"))
        .orderBy("o_custkey", "version")),

    // Dense per-user daily series with explicit gap rows and forward
    // fill. Spine size is per-key span, never |keys| x global range.
    Q("q99_gapfill_ffill",
      Some("""WITH daily AS (
             |  SELECT user_id, ts::DATE AS day,
             |    round(sum(value), 6) AS day_value
             |  FROM events GROUP BY 1, 2),
             |bounds AS (
             |  SELECT user_id, min(day) AS d0, max(day) AS d1
             |  FROM daily GROUP BY 1),
             |spine AS (
             |  SELECT user_id,
             |    unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
             |  FROM bounds)
             |SELECT s.user_id, s.day, d.day_value,
             |  last_value(d.day_value IGNORE NULLS) OVER (
             |    PARTITION BY s.user_id ORDER BY s.day
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS filled_value,
             |  d.day_value IS NULL AS is_gap
             |FROM spine s LEFT JOIN daily d USING (user_id, day)
             |ORDER BY user_id, day""".stripMargin),
      (s, d) => TimeSeries.fillDailyGaps(events(s, d), "user_id", "ts",
          "value")
        .orderBy("user_id", "day")),

    // Okapi BM25 top-20 for a fixed query over documents — corpus stats
    // (N, avgdl, df) and scoring mirrored term-for-term in SQL.
    Q("q100_bm25_topk",
      Some(s"""$bm25Cte
              |SELECT doc_id, n_terms_hit, bm25 FROM bm25s
              |ORDER BY bm25 DESC, doc_id
              |LIMIT $Bm25TopN""".stripMargin),
      (s, d) => Retrieval.bm25TopK(documents(s, d), "doc_id", "text",
        Bm25Terms, Bm25TopN, k1 = Bm25K1, b = Bm25B)),

    // Mixture resample documents to target source weights: feasibility
    // T = min(n_d/w_d), per-domain keep fraction T*w_d/n_d, md5-hash60
    // keep decisions — the corpus is filtered, never shuffled.
    Q("q101_mixture_resample",
      Some(s"""WITH w(source, wt) AS (VALUES
              |  ${MixWeights.map { case (s0, w) =>
                   s"('$s0', $w::DOUBLE)" }.mkString(",\n  ")}),
              |in_d AS (
              |  SELECT doc_id, source FROM documents
              |  WHERE source IN (${MixWeights.map(p => s"'${p._1}'")
                   .mkString(", ")})),
              |counts AS (SELECT source, count(*)::BIGINT AS n
              |           FROM in_d GROUP BY 1),
              |tt AS (SELECT min(c.n / w.wt) AS t
              |       FROM counts c JOIN w USING (source)),
              |frac AS (SELECT c.source, tt.t * w.wt / c.n AS frac
              |         FROM counts c JOIN w USING (source), tt)
              |SELECT d.doc_id, d.source
              |FROM in_d d JOIN frac f USING (source)
              |WHERE (${hash60Sql("d.doc_id::VARCHAR")})::DOUBLE
              |      / 1152921504606846976.0 < f.frac
              |ORDER BY d.doc_id""".stripMargin),
      (s, d) => Curation.mixtureResample(documents(s, d), "doc_id",
          "source", MixWeights.toMap)
        .select("doc_id", "source").orderBy("doc_id")),

    // Exact heavy-hitter tokens (share > 1%) via the Misra-Gries typed
    // Aggregator candidate pass + exact recount. The oracle is a plain
    // GROUP BY ... HAVING — exactness is the k+1 >= 1/phi guarantee.
    Q("q102_heavy_hitters",
      Some(s"""WITH tok AS (
              |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS term
              |  FROM documents),
              |tot AS (SELECT count(*)::BIGINT AS n FROM tok)
              |SELECT term, count(*) AS cnt,
              |  round(count(*) / tot.n, 6) AS share
              |FROM tok, tot
              |GROUP BY term, tot.n
              |HAVING count(*) > tot.n * $HhPhi::DOUBLE
              |ORDER BY term""".stripMargin),
      (s, d) => {
        val tok = documents(s, d).select(col("doc_id"),
          explode(graft.ops.TextOps.tokens(
            graft.ops.TextOps.normalize(col("text")))).as("term"))
        Heavy.heavyHitters(tok, "term", HhPhi, HhK).orderBy("term")
      }),

    // PageRank (3 fixed iterations, damping 0.85) on the q89 supplier
    // co-occurrence graph — the oracle unrolls the iterations as CTEs.
    Q("q103_pagerank",
      Some {
        val iterCtes = (1 to PrIters).map { i =>
          s"""r$i AS (
             |  SELECT s.dst AS vertex,
             |    ${1.0 - PrDamping}::DOUBLE / nn.n +
             |    $PrDamping::DOUBLE * sum(r.pr / d.deg) AS pr
             |  FROM sym s JOIN r${i - 1} r ON s.src = r.vertex
             |    JOIN deg d ON s.src = d.src, nn
             |  GROUP BY s.dst, nn.n)""".stripMargin
        }.mkString(",\n")
        s"""$edgesCte,
           |r0 AS (SELECT src AS vertex, 1.0 / n AS pr FROM deg, nn),
           |$iterCtes
           |SELECT vertex, round(pr, 9) AS pagerank
           |FROM r$PrIters ORDER BY vertex""".stripMargin
      },
      (s, d) => Graphs.pageRank(
          suppEdgeTable(s, d),
          PrIters, PrDamping)
        .orderBy("vertex")),

    // Max concurrent open orders per customer via the sweep line —
    // 2 boundary rows per interval, one key shuffle, no interval
    // self-join. Intervals are derived deterministically from orders
    // (duration = o_orderkey % 7 + 1 days); ends are exclusive (the -1
    // sorts before the +1 at an equal timestamp).
    Q("q105_interval_concurrency",
      Some("""WITH iv AS (
             |  SELECT o_custkey, o_orderdate AS s,
             |    o_orderdate + (o_orderkey % 7 + 1)::INTEGER
             |      * INTERVAL 1 DAY AS e,
             |    o_orderkey AS tie
             |  FROM orders),
             |b AS (
             |  SELECT o_custkey, s AS ts, 1 AS delta, tie FROM iv
             |  UNION ALL
             |  SELECT o_custkey, e, -1, tie FROM iv),
             |r AS (
             |  SELECT o_custkey,
             |    sum(delta) OVER (PARTITION BY o_custkey
             |      ORDER BY ts, delta, tie
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS conc
             |  FROM b)
             |SELECT o_custkey, max(conc)::BIGINT AS max_concurrent
             |FROM r GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        val iv = orders(s, d).select(col("o_custkey"),
          col("o_orderdate").as("s"),
          expr("timestampadd(DAY, CAST(o_orderkey % 7 + 1 AS INT), " +
            "o_orderdate)").as("e"),
          col("o_orderkey").as("tie"))
        Intervals.maxConcurrent(iv, "o_custkey", "s", "e", "tie")
          .orderBy("o_custkey")
      }),

    // Dyadic-decay EWMA (weight 2^-offset, horizon 8 days) of each
    // user's daily value series, evaluated at observed days. Bounded
    // map-side fan-out — no range self-join.
    Q("q106_ewma_daily",
      Some(s"""WITH daily AS (
              |  SELECT user_id, ts::DATE AS day,
              |    round(sum(value), 6) AS v
              |  FROM events GROUP BY 1, 2),
              |contrib AS (
              |  SELECT user_id, day + g.o::INTEGER AS day2,
              |    v * pow(0.5::DOUBLE, g.o) AS wv,
              |    pow(0.5::DOUBLE, g.o) AS w
              |  FROM daily, unnest(generate_series(0, $EwmaHorizonM1))
              |    AS g(o)),
              |agg AS (
              |  SELECT user_id, day2 AS day,
              |    round(sum(wv) / sum(w), 9) AS ewma
              |  FROM contrib GROUP BY 1, 2)
              |SELECT a.user_id, a.day, a.ewma
              |FROM agg a JOIN daily d USING (user_id, day)
              |ORDER BY user_id, day""".stripMargin),
      (s, d) => TimeSeries.ewmaDaily(events(s, d), "user_id", "ts",
          "value", EwmaHorizonM1 + 1)
        .orderBy("user_id", "day")),

    // Symmetric int8 quantization diagnostics per embedding: scale,
    // max reconstruction error, cosine(original, reconstructed).
    Q("q104_int8_quantize",
      Some("""WITH ex AS (
             |  SELECT vec_id, unnest(embedding)::DOUBLE AS x
             |  FROM embeddings),
             |sc AS (
             |  SELECT vec_id, count(*)::BIGINT AS dim,
             |    max(abs(x)) / 127.0 AS scale
             |  FROM ex GROUP BY 1),
             |q AS (
             |  SELECT e.vec_id, e.x,
             |    CASE WHEN s.scale = 0 THEN 0.0
             |         ELSE floor(e.x / s.scale + 0.5) * s.scale
             |    END AS recon
             |  FROM ex e JOIN sc s USING (vec_id))
             |SELECT q.vec_id, s.dim, round(s.scale, 9) AS scale,
             |  round(max(abs(q.x - q.recon)), 9) AS max_abs_err,
             |  CASE WHEN s.scale = 0 THEN 1.0
             |       ELSE round(sum(q.x * q.recon) /
             |            (sqrt(sum(q.x * q.x)) *
             |             sqrt(sum(q.recon * q.recon))), 9)
             |  END AS cos_recon
             |FROM q JOIN sc s USING (vec_id)
             |GROUP BY q.vec_id, s.dim, s.scale
             |ORDER BY q.vec_id""".stripMargin),
      (s, d) => Quantize.int8Diagnostics(embeddings(s, d), "vec_id",
          "embedding")
        .orderBy("vec_id"))
  )
}
