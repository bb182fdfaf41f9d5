package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Agreement, TextOps}
import graft.util.Tables._

/** Round-12 inter-rater agreement batch: before training on
  * heuristic pseudo-labels, measure whether the labelers agree beyond
  * chance. Three deterministic quality heuristics act as raters over
  * the documents corpus (Fleiss' kappa, Krippendorff's alpha,
  * quadratic-weighted kappa); three revenue metrics act as judges
  * ranking nations (Kendall's W); and the event_type × weekday
  * contingency gets the bias-corrected Cramér's V. All bounded-grid
  * closed forms on exact integer counts.
  */
object AgreementQueries {

  private val normSql = TextQueries.normSql

  /** Three binary heuristic raters over documents — integer-only
    * comparisons so both engines bucket identically. */
  private[queries] val ratersSql =
    s"""WITH tok AS MATERIALIZED (
       |  SELECT doc_id, n_chars,
       |    len(string_split($normSql, ' '))::BIGINT AS n_tokens
       |  FROM documents),
       |r AS MATERIALIZED (
       |  SELECT doc_id, 1 AS rater,
       |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS cat FROM tok
       |  UNION ALL
       |  SELECT doc_id, 2,
       |    CASE WHEN n_tokens >= 55 THEN 1 ELSE 0 END FROM tok
       |  UNION ALL
       |  SELECT doc_id, 3,
       |    CASE WHEN n_chars <= 6 * n_tokens THEN 1 ELSE 0 END
       |  FROM tok),
       |g AS MATERIALIZED (
       |  SELECT doc_id, cat, count(*)::BIGINT AS n
       |  FROM r GROUP BY 1, 2)""".stripMargin

  private[queries] def raters(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val tok = documents(s, dir).select(col("doc_id"), col("n_chars"),
      size(TextOps.tokens(TextOps.normalize(col("text")))).cast("long")
        .as("n_tokens"))
    tok.select(col("doc_id"), lit(1).as("rater"),
        when(col("n_chars") >= 300, lit(1)).otherwise(lit(0)).as("cat"))
      .unionByName(tok.select(col("doc_id"), lit(2).as("rater"),
        when(col("n_tokens") >= 55, lit(1)).otherwise(lit(0))
          .as("cat")))
      .unionByName(tok.select(col("doc_id"), lit(3).as("rater"),
        when(col("n_chars") <= lit(6) * col("n_tokens"), lit(1))
          .otherwise(lit(0)).as("cat")))
  }

  val all: Seq[Q] = Seq(

    // Fleiss' kappa of the three quality heuristics: do the cheap
    // pseudo-labelers agree beyond chance, or is the "quality" label
    // mostly labeler noise?
    Q("q443_fleiss_kappa",
      Some(s"""$ratersSql,
              |a AS (SELECT count(DISTINCT doc_id)::DOUBLE AS ni,
              |  sum(n::HUGEINT * n)::DOUBLE AS s2 FROM g),
              |b AS (SELECT sum(t::HUGEINT * t)::DOUBLE AS b FROM
              |  (SELECT cat, sum(n)::BIGINT AS t FROM g GROUP BY 1) tt)
              |SELECT ni::BIGINT AS n_items, 3::BIGINT AS m_raters,
              |  round((s2 - ni * 3.0) / (ni * 3.0 * (3.0 - 1.0)), 6)
              |    AS p_bar_r,
              |  round(b / ((ni * 3.0) * (ni * 3.0)), 6) AS p_e_r,
              |  round(((s2 - ni * 3.0) / (ni * 3.0 * (3.0 - 1.0))
              |    - b / ((ni * 3.0) * (ni * 3.0)))
              |    / nullif(1.0 - b / ((ni * 3.0) * (ni * 3.0)), 0.0), 6)
              |    AS kappa_r
              |FROM a, b""".stripMargin),
      (s, d) => Agreement.fleissKappa(raters(s, d), "doc_id", "cat", 3)),

    // Krippendorff's alpha (nominal) on the same rater frame — the
    // agreement measure that generalizes to missing ratings and is
    // the annotation-pipeline standard.
    Q("q444_krippendorff_alpha",
      Some(s"""$ratersSql,
              |items AS MATERIALIZED (
              |  SELECT doc_id, sum(n)::BIGINT AS mu,
              |    sum(n::HUGEINT * n)::DOUBLE AS s2u
              |  FROM g GROUP BY 1 HAVING sum(n) >= 2),
              |dn AS (SELECT sum(round(
              |    (mu::DOUBLE * mu::DOUBLE - s2u) / (mu::DOUBLE - 1.0),
              |    12)::DECIMAL(28,12))::DOUBLE AS dnum FROM items),
              |m AS (SELECT sum(nc)::DOUBLE AS n,
              |  sum(nc::HUGEINT * nc)::DOUBLE AS c2 FROM
              |  (SELECT cat, sum(n)::BIGINT AS nc
              |   FROM g JOIN items USING (doc_id) GROUP BY 1) t)
              |SELECT n::BIGINT AS n_vals, round(dnum, 6) AS d_o_num_r,
              |  round(1.0 - dnum * (n - 1.0)
              |    / nullif(n * n - c2, 0.0), 6) AS alpha_r
              |FROM m, dn""".stripMargin),
      (s, d) => Agreement.krippendorffAlphaNominal(raters(s, d),
        "doc_id", "cat")),

    // Kendall's W: three revenue judges (total revenue, order count,
    // distinct customers) each rank the nations — is "top market" a
    // stable notion across metrics?
    Q("q445_kendall_w",
      Some(s"""WITH nat AS MATERIALIZED (
              |  SELECT n.n_name AS item,
              |    sum(round(o_totalprice * 100))::BIGINT AS rev,
              |    count(*)::BIGINT AS n_orders,
              |    count(DISTINCT o.o_custkey)::BIGINT AS n_cust
              |  FROM orders o
              |    JOIN customer c ON o.o_custkey = c.c_custkey
              |    JOIN nation n ON c.c_nationkey = n.n_nationkey
              |  GROUP BY 1),
              |rk AS (
              |  SELECT 1 AS judge, item,
              |    rank() OVER (ORDER BY rev DESC, item) AS rnk FROM nat
              |  UNION ALL SELECT 2, item,
              |    rank() OVER (ORDER BY n_orders DESC, item) FROM nat
              |  UNION ALL SELECT 3, item,
              |    rank() OVER (ORDER BY n_cust DESC, item) FROM nat),
              |pi AS (SELECT item, sum(rnk)::BIGINT AS ri,
              |  count(*)::BIGINT AS m FROM rk GROUP BY 1),
              |km AS (SELECT count(*)::BIGINT AS k,
              |  max(m)::BIGINT AS mj FROM pi)
              |SELECT k AS k_items, mj AS m_judges,
              |  round(3.0 * sum((2 * ri - mj * (k + 1))::HUGEINT
              |      * (2 * ri - mj * (k + 1)))::DOUBLE
              |    / nullif(mj::DOUBLE * mj::DOUBLE
              |      * (k::DOUBLE * k::DOUBLE * k::DOUBLE - k::DOUBLE),
              |      0.0), 6) AS w_r
              |FROM pi, km
              |GROUP BY k, mj""".stripMargin),
      (s, d) => {
        val nat = orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("item"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long"))
            .as("rev"), count(lit(1)).as("n_orders"),
            countDistinct(col("o_custkey")).as("n_cust"))
        // unpartitioned ranks over the bounded |nations| grid (≤25
        // rows after the group-by) — WindowGrainSpec/WindowPlanSpec
        // allowlisted
        val rk = nat.select(lit(1).as("judge"), col("item"),
            rank().over(Window.orderBy(col("rev").desc, col("item")))
              .as("rnk"))
          .unionByName(nat.select(lit(2).as("judge"), col("item"),
            rank().over(Window.orderBy(col("n_orders").desc,
              col("item"))).as("rnk")))
          .unionByName(nat.select(lit(3).as("judge"), col("item"),
            rank().over(Window.orderBy(col("n_cust").desc,
              col("item"))).as("rnk")))
        Agreement.kendallW(rk, "judge", "item", "rnk")
      }),

    // Bias-corrected Cramér's V of event_type × weekday: how much of
    // the traffic mix is weekday-structured, with the small-sample
    // inflation removed (Bergsma correction).
    Q("q446_cramers_v",
      Some("""WITH cell AS MATERIALIZED (
             |  SELECT event_type AS x, dayofweek(CAST(ts AS DATE)) AS y,
             |    count(*)::BIGINT AS n
             |  FROM events GROUP BY 1, 2),
             |rx AS (SELECT x, sum(n)::BIGINT AS rx FROM cell GROUP BY 1),
             |cy AS (SELECT y, sum(n)::BIGINT AS cy FROM cell GROUP BY 1),
             |t AS (SELECT
             |  sum(round(n::DOUBLE * n::DOUBLE
             |    / (rx::DOUBLE * cy::DOUBLE), 12)::DECIMAL(28,12))
             |    ::DOUBLE AS sphi,
             |  sum(n)::DOUBLE AS nn
             |  FROM cell JOIN rx USING (x) JOIN cy USING (y)),
             |dims AS (SELECT (SELECT count(*)::DOUBLE FROM rx) AS r,
             |  (SELECT count(*)::DOUBLE FROM cy) AS c)
             |SELECT nn::BIGINT AS n, r::BIGINT AS r_levels,
             |  c::BIGINT AS c_levels,
             |  round(sphi - 1.0, 6) AS phi2_r,
             |  round(sqrt((sphi - 1.0) / least(r - 1.0, c - 1.0)), 6)
             |    AS v_r,
             |  round(sqrt(greatest(sphi - 1.0
             |      - (r - 1.0) * (c - 1.0) / (nn - 1.0), 0.0)
             |    / nullif(least(r - (r - 1.0) * (r - 1.0) / (nn - 1.0)
             |        - 1.0,
             |      c - (c - 1.0) * (c - 1.0) / (nn - 1.0) - 1.0),
             |      0.0)), 6) AS v_corrected_r
             |FROM t, dims""".stripMargin),
      (s, d) => Agreement.cramersVCorrected(
        events(s, d).select(col("event_type").as("x"),
          (dayofweek(col("ts").cast("date")) - 1).as("y")),
        "x", "y")),

    // Quadratic-weighted Cohen's kappa between the length tier and
    // the token tier of each document: ordinal agreement between two
    // views of "document size" — near-misses penalized quadratically.
    Q("q447_weighted_kappa",
      Some(s"""WITH tok AS MATERIALIZED (
              |  SELECT doc_id, n_chars,
              |    len(string_split($normSql, ' '))::BIGINT AS n_tokens
              |  FROM documents),
              |p AS MATERIALIZED (
              |  SELECT CASE WHEN n_chars < 200 THEN 0
              |    WHEN n_chars < 380 THEN 1 ELSE 2 END AS a,
              |    CASE WHEN n_tokens < 38 THEN 0
              |    WHEN n_tokens < 70 THEN 1 ELSE 2 END AS b
              |  FROM tok),
              |cell AS (SELECT a, b, count(*)::BIGINT AS n
              |  FROM p GROUP BY 1, 2),
              |ra AS (SELECT a, sum(n)::BIGINT AS ra FROM cell GROUP BY 1),
              |cb AS (SELECT b, sum(n)::BIGINT AS cb FROM cell GROUP BY 1),
              |num AS (SELECT
              |  sum(((a - b) * (a - b))::HUGEINT * n)::DOUBLE AS num,
              |  sum(CASE WHEN a = b THEN n ELSE 0 END)::DOUBLE AS agree,
              |  sum(n)::DOUBLE AS nn FROM cell),
              |den AS (SELECT
              |  sum(((ra.a - cb.b) * (ra.a - cb.b))::HUGEINT
              |    * ra.ra * cb.cb)::DOUBLE AS den
              |  FROM ra, cb)
              |SELECT nn::BIGINT AS n, round(agree / nn, 6) AS po_r,
              |  round(1.0 - nn * num / nullif(den, 0.0), 6)
              |    AS kappa_w_r
              |FROM num, den""".stripMargin),
      (s, d) => {
        val tok = documents(s, d).select(col("n_chars"),
          size(TextOps.tokens(TextOps.normalize(col("text"))))
            .cast("long").as("n_tokens"))
        val p = tok.select(
          when(col("n_chars") < 200, lit(0))
            .when(col("n_chars") < 380, lit(1)).otherwise(lit(2))
            .as("a"),
          when(col("n_tokens") < 38, lit(0))
            .when(col("n_tokens") < 70, lit(1)).otherwise(lit(2))
            .as("b"))
        Agreement.weightedKappaQuadratic(p, "a", "b")
      }))
}
