package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Cluster, Profile, TextOps}
import graft.util.Tables._

/** Round-12 density/dispersion batch: shifted-positive PMI
  * collocations (the SGNS statistic), the rarefaction curve
  * (species-accumulation — does more data still buy vocabulary?),
  * the Atkinson/GE inequality family, grid-density clustering
  * (DBSCAN's scalable shape), and the Calinski–Harabasz validity
  * index on the labeled embedding space.
  */
object DensityQueries {

  private val normSql = TextQueries.normSql
  private val SppmiWindow = 2
  private val SppmiShift = 5.0
  private val SppmiMinCount = 5L
  private val SppmiTopK = 20
  private val RareFracs = Seq(0.01, 0.05, 0.25, 1.0)
  private val GridH = 0.05
  private val GridMinPts = 5L

  val all: Seq[Q] = Seq(

    // SPPMI top pairs: the word2vec-equivalent association matrix's
    // strongest cells — PMI shifted by ln 5 and clipped at 0, over
    // directed +/-2 skip-gram pairs.
    Q("q453_sppmi_pairs",
      Some(s"""WITH toks AS MATERIALIZED (
              |  SELECT doc_id, string_split($normSql, ' ') AS t
              |  FROM documents),
              |pos AS MATERIALIZED (
              |  SELECT doc_id, i AS p, t[i] AS tok FROM toks,
              |    unnest(generate_series(1, len(t))) AS g(i)),
              |fwd AS (SELECT a.tok AS w, b.tok AS c
              |  FROM pos a
              |  CROSS JOIN (VALUES (1), (2)) o(off)
              |  JOIN pos b ON b.doc_id = a.doc_id
              |    AND b.p = a.p + o.off),
              |dir AS (SELECT w, c FROM fwd
              |  UNION ALL SELECT c AS w, w AS c FROM fwd),
              |cnt AS MATERIALIZED (
              |  SELECT w, c, count(*)::BIGINT AS cwc
              |  FROM dir GROUP BY 1, 2),
              |mw AS (SELECT w, sum(cwc)::BIGINT AS cw FROM cnt
              |  GROUP BY 1),
              |mc AS (SELECT c, sum(cwc)::BIGINT AS cc FROM cnt
              |  GROUP BY 1),
              |tot AS (SELECT sum(cwc)::BIGINT AS d FROM cnt)
              |SELECT w, c, n_pair, sppmi_r FROM (
              |  SELECT w, c, cwc AS n_pair,
              |    greatest(ln(cwc::DOUBLE * d::DOUBLE
              |      / (cw::DOUBLE * cc::DOUBLE))
              |      - ${math.log(SppmiShift)}, 0.0) AS raw,
              |    round(greatest(ln(cwc::DOUBLE * d::DOUBLE
              |      / (cw::DOUBLE * cc::DOUBLE))
              |      - ${math.log(SppmiShift)}, 0.0), 6) AS sppmi_r
              |  FROM cnt JOIN mw USING (w) JOIN mc USING (c), tot
              |  WHERE w < c AND cwc >= $SppmiMinCount
              |  ORDER BY raw DESC, w, c LIMIT $SppmiTopK) x
              |ORDER BY sppmi_r DESC, w, c""".stripMargin),
      (s, d) => TextOps.sppmiTopPairs(documents(s, d), "doc_id",
        "text", SppmiWindow, SppmiShift, SppmiMinCount, SppmiTopK)),

    // Rarefaction curve: expected distinct vocabulary at 1%, 5%, 25%
    // and 100% of the token volume — flat tail = the corpus has
    // stopped paying vocabulary for data.
    Q("q454_rarefaction",
      Some(s"""WITH tc AS MATERIALIZED (
              |  SELECT tok, count(*)::BIGINT AS n FROM (
              |    SELECT unnest(string_split($normSql, ' ')) AS tok
              |    FROM documents) t
              |  GROUP BY 1),
              |tot AS (SELECT sum(n)::BIGINT AS bign,
              |  count(*)::BIGINT AS v FROM tc),
              |f(frac) AS (VALUES ${RareFracs
                .map(f => s"(${f}::DOUBLE)").mkString(", ")})
              |SELECT frac, m, v AS v_total, round(e, 6)
              |  AS e_distinct_r
              |FROM (
              |  SELECT frac, floor(bign::DOUBLE * frac)::BIGINT AS m,
              |    v,
              |    sum(round(1.0 - exp(round(
              |      floor(bign::DOUBLE * frac)
              |      * ln(greatest(1.0 - n::DOUBLE / bign::DOUBLE,
              |        1e-15)), 12)), 12)::DECIMAL(28,12))::DOUBLE AS e
              |  FROM f, tot, tc GROUP BY 1, 2, 3) t
              |ORDER BY frac""".stripMargin),
      (s, d) => TextOps.rarefactionCurve(documents(s, d), "text",
        RareFracs)),

    // Atkinson/GE inequality of per-customer spend within each market
    // segment: the welfare-weighted inequality family next to q354's
    // Theil readout, all pow-free closed forms.
    Q("q455_atkinson_ge",
      Some("""WITH cust AS MATERIALIZED (
             |  SELECT c_mktsegment AS seg, o_custkey,
             |    sum(round(o_totalprice * 100))::BIGINT AS y
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1, 2),
             |pos AS (SELECT seg, y FROM cust WHERE y > 0),
             |g AS (SELECT seg, count(*)::BIGINT AS n,
             |  sum(y::HUGEINT) AS total FROM pos GROUP BY 1),
             |a AS (SELECT p.seg, first(n) AS n,
             |  sum(round(sqrt(y::DOUBLE
             |    / (total::DOUBLE / n::DOUBLE)), 12)
             |    ::DECIMAL(28,12))::DOUBLE AS sq,
             |  sum(round(ln(y::DOUBLE
             |    / (total::DOUBLE / n::DOUBLE)), 12)
             |    ::DECIMAL(28,12))::DOUBLE AS l,
             |  sum(round(1.0 / (y::DOUBLE
             |    / (total::DOUBLE / n::DOUBLE)), 12)
             |    ::DECIMAL(28,12))::DOUBLE AS inv,
             |  sum(round((y::DOUBLE / (total::DOUBLE / n::DOUBLE))
             |    * (y::DOUBLE / (total::DOUBLE / n::DOUBLE)), 12)
             |    ::DECIMAL(28,12))::DOUBLE AS r2
             |  FROM pos p JOIN g USING (seg) GROUP BY 1)
             |SELECT seg, n,
             |  round(1.0 - (sq / n::DOUBLE) * (sq / n::DOUBLE), 6)
             |    AS atkinson05_r,
             |  round(1.0 - exp(l / n::DOUBLE), 6) AS atkinson1_r,
             |  round(1.0 - n::DOUBLE / inv, 6) AS atkinson2_r,
             |  round((r2 / n::DOUBLE - 1.0) / 2.0, 6) AS ge2_r
             |FROM a
             |ORDER BY seg""".stripMargin),
      (s, d) => Profile.atkinsonGe(
        orders(s, d).join(customer(s, d),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment").as("seg"), col("o_custkey"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long"))
            .as("y")),
        "seg", "y")),

    // Grid-density clustering of the embedding plane (e1, e2):
    // DBSCAN's scalable shape — dense cells + 8-adjacency components.
    Q("q456_grid_density", {
        val offsSql = Seq((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
          (1, -1), (1, 0), (1, 1))
          .map { case (a, b) => s"($a, $b)" }.mkString(", ")
        Some(s"""WITH cells AS MATERIALIZED (
               |  SELECT floor(embedding[1]::DOUBLE / $GridH)::BIGINT
               |      AS cx,
               |    floor(embedding[2]::DOUBLE / $GridH)::BIGINT AS cy,
               |    count(*)::BIGINT AS n
               |  FROM embeddings GROUP BY 1, 2),
               |dense AS MATERIALIZED (
               |  SELECT cx, cy, n,
               |    (cx + 500) * 100000 + (cy + 500) AS cell
               |  FROM cells WHERE n >= $GridMinPts),
               |edges AS (SELECT a.cell AS s, b.cell AS t
               |  FROM dense a
               |  CROSS JOIN (VALUES $offsSql) o(dx, dy)
               |  JOIN dense b ON b.cx = a.cx + o.dx
               |    AND b.cy = a.cy + o.dy),
               |rec AS (
               |  SELECT cell AS v, cell AS lab FROM dense
               |  UNION
               |  SELECT e.t AS v, r.lab
               |  FROM rec r JOIN edges e ON e.s = r.v),
               |comp AS (SELECT v AS cell, min(lab) AS lab FROM rec
               |  GROUP BY 1)
               |SELECT lab AS cluster_label, count(*)::BIGINT AS n_cells,
               |  sum(n)::BIGINT AS n_points
               |FROM dense JOIN comp USING (cell)
               |GROUP BY 1
               |ORDER BY 1""".stripMargin
          .replaceFirst("WITH ", "WITH RECURSIVE "))
      },
      (s, d) => Cluster.gridDensityClusters(
        embeddings(s, d).select(
          element_at(col("embedding"), 1).as("x"),
          element_at(col("embedding"), 2).as("y")),
        "x", "y", GridH, GridMinPts)),

    // Calinski-Harabasz validity of the generator's own labels on the
    // (e1, e2) plane: between/within variance ratio — the third
    // cluster-quality lens next to silhouette (q308) and
    // Davies-Bouldin (q309).
    Q("q457_calinski_harabasz",
      Some("""WITH g AS MATERIALIZED (
             |  SELECT label AS l, embedding[1]::DOUBLE AS x,
             |    embedding[2]::DOUBLE AS y
             |  FROM embeddings),
             |per AS MATERIALIZED (
             |  SELECT l, count(*)::BIGINT AS n,
             |    sum(round(x, 12)::DECIMAL(28,12))::DOUBLE AS sx,
             |    sum(round(y, 12)::DECIMAL(28,12))::DOUBLE AS sy,
             |    sum(round(x * x, 12)::DECIMAL(28,12))::DOUBLE AS sxx,
             |    sum(round(y * y, 12)::DECIMAL(28,12))::DOUBLE AS syy
             |  FROM g GROUP BY 1),
             |tot AS (SELECT sum(n)::DOUBLE AS nn,
             |  count(*)::DOUBLE AS k,
             |  sum(round(sx, 12)::DECIMAL(28,12))::DOUBLE AS tx,
             |  sum(round(sy, 12)::DECIMAL(28,12))::DOUBLE AS ty
             |  FROM per),
             |w AS (SELECT sum(round(
             |    (sxx - sx * sx / n::DOUBLE)
             |    + (syy - sy * sy / n::DOUBLE), 12)
             |    ::DECIMAL(28,12))::DOUBLE AS w FROM per),
             |b AS (SELECT sum(round(n::DOUBLE
             |    * ((sx / n::DOUBLE - tx / nn)
             |      * (sx / n::DOUBLE - tx / nn)
             |    + (sy / n::DOUBLE - ty / nn)
             |      * (sy / n::DOUBLE - ty / nn)), 12)
             |    ::DECIMAL(28,12))::DOUBLE AS b,
             |  first(nn) AS nn, first(k) AS k
             |  FROM per, tot)
             |SELECT nn::BIGINT AS n, k::BIGINT AS k_clusters,
             |  round(w, 6) AS w_r, round(b, 6) AS b_r,
             |  round((b / nullif(k - 1.0, 0.0))
             |    / nullif(w / nullif(nn - k, 0.0), 0.0), 6) AS ch_r
             |FROM b, w""".stripMargin),
      (s, d) => Cluster.calinskiHarabasz(
        embeddings(s, d).select(col("label"),
          element_at(col("embedding"), 1).as("x"),
          element_at(col("embedding"), 2).as("y")),
        "label", "x", "y")))
}
