package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Cluster, Influence}
import graft.util.Tables._

/** Round-12 clustering-tendency batch: the full Lloyd k-means loop
  * (per-iteration inertia), the elbow curve over nested seed prefixes,
  * the adjusted Rand index between the density clustering and the
  * generator's labels, the Hopkins clustering-tendency statistic, and
  * the learning-curve prefix refits — "should we cluster, how many,
  * did it match the truth, and does more data still help".
  */
object TendencyQueries {

  private val LloydK = 4
  private val LloydIters = 3
  private val ElbowKMax = 6
  private val HopkinsM = 25
  private val GridH = 0.05
  private val GridMinPts = 5L
  private val CurveFracs = Seq(0.25, 0.5, 0.75, 1.0)

  private def hash60Sql(e: String) =
    s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  private val embGSql =
    """WITH g AS MATERIALIZED (
      |  SELECT vec_id AS id, embedding[1]::DOUBLE AS x,
      |    embedding[2]::DOUBLE AS y
      |  FROM embeddings)""".stripMargin

  /** Seeds CTE: the `k` smallest-md5 points ranked 1..k by a tiny
    * self-join (mirrors the op exactly, no window). */
  private def seedsSql(k: Int): String =
    s"""sd AS MATERIALIZED (
       |  SELECT id, x, y, ${hash60Sql("id::VARCHAR")} AS h
       |  FROM g ORDER BY h, id LIMIT $k),
       |rk AS (SELECT a.id AS sid, a.x AS sx, a.y AS sy,
       |  (count(b.id) + 1)::INT AS rk
       |  FROM sd a LEFT JOIN sd b
       |    ON a.h > b.h OR (a.h = b.h AND a.id > b.id)
       |  GROUP BY 1, 2, 3)""".stripMargin

  private def pivotSql(name: String, src: String, k: Int): String = {
    val cols = (1 to k).flatMap(i => Seq(
      s"max(CASE WHEN rk = $i THEN round(sx, 12) END) AS cx$i",
      s"max(CASE WHEN rk = $i THEN round(sy, 12) END) AS cy$i"))
    s"$name AS (SELECT ${cols.mkString(",\n  ")} FROM $src)"
  }

  private def distSql(i: Int) =
    s"(x - cx$i) * (x - cx$i) + (y - cy$i) * (y - cy$i)"

  private def argminSql(k: Int): String = {
    val whens = (1 until k).map { i =>
      val conds = (i + 1 to k).map(j => s"${distSql(i)} <= ${distSql(j)}")
        .mkString(" AND ")
      s"WHEN $conds THEN $i"
    }
    s"CASE ${whens.mkString(" ")} ELSE $k END"
  }

  private def leastSql(k: Int): String =
    s"least(${(1 to k).map(distSql).mkString(", ")})"

  /** One Lloyd iteration in SQL: assign against c{i−1}, aggregate
    * per-cluster stats, emit the iteration row, rebuild centroids with
    * the empty-cluster coalesce guard. */
  private def lloydIterSql(i: Int, k: Int): String = {
    val sizes = (1 to k).map(j =>
      s"sum(CASE WHEN a = $j THEN n ELSE 0 END)::BIGINT AS n$j")
      .mkString(",\n    ")
    val coals = (1 to k).flatMap(j => Seq(
      s"coalesce(f.cx$j, p.cx$j) AS cx$j",
      s"coalesce(f.cy$j, p.cy$j) AS cy$j")).mkString(",\n    ")
    s"""a$i AS (SELECT x, y, ${argminSql(k)} AS a,
       |  ${leastSql(k)} AS d
       |  FROM g, c${i - 1}),
       |s$i AS MATERIALIZED (
       |  SELECT a, count(*)::BIGINT AS n,
       |    sum(round(x, 12)::DECIMAL(28,12))::DOUBLE AS zx,
       |    sum(round(y, 12)::DECIMAL(28,12))::DOUBLE AS zy,
       |    sum(round(d, 12)::DECIMAL(28,12))::DOUBLE AS inr
       |  FROM a$i GROUP BY 1),
       |r$i AS (SELECT $i AS iter,
       |    round(sum(round(inr, 12)::DECIMAL(28,12))::DOUBLE, 6)
       |      AS inertia_r,
       |    $sizes
       |  FROM s$i),
       |f$i AS (SELECT ${(1 to k).flatMap(j => Seq(
             s"max(CASE WHEN a = $j THEN round(zx / n::DOUBLE, 12) END) AS cx$j",
             s"max(CASE WHEN a = $j THEN round(zy / n::DOUBLE, 12) END) AS cy$j"))
           .mkString(",\n    ")}
       |  FROM s$i),
       |c$i AS (SELECT $coals FROM f$i f, c${i - 1} p)""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // Full Lloyd k-means (k = 4, 3 iterations, md5 seeds) on the
    // embedding plane: the inertia trajectory — per-iteration descent
    // is the convergence-budget readout next to q437's PageRank L1.
    Q("q458_lloyd_kmeans", {
        val iters = (1 to LloydIters).map(lloydIterSql(_, LloydK))
          .mkString(",\n")
        val union = (1 to LloydIters).map(i => s"SELECT * FROM r$i")
          .mkString("\n  UNION ALL ")
        Some(s"""$embGSql,
                |${seedsSql(LloydK)},
                |${pivotSql("c0", "rk", LloydK)},
                |$iters
                |SELECT * FROM ($union)
                |ORDER BY iter""".stripMargin)
      },
      (s, d) => Cluster.lloyd2d(
        embeddings(s, d).select(col("vec_id"),
          element_at(col("embedding"), 1).as("x"),
          element_at(col("embedding"), 2).as("y")),
        "vec_id", "x", "y", LloydK, LloydIters)),

    // Elbow curve k = 2..6 over NESTED md5-seed prefixes: the whole
    // curve costs ONE data pass (5 conditional least() sums against
    // one broadcast centroid row).
    Q("q460_elbow_curve", {
        val ins = (2 to ElbowKMax).map(kk =>
          s"sum(round(least(${(1 to kk).map(distSql).mkString(", ")}),"
            + s" 12)::DECIMAL(28,12))::DOUBLE AS in$kk")
          .mkString(",\n    ")
        val cases = (2 to ElbowKMax).map(kk =>
          s"WHEN $kk THEN in$kk").mkString(" ")
        Some(s"""$embGSql,
                |${seedsSql(ElbowKMax)},
                |${pivotSql("cent", "rk", ElbowKMax)},
                |agg AS (SELECT
                |    $ins
                |  FROM g, cent),
                |l(k) AS (VALUES ${(2 to ElbowKMax).map(kk => s"($kk)")
                  .mkString(", ")})
                |SELECT k, round(CASE k $cases END, 6) AS inertia_r
                |FROM l, agg
                |ORDER BY k""".stripMargin)
      },
      (s, d) => Cluster.elbowCurve(
        embeddings(s, d).select(col("vec_id"),
          element_at(col("embedding"), 1).as("x"),
          element_at(col("embedding"), 2).as("y")),
        "vec_id", "x", "y", ElbowKMax)),

    // Adjusted Rand index between the q456 grid-density clustering
    // and the generator's own labels: did unsupervised density
    // recover the truth (points in sparse cells are unclustered and
    // excluded, per DBSCAN noise semantics)?
    Q("q459_ari_density_labels", {
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
               |  GROUP BY 1),
               |pt AS (SELECT
               |    floor(embedding[1]::DOUBLE / $GridH)::BIGINT AS cx,
               |    floor(embedding[2]::DOUBLE / $GridH)::BIGINT AS cy,
               |    label FROM embeddings),
               |asg AS (SELECT c.lab AS a, p.label AS b
               |  FROM pt p JOIN dense d USING (cx, cy)
               |  JOIN comp c ON c.cell = d.cell),
               |cell2 AS MATERIALIZED (
               |  SELECT a, b, count(*)::BIGINT AS n FROM asg
               |  GROUP BY 1, 2),
               |sij AS (SELECT
               |  sum(n::HUGEINT * (n - 1) / 2)::DOUBLE AS sij,
               |  sum(n)::BIGINT AS nn FROM cell2),
               |sa AS (SELECT sum(na::HUGEINT * (na - 1) / 2)::DOUBLE
               |    AS sa
               |  FROM (SELECT a, sum(n)::BIGINT AS na FROM cell2
               |    GROUP BY 1) t),
               |sb AS (SELECT sum(nb::HUGEINT * (nb - 1) / 2)::DOUBLE
               |    AS sb
               |  FROM (SELECT b, sum(n)::BIGINT AS nb FROM cell2
               |    GROUP BY 1) t)
               |SELECT nn AS n,
               |  round((sij - sa * sb / (nn::DOUBLE
               |      * (nn::DOUBLE - 1.0) / 2.0))
               |    / nullif((sa + sb) / 2.0 - sa * sb / (nn::DOUBLE
               |      * (nn::DOUBLE - 1.0) / 2.0), 0.0), 6) AS ari_r
               |FROM sij, sa, sb""".stripMargin
          .replaceFirst("WITH ", "WITH RECURSIVE "))
      },
      (s, d) => {
        val cellsWithLab = Cluster.gridDensityCells(
          embeddings(s, d).select(
            element_at(col("embedding"), 1).as("x"),
            element_at(col("embedding"), 2).as("y")),
          "x", "y", GridH, GridMinPts)
        val pt = embeddings(s, d).select(
          floor(element_at(col("embedding"), 1).cast("double")
            / GridH).cast("long").as("_cx"),
          floor(element_at(col("embedding"), 2).cast("double")
            / GridH).cast("long").as("_cy"),
          col("label"))
        val asg = pt.join(cellsWithLab, Seq("_cx", "_cy"))
          .select(col("_lab").as("a"), col("label").as("b"))
        Cluster.adjustedRand(asg, "a", "b")
      }),

    // Hopkins clustering-tendency statistic on the embedding plane:
    // H near 0.5 = uniform (don't bother clustering), near 1 =
    // genuinely clumped. 25 md5 probes vs 25 md5-uniform synthetics.
    Q("q461_hopkins",
      Some(s"""$embGSql,
              |box AS (SELECT min(x) AS x0, max(x) AS x1,
              |  min(y) AS y0, max(y) AS y1 FROM g),
              |pr AS MATERIALIZED (
              |  SELECT id AS pid, x AS px, y AS py FROM g
              |  ORDER BY ${hash60Sql("id::VARCHAR")}, id
              |  LIMIT $HopkinsM),
              |ids AS (SELECT unnest(generate_series(1, $HopkinsM))
              |  ::BIGINT AS pid),
              |sy AS MATERIALIZED (
              |  SELECT pid,
              |    x0 + (${hash60Sql("'hx' || pid::VARCHAR")}::DOUBLE
              |      / ${math.pow(2.0, 60)}) * (x1 - x0) AS px,
              |    y0 + (${hash60Sql("'hy' || pid::VARCHAR")}::DOUBLE
              |      / ${math.pow(2.0, 60)}) * (y1 - y0) AS py
              |  FROM ids, box),
              |wnn AS (SELECT pr.pid, min(sqrt(
              |    (g.x - pr.px) * (g.x - pr.px)
              |    + (g.y - pr.py) * (g.y - pr.py))) AS d
              |  FROM pr, g WHERE g.id != pr.pid GROUP BY 1),
              |unn AS (SELECT sy.pid, min(sqrt(
              |    (g.x - sy.px) * (g.x - sy.px)
              |    + (g.y - sy.py) * (g.y - sy.py))) AS d
              |  FROM sy, g GROUP BY 1),
              |w AS (SELECT sum(round(d, 12)::DECIMAL(28,12))::DOUBLE
              |  AS w FROM wnn),
              |u AS (SELECT sum(round(d, 12)::DECIMAL(28,12))::DOUBLE
              |  AS u FROM unn)
              |SELECT $HopkinsM::BIGINT AS m,
              |  round(u / nullif(u + w, 0.0), 6) AS h_r
              |FROM w, u""".stripMargin),
      (s, d) => Cluster.hopkins(
        embeddings(s, d).select(col("vec_id"),
          element_at(col("embedding"), 1).as("x"),
          element_at(col("embedding"), 2).as("y")),
        "vec_id", "x", "y", HopkinsM)),

    // Learning-curve prefixes: the daily-revenue OLS refit on the
    // first 25/50/75/100% of the calendar — a flattening R² gain says
    // more history no longer buys fit (the data-value readout).
    Q("q462_prefix_curve",
      Some(s"""WITH daily AS MATERIALIZED (
              |  SELECT o_orderdate AS day,
              |    sum(round(o_totalprice * 100))::BIGINT AS y
              |  FROM orders GROUP BY 1),
              |mn AS (SELECT min(day) AS d0 FROM daily),
              |g AS MATERIALIZED (
              |  SELECT datediff('day', d0, day)::BIGINT AS t, y
              |  FROM daily, mn),
              |mx AS (SELECT max(t)::BIGINT AS mx FROM g),
              |f(frac) AS (VALUES ${CurveFracs
                .map(f => s"(${f}::DOUBLE)").mkString(", ")}),
              |m AS (SELECT frac, count(*)::DOUBLE AS n,
              |    sum(t::HUGEINT)::DOUBLE AS sx,
              |    sum(y::HUGEINT)::DOUBLE AS sy,
              |    sum(t::HUGEINT * t)::DOUBLE AS sxx,
              |    sum(t::HUGEINT * y)::DOUBLE AS sxy,
              |    sum(y::HUGEINT * y)::DOUBLE AS syy
              |  FROM g, f, mx
              |  WHERE t <= floor(mx::DOUBLE * frac)::BIGINT
              |  GROUP BY 1)
              |SELECT frac, n::BIGINT AS n_rows,
              |  round((sxy - sx * sy / n)
              |    / nullif(sxx - sx * sx / n, 0.0), 6) AS slope_r,
              |  round((sxy - sx * sy / n)
              |    / nullif(sxx - sx * sx / n, 0.0)
              |    * (sxy - sx * sy / n)
              |    / nullif(syy - sy * sy / n, 0.0), 6) AS r2_r
              |FROM m
              |ORDER BY frac""".stripMargin),
      (s, d) => {
        val daily = orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long"))
            .as("y"))
        val d0 = daily.agg(min(col("day")).as("_d0"))
        val g = daily.crossJoin(broadcast(d0))
          .select(datediff(col("day"), col("_d0")).cast("long")
            .as("t"), col("y"))
        Influence.olsPrefixCurve(g, "t", "y", CurveFracs)
      }))
}
