package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Fit, Similarity}
import graft.util.Tables._

/** Model-prep batch: decision-stump split scan (univariate feature
  * screening), closed-form two-regressor OLS, and the label-centroid
  * cosine matrix over embeddings ([[graft.ops.Fit]],
  * [[graft.ops.Similarity.labelCentroidCosine]]).
  */
object FitQueries {

  // the shared Gini impurity expression g(pos, n), mirrored between the
  // engine and the oracle SQL in ONE parenthesization
  private def gSql(pos: String, n: String): String =
    s"1.0 - ($pos::DOUBLE / $n) * ($pos::DOUBLE / $n) " +
      s"- (($n - $pos)::DOUBLE / $n) * (($n - $pos)::DOUBLE / $n)"

  val all: Seq[Q] = Seq(

    // Best Gini split over two integer features (quantity; discount in
    // percent) for the label "is a returned line". Long-format input,
    // value-grain cumulative scan, argmax gain with smallest-threshold
    // tiebreak.
    Q("q234_stump_split",
      Some(s"""WITH obs AS (
              |  SELECT 'l_quantity' AS feature,
              |    CAST(l_quantity AS BIGINT) AS v,
              |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
              |  FROM lineitem
              |  UNION ALL
              |  SELECT 'l_discount_pct',
              |    CAST(round(l_discount * 100) AS BIGINT),
              |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
              |  FROM lineitem),
              |grain AS (
              |  SELECT feature, v, count(*)::BIGINT AS n_v,
              |    sum(y)::BIGINT AS p_v
              |  FROM obs GROUP BY 1, 2),
              |scan AS (
              |  SELECT feature, v,
              |    sum(n_v) OVER (PARTITION BY feature ORDER BY v)
              |      ::BIGINT AS n_l,
              |    sum(p_v) OVER (PARTITION BY feature ORDER BY v)
              |      ::BIGINT AS p_l,
              |    sum(n_v) OVER (PARTITION BY feature)::BIGINT AS n,
              |    sum(p_v) OVER (PARTITION BY feature)::BIGINT AS p
              |  FROM grain),
              |sc AS (
              |  SELECT feature, v, n_l, n - n_l AS n_r,
              |    ${gSql("p", "n")} AS g0,
              |    (n_l * (${gSql("p_l", "n_l")})
              |     + (n - n_l) * (${gSql("(p - p_l)", "(n - n_l)")}))
              |      / n AS gs
              |  FROM scan WHERE n_l < n),
              |best AS (
              |  SELECT feature, v, n_l, n_r, g0, gs,
              |    row_number() OVER (PARTITION BY feature
              |      ORDER BY g0 - gs DESC, v) AS rk
              |  FROM sc)
              |SELECT feature, v AS split_value, n_l AS n_left,
              |  n_r AS n_right, round(g0, 6) AS gini_root_r,
              |  round(gs, 6) AS gini_split_r, round(g0 - gs, 6) AS gain_r
              |FROM best WHERE rk = 1 ORDER BY feature""".stripMargin),
      (s, d) => {
        val li = lineitem(s, d)
        val y = when(col("l_returnflag") === "R", 1L).otherwise(0L)
        val obs = li.select(lit("l_quantity").as("feature"),
            col("l_quantity").cast("long").as("v"), y.as("y"))
          .unionAll(li.select(lit("l_discount_pct").as("feature"),
            round(col("l_discount") * 100).cast("long").as("v"),
            y.as("y")))
        Fit.giniStump(obs, "feature", "v", "y").orderBy("feature")
      }),

    // Closed-form OLS per return flag: price-in-cents explained by
    // quantity and discount-percent. Ten exact DECIMAL moments in one
    // hash-agg, 3×3 Cramer + R² in one shared double parenthesization.
    Q("q235_ols2",
      Some("""WITH v AS (
             |  SELECT l_returnflag,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
             |    CAST(l_quantity AS BIGINT) AS x1,
             |    CAST(round(l_discount * 100) AS BIGINT) AS x2
             |  FROM lineitem),
             |a AS (
             |  SELECT l_returnflag, count(*)::BIGINT AS n,
             |    sum(x1)::DOUBLE AS s1, sum(x2)::DOUBLE AS s2,
             |    sum(y)::DOUBLE AS sy,
             |    sum(x1 * x1)::DOUBLE AS s11,
             |    sum(x2 * x2)::DOUBLE AS s22,
             |    sum(x1 * x2)::DOUBLE AS s12,
             |    sum(x1 * y)::DOUBLE AS s1y,
             |    sum(x2 * y)::DOUBLE AS s2y,
             |    sum(y::HUGEINT * y)::DOUBLE AS syy
             |  FROM v GROUP BY 1),
             |f AS (
             |  SELECT l_returnflag, n, s1, s2, sy, s11, s22, s12, s1y,
             |    s2y, syy,
             |    n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
             |      + s2 * (s1 * s12 - s11 * s2) AS det
             |  FROM a),
             |b AS (
             |  SELECT l_returnflag, n, det, sy, s1y, s2y, syy,
             |    sy * sy / n AS sstm,
             |    (sy * (s11 * s22 - s12 * s12)
             |     - s1 * (s1y * s22 - s12 * s2y)
             |     + s2 * (s1y * s12 - s11 * s2y)) / det AS b0,
             |    (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
             |     + s2 * (s1 * s2y - s1y * s2)) / det AS b1,
             |    (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
             |     + sy * (s1 * s12 - s11 * s2)) / det AS b2
             |  FROM f)
             |SELECT l_returnflag, n,
             |  CASE WHEN n >= 3 AND abs(det) > 1e-9
             |    THEN round(b0, 6) END AS b0_r,
             |  CASE WHEN n >= 3 AND abs(det) > 1e-9
             |    THEN round(b1, 6) END AS b1_r,
             |  CASE WHEN n >= 3 AND abs(det) > 1e-9
             |    THEN round(b2, 6) END AS b2_r,
             |  CASE WHEN n >= 3 AND abs(det) > 1e-9
             |      AND syy - sy * sy / n > 0
             |    THEN round(1.0 - (syy - b0 * sy - b1 * s1y - b2 * s2y)
             |      / (syy - sy * sy / n), 6) END AS r2_r
             |FROM b ORDER BY l_returnflag""".stripMargin),
      (s, d) => Fit.ols2(
          lineitem(s, d).select(col("l_returnflag"),
            round(col("l_extendedprice") * 100).cast("long").as("_y"),
            col("l_quantity").cast("long").as("_x1"),
            round(col("l_discount") * 100).cast("long").as("_x2")),
          "l_returnflag", "_y", "_x1", "_x2")
        .orderBy("l_returnflag")),

    // Mislabel screening: each vector's cosine to its OWN label
    // centroid, standardized within the label (z < −2 flags). All
    // reductions are scaled-INTEGER sums — a DECIMAL→double cast is
    // double-rounded differently across engines and flipped one
    // structural 9-dp boundary at sf0.1; int64→double is one correctly
    // rounded conversion on both.
    Q("q273_label_outliers",
      Some("""WITH dims AS (SELECT range::INT AS dim FROM range(1, 65)),
             |g AS (
             |  SELECT vec_id, label, dim,
             |    CAST(round(embedding[dim]::DOUBLE * 1000000.0)
             |      AS BIGINT) AS v6
             |  FROM embeddings, dims),
             |cent AS (
             |  SELECT label, dim,
             |    round(sum(v6)::DOUBLE / count(*) / 1000000.0, 9) AS c
             |  FROM g GROUP BY 1, 2),
             |pv AS (
             |  SELECT g.vec_id, g.label,
             |    sum(CAST(round(g.v6::DOUBLE / 1000000.0 * c.c
             |      * 1000000000000.0) AS BIGINT))::BIGINT AS dot,
             |    sum(CAST(round((g.v6::DOUBLE / 1000000.0)
             |        * (g.v6::DOUBLE / 1000000.0)
             |      * 1000000000000.0) AS BIGINT))::BIGINT AS nv,
             |    sum(CAST(round(c.c * c.c * 1000000000000.0)
             |      AS BIGINT))::BIGINT AS nc
             |  FROM g JOIN cent c USING (label, dim) GROUP BY 1, 2),
             |cosv AS (
             |  SELECT vec_id, label,
             |    CASE WHEN nv > 0 AND nc > 0
             |      THEN round(dot::DOUBLE
             |        / (sqrt(nv::DOUBLE) * sqrt(nc::DOUBLE)), 9)
             |    END AS cos_r
             |  FROM pv),
             |mom AS (
             |  SELECT label, count(*)::BIGINT AS m,
             |    sum(CAST(round(cos_r * 1000000000.0) AS BIGINT))
             |      ::BIGINT AS sm,
             |    sum(CAST(round(cos_r * cos_r * 1000000000000.0)
             |      AS BIGINT))::BIGINT AS sq
             |  FROM cosv WHERE cos_r IS NOT NULL GROUP BY 1),
             |zs AS (
             |  SELECT c.vec_id, c.label, c.cos_r, mom.m,
             |    (c.cos_r - sm::DOUBLE / 1000000000.0 / m)
             |      / sqrt((sq::DOUBLE / 1000000000000.0
             |        - sm::DOUBLE / 1000000000.0
             |          * (sm::DOUBLE / 1000000000.0) / m) / (m - 1))
             |      AS z
             |  FROM cosv c JOIN mom USING (label))
             |SELECT vec_id, label, cos_r,
             |  CASE WHEN m >= 2 THEN round(z, 6) END AS z_r,
             |  coalesce(CASE WHEN m >= 2 THEN z END < -2.0, false)
             |    AS is_outlier
             |FROM zs ORDER BY vec_id""".stripMargin),
      (s, d) => Similarity.labelOutliers(embeddings(s, d), "vec_id",
          "label", "embedding", zCut = -2.0)
        .orderBy("vec_id")),

    // Label-centroid cosine matrix over the 64-dim embeddings: exact
    // integer-grid centroid sums, 12-dp DECIMAL dot/norm reductions
    // (order-independent), 45 pair rows out of 500 vectors.
    Q("q236_centroid_cosine",
      Some("""WITH dims AS (SELECT range::INT AS dim FROM range(1, 65)),
             |e AS (
             |  SELECT label AS g, dim,
             |    CAST(round(embedding[dim]::DOUBLE * 1000000.0)
             |      AS BIGINT) AS v6
             |  FROM embeddings, dims),
             |grain AS (
             |  SELECT g, dim, count(*)::BIGINT AS n, sum(v6)::BIGINT AS s6
             |  FROM e GROUP BY 1, 2),
             |c AS (
             |  SELECT g, dim,
             |    round(s6::DOUBLE / n / 1000000.0, 9) AS c
             |  FROM grain),
             |norms AS (
             |  SELECT g,
             |    sum(CAST(round(c * c * 1000000000000.0) AS BIGINT))
             |      ::BIGINT AS nn
             |  FROM c GROUP BY 1),
             |dots AS (
             |  SELECT a.g AS group_a, b.g AS group_b,
             |    sum(CAST(round(a.c * b.c * 1000000000000.0) AS BIGINT))
             |      ::BIGINT AS dot
             |  FROM c a JOIN c b ON a.dim = b.dim AND a.g < b.g
             |  GROUP BY 1, 2)
             |SELECT d.group_a, d.group_b,
             |  CASE WHEN na.nn > 0 AND nb.nn > 0
             |    THEN round(d.dot::DOUBLE
             |      / (sqrt(na.nn::DOUBLE) * sqrt(nb.nn::DOUBLE)), 6)
             |  END AS cos_r
             |FROM dots d
             |JOIN norms na ON na.g = d.group_a
             |JOIN norms nb ON nb.g = d.group_b
             |ORDER BY d.group_a, d.group_b""".stripMargin),
      (s, d) => Similarity.labelCentroidCosine(embeddings(s, d),
          "label", "embedding")
        .orderBy("group_a", "group_b")))
}
