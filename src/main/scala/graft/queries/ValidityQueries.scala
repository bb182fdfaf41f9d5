package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Profile, Similarity}
import graft.util.Tables._

/** Round-9 validity batch — "is the clustering any good, is the schema
  * sound": simplified silhouette and Davies–Bouldin over the q33/q69
  * cosine cells ([[graft.ops.Similarity]]), plus inclusion-dependency
  * (FK-candidate) discovery and the candidate-key/uniqueness profile
  * over the star schema ([[graft.ops.Profile]]). The centroid seed set
  * is the q33 convention (`vec_id % 50 = 0`); assignment ordering
  * reuses the q282-proven (sim DESC, cid) total order.
  */
object ValidityQueries {

  private val CentSql =
    """cent AS (
      |  SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
      |  FROM embeddings WHERE vec_id % 50 = 0)""".stripMargin

  private val RankedSql =
    """r AS (
      |  SELECT e.vec_id, c.cid,
      |    list_cosine_similarity(e.embedding::DOUBLE[], c.ce) AS csim,
      |    row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[],
      |        c.ce) DESC, c.cid) AS crn
      |  FROM embeddings e, cent c
      |  WHERE list_cosine_similarity(e.embedding::DOUBLE[], c.ce)
      |    IS NOT NULL)""".stripMargin

  /** One inclusion-dependency probe as oracle SQL (mirrors
    * Profile.inclusion: distinct non-null child values left-joined to
    * distinct parent values). */
  private def incSql(childTbl: String, childCol: String,
      parentTbl: String, parentCol: String): String =
    s"""SELECT '$childTbl.$childCol' AS child_col,
       |  '$parentTbl.$parentCol' AS parent_col,
       |  count(*)::BIGINT AS n_child_distinct,
       |  coalesce(sum(hit), 0)::BIGINT AS n_matched,
       |  CASE WHEN count(*) > 0 THEN
       |    round(coalesce(sum(hit), 0)::DOUBLE / count(*)::DOUBLE, 6)
       |    END AS containment_r,
       |  (count(*) > 0 AND coalesce(sum(hit), 0) = count(*))
       |    AS is_candidate
       |FROM (
       |  SELECT cd.v, CASE WHEN pd.v IS NOT NULL THEN 1 END AS hit
       |  FROM (SELECT DISTINCT $childCol::VARCHAR AS v FROM $childTbl
       |        WHERE $childCol IS NOT NULL) cd
       |  LEFT JOIN (SELECT DISTINCT $parentCol::VARCHAR AS v
       |             FROM $parentTbl
       |             WHERE $parentCol IS NOT NULL) pd USING (v))"""
      .stripMargin

  /** One column's uniqueness-profile row as oracle SQL (mirrors
    * Profile.keyProfile). */
  private def keySql(tbl: String, c: String): String =
    s"""SELECT '$c' AS col_name, count(*)::BIGINT AS n_rows,
       |  count(DISTINCT $c)::BIGINT AS n_distinct,
       |  sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
       |  CASE WHEN count(*) > 0 THEN
       |    round(count(DISTINCT $c)::DOUBLE / count(*)::DOUBLE, 6)
       |    END AS uniq_r,
       |  (count(*) > 0 AND count(DISTINCT $c) = count(*)
       |    AND sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) = 0)
       |    AS candidate_key
       |FROM $tbl""".stripMargin

  private val IncPairs = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("events", "user_id", "customer", "c_custkey"))

  private val OrdersCols = Seq("o_orderkey", "o_custkey",
    "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")

  val all: Seq[Q] = Seq(

    // Simplified silhouette per cosine cell: (s1−s2)/(1−s2) from the
    // nearest and runner-up centroid sims — O(n·k) cluster quality for
    // the q115 semantic-dedup cells; 12-dp DECIMAL term sums.
    Q("q308_silhouette",
      Some(s"""WITH $CentSql,
              |$RankedSql,
              |t AS (
              |  SELECT vec_id,
              |    max(CASE WHEN crn = 1 THEN cid END) AS cid,
              |    max(CASE WHEN crn = 1 THEN csim END) AS s1,
              |    max(CASE WHEN crn = 2 THEN csim END) AS s2
              |  FROM r WHERE crn <= 2 GROUP BY 1),
              |s AS (
              |  SELECT cid, CASE WHEN 1.0 - s2 > 0 THEN
              |    (s1 - s2) / (1.0 - s2) END AS sil
              |  FROM t WHERE s2 IS NOT NULL)
              |SELECT cid, count(*)::BIGINT AS n,
              |  round(sum(round(sil, 12)::DECIMAL(28,12))::DOUBLE
              |    / count(sil), 6) AS mean_sil_r
              |FROM s GROUP BY 1 ORDER BY cid""".stripMargin),
      (s, d) => {
        val emb = embeddings(s, d)
        Similarity.simplifiedSilhouette(emb,
            emb.filter(col("vec_id") % 50 === 0))
          .orderBy("cid")
      }),

    // Davies–Bouldin profile: per-cell scatter, worst (Si+Sj)/Mij
    // ratio, and the global DB index — the separation counterpart to
    // q308's cohesion view, on the same cells.
    Q("q309_davies_bouldin",
      Some(s"""WITH $CentSql,
              |$RankedSql,
              |scat AS (
              |  SELECT cid, count(*)::BIGINT AS n,
              |    sum(round(1.0 - csim, 12)::DECIMAL(28,12))::DOUBLE
              |      / count(*) AS s
              |  FROM r WHERE crn = 1 GROUP BY 1),
              |sep AS (
              |  SELECT a.cid AS ci, b.cid AS cj,
              |    1.0 - list_cosine_similarity(a.ce, b.ce) AS m
              |  FROM cent a, cent b
              |  WHERE a.cid <> b.cid
              |    AND list_cosine_similarity(a.ce, b.ce) IS NOT NULL),
              |rmax AS (
              |  SELECT ci AS cid,
              |    CASE WHEN sum(CASE WHEN m <= 0 THEN 1 ELSE 0 END)
              |      = 0 THEN max((si.s + sj.s) / m) END AS rmax
              |  FROM sep JOIN scat si ON si.cid = sep.ci
              |  JOIN scat sj ON sj.cid = sep.cj
              |  GROUP BY 1),
              |j AS (SELECT scat.cid, n, s, rmax
              |      FROM scat LEFT JOIN rmax USING (cid)),
              |db AS (
              |  SELECT sum(round(rmax, 12)::DECIMAL(28,12))::DOUBLE
              |    / count(*) AS db,
              |    sum(CASE WHEN rmax IS NULL THEN 1 ELSE 0 END)
              |      AS nbad FROM j)
              |SELECT cid, n, round(s, 6) AS scatter_r,
              |  round(rmax, 6) AS r_max_r,
              |  round(CASE WHEN nbad = 0 THEN db END, 6) AS db_r
              |FROM j, db ORDER BY cid""".stripMargin),
      (s, d) => {
        val emb = embeddings(s, d)
        Similarity.daviesBouldin(emb,
            emb.filter(col("vec_id") % 50 === 0))
          .orderBy("cid")
      }),

    // Inclusion-dependency discovery over the star schema: which
    // (child, parent) column pairs satisfy set containment — the
    // FK-candidate scan, including one deliberately reversed pair and
    // one cross-domain probe (events.user_id vs customers).
    Q("q310_inclusion_deps",
      Some(IncPairs.map { case (ct, cc, pt, pc) => incSql(ct, cc, pt, pc) }
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n",
          "\n) ORDER BY child_col, parent_col")),
      (s, d) => {
        def t(name: String) = table(s, d, name)
        IncPairs.map { case (ct, cc, pt, pc) =>
          Profile.inclusion(t(ct), cc, t(pt), pc, s"$ct.$cc", s"$pt.$pc")
        }.reduce(_ unionByName _).orderBy("child_col", "parent_col")
      }),

    // Candidate-key / uniqueness profile of every orders column: the
    // catalog's first scan over an unknown table (k column-pruned
    // passes — never one Expand-multiplied multi-countDistinct scan).
    Q("q311_key_profile",
      Some(OrdersCols.map(c => keySql("orders", c))
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n",
          "\n) ORDER BY col_name")),
      (s, d) => Profile.keyProfile(orders(s, d), OrdersCols)
        .orderBy("col_name")))
}
