package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Choice, Profile, Similarity, TextOps}
import graft.util.Tables._

/** Round-11 spectral/preference/centrality batch: PCA top eigenpair by
  * power iteration (q373), Bradley–Terry paired strengths (q374),
  * TextRank keyword centrality (q375), HBOS histogram outliers (q376),
  * and the kNN hubness audit (q377). The three iterative oracles are
  * generated CTE chains with `AS MATERIALIZED` on every step (DuckDB
  * 1.0 inlines plain CTEs per reference — the r10 k-truss lesson);
  * every fan-in float sum rides a 12-dp DECIMAL grid so both engines
  * walk identical trajectories.
  */
object SpectralQueries {

  private val EigIters = 8
  private val BtIters = 10
  private val TrIters = 6
  private val Damping = 0.85

  /** Power-iteration oracle: matrix CTE + unrolled v-updates. */
  private def eigSql: String = {
    val steps = (1 to EigIters).map { i =>
      s"""u$i AS MATERIALIZED (
         |  SELECT m.j, sum(round(m.m * v.v, 12)::DECIMAL(28,12))::DOUBLE AS u
         |  FROM me m JOIN v${i - 1} v ON m.k = v.j GROUP BY 1),
         |n$i AS MATERIALIZED (
         |  SELECT sqrt(sum(round(u.u * u.u, 12)::DECIMAL(28,12))::DOUBLE)
         |    AS nrm FROM u$i u),
         |v$i AS MATERIALIZED (
         |  SELECT u.j, u.u / n.nrm AS v FROM u$i u, n$i n)""".stripMargin
    }.mkString(",\n")
    s"""WITH ee AS MATERIALIZED (
       |  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |ex AS MATERIALIZED (
       |  SELECT e.vec_id, g.i - 1 AS j, e.emb[g.i]::DOUBLE AS x
       |  FROM ee e, unnest(generate_series(1, len(e.emb))) AS g(i)),
       |me AS MATERIALIZED (
       |  SELECT a.j, b.j AS k,
       |    sum(round(a.x * b.x, 12)::DECIMAL(28,12))::DOUBLE AS m
       |  FROM ex a JOIN ex b ON a.vec_id = b.vec_id GROUP BY 1, 2),
       |dims AS MATERIALIZED (SELECT DISTINCT j FROM me),
       |v0 AS MATERIALIZED (
       |  SELECT j, 1.0 / sqrt((SELECT count(*) FROM dims)::DOUBLE) AS v
       |  FROM dims),
       |$steps,
       |uf AS MATERIALIZED (
       |  SELECT m.j, sum(round(m.m * v.v, 12)::DECIMAL(28,12))::DOUBLE AS u
       |  FROM me m JOIN v$EigIters v ON m.k = v.j GROUP BY 1),
       |lam AS MATERIALIZED (
       |  SELECT sum(round(v.v * u.u, 12)::DECIMAL(28,12))::DOUBLE AS lam
       |  FROM v$EigIters v JOIN uf u USING (j))
       |SELECT v.j, round(v.v, 6) AS loading_r, round(lam.lam, 6) AS lambda_r
       |FROM v$EigIters v, lam ORDER BY j""".stripMargin
  }

  /** Bradley–Terry MM oracle: duel matrix + unrolled p-updates. */
  private def btSql: String = {
    val steps = (1 to BtIters).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT g.i, sum(round(g.n::DOUBLE / (pi.p + pj.p), 12)
         |    ::DECIMAL(28,12))::DOUBLE AS den
         |  FROM games g JOIN p${i - 1} pi ON g.i = pi.i
         |    JOIN p${i - 1} pj ON g.j = pj.i GROUP BY 1),
         |r$i AS MATERIALIZED (
         |  SELECT w.i, coalesce(w.wi::DOUBLE / nullif(d.den, 0.0), 0.0)
         |    AS praw
         |  FROM wi w JOIN d$i d ON w.i = d.i),
         |s$i AS MATERIALIZED (
         |  SELECT sum(round(praw, 12)::DECIMAL(28,12))::DOUBLE AS s
         |  FROM r$i),
         |p$i AS MATERIALIZED (
         |  SELECT i, praw / s AS p FROM r$i, s$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH rev AS MATERIALIZED (
       |  SELECT l_shipdate AS day, p_brand AS b,
       |    sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT AS cents
       |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2),
       |duels AS MATERIALIZED (
       |  SELECT a.b AS winner, b.b AS loser FROM rev a
       |  JOIN rev b ON a.day = b.day AND a.cents > b.cents),
       |w AS MATERIALIZED (
       |  SELECT winner AS i, loser AS j, count(*)::BIGINT AS w
       |  FROM duels GROUP BY 1, 2),
       |n0 AS MATERIALIZED (
       |  SELECT i, j, sum(w)::BIGINT AS wij FROM (
       |    SELECT i, j, w FROM w
       |    UNION ALL SELECT j AS i, i AS j, 0 AS w FROM w) t
       |  GROUP BY 1, 2),
       |games AS MATERIALIZED (
       |  SELECT a.i, a.j, (a.wij + b.wij)::BIGINT AS n
       |  FROM n0 a JOIN n0 b ON a.i = b.j AND a.j = b.i),
       |wi AS MATERIALIZED (
       |  SELECT i, sum(wij)::BIGINT AS wi FROM n0 GROUP BY 1),
       |p0 AS MATERIALIZED (SELECT i, 1.0::DOUBLE AS p FROM wi),
       |$steps
       |SELECT p.i AS item, wi.wi AS w, round(p.p, 6) AS p_r,
       |  row_number() OVER (ORDER BY round(p.p, 6) DESC, p.i) AS rnk
       |FROM p$BtIters p JOIN wi ON p.i = wi.i ORDER BY rnk""".stripMargin
  }

  /** TextRank oracle: filtered-adjacency token graph + unrolled
    * weighted-PageRank updates. The damping constants are written as
    * the UNSIMPLIFIED expressions Spark evaluates ((1.0 − 0.85) is not
    * the double 0.15 — the mmrRerank lesson). */
  private def trSql: String = {
    val steps = (1 to TrIters).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT e.dst AS term,
         |    (1.0::DOUBLE - $Damping::DOUBLE) / nv.n + $Damping::DOUBLE *
         |      sum(round(r.r * e.w::DOUBLE / o.outw::DOUBLE, 12)
         |        ::DECIMAL(28,12))::DOUBLE AS r
         |  FROM edges e JOIN outw o ON e.src = o.src
         |    JOIN r${i - 1} r ON e.src = r.term, nv
         |  GROUP BY e.dst, nv.n)""".stripMargin
    }.mkString(",\n")
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, string_split(
       |    lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS t
       |  FROM documents),
       |seq AS MATERIALIZED (
       |  SELECT d.doc_id, d.t[g.i] AS term,
       |    row_number() OVER (PARTITION BY d.doc_id ORDER BY g.i) AS i
       |  FROM toks d, unnest(generate_series(1, len(d.t))) AS g(i)
       |  WHERE length(d.t[g.i]) >= 4),
       |adj AS MATERIALIZED (
       |  SELECT a.term AS t1, b.term AS t2 FROM seq a
       |  JOIN seq b ON a.doc_id = b.doc_id AND b.i = a.i + 1
       |  WHERE a.term <> b.term),
       |edges AS MATERIALIZED (
       |  SELECT src, dst, count(*)::BIGINT AS w FROM (
       |    SELECT t1 AS src, t2 AS dst FROM adj
       |    UNION ALL SELECT t2 AS src, t1 AS dst FROM adj) t
       |  GROUP BY 1, 2),
       |outw AS MATERIALIZED (
       |  SELECT src, sum(w)::BIGINT AS outw FROM edges GROUP BY 1),
       |nv AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM outw),
       |r0 AS MATERIALIZED (SELECT src AS term, 1.0 / n AS r FROM outw, nv),
       |$steps,
       |top AS MATERIALIZED (
       |  SELECT term, round(r, 9) AS score_r FROM r$TrIters
       |  ORDER BY r DESC, term LIMIT 20)
       |SELECT row_number() OVER (ORDER BY score_r DESC, term) AS rn,
       |  term, score_r
       |FROM top ORDER BY rn""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // Top eigenpair of the embedding second-moment matrix: the actual
    // first principal axis behind q350's isotropy scalar and q353's
    // participation ratio — 8 power iterations, Rayleigh eigenvalue.
    Q("q373_top_eigen",
      Some(eigSql),
      (s, d) => Similarity.topEigen(embeddings(s, d), EigIters)
        .orderBy("j")),

    // Bradley-Terry strengths over daily brand revenue duels: brand A
    // "beats" brand B on days A out-ships B; MM iterations turn the
    // win matrix into opponent-adjusted skills (a win over a strong
    // brand counts more than a win over a weak one).
    Q("q374_bradley_terry",
      Some(btSql),
      (s, d) => {
        val rev = lineitem(s, d)
          .join(part(s, d), col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_shipdate").as("_day"), col("p_brand").as("_b"))
          .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
            .as("_cents"))
          .localCheckpoint()
        val a = rev.select(col("_day"), col("_b").as("winner"),
          col("_cents").as("_ca"))
        val b = rev.select(col("_day"), col("_b").as("loser"),
          col("_cents").as("_cb"))
        val duels = a.join(b, Seq("_day"))
          .where(col("_ca") > col("_cb"))
          .select(col("winner"), col("loser"))
        Choice.bradleyTerry(duels, "winner", "loser", BtIters)
          .orderBy("rnk")
      }),

    // TextRank keywords over the document corpus: weighted PageRank on
    // the consecutive-content-token graph — centrality keywords next
    // to q66's tf-idf frequency keywords.
    Q("q375_textrank",
      Some(trSql),
      (s, d) => TextOps.textRank(documents(s, d), "doc_id", "text",
        TrIters, Damping, minLen = 4, topK = 20).orderBy("rn")),

    // HBOS outlier events: hour x weekday x value-bin histograms,
    // score = sum of log10(maxcount/bincount) — the linear-time
    // assumption-free outlier detector (rare corner of several
    // histograms at once).
    Q("q376_hbos",
      Some("""WITH ev AS MATERIALIZED (
             |  SELECT event_id, extract(hour FROM ts)::BIGINT AS hb,
             |    (extract(dow FROM ts) + 1)::BIGINT AS db,
             |    least(floor(value / 50.0)::BIGINT, 20) AS vb
             |  FROM events),
             |h1 AS MATERIALIZED (
             |  SELECT hb, count(*)::BIGINT AS c1 FROM ev GROUP BY 1),
             |h2 AS MATERIALIZED (
             |  SELECT db, count(*)::BIGINT AS c2 FROM ev GROUP BY 1),
             |h3 AS MATERIALIZED (
             |  SELECT vb, count(*)::BIGINT AS c3 FROM ev GROUP BY 1),
             |m1 AS (SELECT max(c1)::BIGINT AS m1 FROM h1),
             |m2 AS (SELECT max(c2)::BIGINT AS m2 FROM h2),
             |m3 AS (SELECT max(c3)::BIGINT AS m3 FROM h3),
             |scored AS MATERIALIZED (
             |  SELECT e.event_id,
             |    log10(m1.m1::DOUBLE / c1::DOUBLE)
             |      + log10(m2.m2::DOUBLE / c2::DOUBLE)
             |      + log10(m3.m3::DOUBLE / c3::DOUBLE) AS s
             |  FROM ev e JOIN h1 USING (hb) JOIN h2 USING (db)
             |    JOIN h3 USING (vb), m1, m2, m3),
             |top AS MATERIALIZED (
             |  SELECT event_id, round(s, 6) AS score_r FROM scored
             |  ORDER BY s DESC, event_id LIMIT 20)
             |SELECT row_number() OVER (ORDER BY score_r DESC, event_id)
             |    AS rn, event_id, score_r
             |FROM top ORDER BY rn""".stripMargin),
      (s, d) => {
        val ev = events(s, d).select(col("event_id"),
          hour(col("ts")).cast("long").as("hb"),
          dayofweek(col("ts")).cast("long").as("db"),
          least(floor(col("value") / 50.0), lit(20L)).cast("long")
            .as("vb"))
        Profile.hbos(ev, "event_id", Seq("hb", "db", "vb"), 20)
          .orderBy("rn")
      }),

    // kNN hubness audit of the embedding space (k = 10): k-occurrence
    // distribution of the exact cosine kNN graph — skewness is THE
    // hubness symptom (a few vectors answer every query while
    // anti-hubs are never retrieved).
    Q("q377_hubness",
      Some("""WITH sims AS MATERIALIZED (
             |  SELECT q.vec_id AS q_id, e.vec_id AS neighbor_id,
             |    list_cosine_similarity(e.embedding::DOUBLE[],
             |      q.embedding::DOUBLE[]) AS sim
             |  FROM embeddings e, embeddings q
             |  WHERE e.vec_id <> q.vec_id),
             |knn AS MATERIALIZED (
             |  SELECT q_id, neighbor_id FROM (
             |    SELECT q_id, neighbor_id, row_number() OVER (
             |      PARTITION BY q_id ORDER BY sim DESC, neighbor_id)
             |      AS rn
             |    FROM sims WHERE sim IS NOT NULL) t
             |  WHERE rn <= 10),
             |nk AS MATERIALIZED (
             |  SELECT e.vec_id, coalesce(c.c, 0)::BIGINT AS nk
             |  FROM embeddings e LEFT JOIN (
             |    SELECT neighbor_id, count(*)::BIGINT AS c
             |    FROM knn GROUP BY 1) c ON e.vec_id = c.neighbor_id),
             |m AS (SELECT count(*)::BIGINT AS n,
             |  sum(nk::HUGEINT) AS s1, sum(nk::HUGEINT * nk) AS s2,
             |  sum(nk::HUGEINT * nk * nk) AS s3,
             |  max(nk)::BIGINT AS max_nk,
             |  sum(CASE WHEN nk >= 20 THEN 1 ELSE 0 END)::BIGINT
             |    AS n_hubs,
             |  sum(CASE WHEN nk = 0 THEN 1 ELSE 0 END)::BIGINT
             |    AS n_antihubs FROM nk)
             |SELECT n, round(s1::DOUBLE / n::DOUBLE, 6) AS mean_nk_r,
             |  round(CASE WHEN s2::DOUBLE / n::DOUBLE
             |      - (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE)
             |      > 0 THEN
             |    (s3::DOUBLE / n::DOUBLE
             |      - 3.0 * (s1::DOUBLE / n::DOUBLE)
             |        * (s2::DOUBLE / n::DOUBLE)
             |      + 2.0 * (s1::DOUBLE / n::DOUBLE)
             |        * (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE))
             |    / pow(s2::DOUBLE / n::DOUBLE
             |      - (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE),
             |      1.5) END, 6) AS skew_r,
             |  max_nk, n_hubs, n_antihubs FROM m""".stripMargin),
      (s, d) => {
        val emb = embeddings(s, d)
        Similarity.hubnessAudit(emb,
          Similarity.cosineTopK(emb, emb, 10), hubAt = 20L)
      })
  )
}
