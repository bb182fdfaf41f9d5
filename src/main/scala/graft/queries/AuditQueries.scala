package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{CorpusAudit, Curation, Dedup, Profile}
import graft.util.Tables._

/** Corpus-audit surface: slice-vs-slice overlap/divergence reports over
  * `documents` (the pre-mixing health checks of a training-data ingest;
  * ops in [[graft.ops.CorpusAudit]]). Oracle fragments are shared with
  * TextQueries so both engines run the identical md5-derived pipeline.
  */
object AuditQueries {

  private val normSql = TextQueries.normSql

  // q161: the q61 near-dup threshold — pairs at or above it are the ones
  // end-to-end dedup acts on, so they are the ones that leak
  private val LeakThreshold = 0.5

  // q162: top-20 heaviest keys — the salting-decision shortlist
  private val SkewTopK = 20

  // q163: release gate k=5 / l=2 over (source, 200-char length bucket),
  // sensitive = lang — a mixed suppressed/clear regime at 500-doc and
  // 5000-doc scales alike
  private val KAnonK = 5L
  private val LDivL = 2L
  private val LenBucket = 200

  val all: Seq[Q] = Seq(

    // Pairwise shingle-set Jaccard between sources — the corpus-level
    // overlap matrix (full upper triangle, zero-overlap pairs included).
    Q("q159_source_overlap",
      Some(s"""WITH toks AS (
              |  SELECT source, string_split($normSql, ' ') AS t
              |  FROM documents),
              |sh AS (
              |  SELECT DISTINCT source,
              |    ${TextQueries.hash60Sql("t[i] || ' ' || t[i+1] || ' ' || t[i+2]")} AS h
              |  FROM toks,
              |    unnest(generate_series(1, greatest(len(t) - 2, 0))) AS g(i)),
              |sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY 1),
              |inter AS (
              |  SELECT a.source AS key_a, b.source AS key_b,
              |    count(*) AS n_inter
              |  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
              |  GROUP BY 1, 2)
              |SELECT sa.source AS key_a, sb.source AS key_b,
              |  sa.n::BIGINT AS n_a, sb.n::BIGINT AS n_b,
              |  coalesce(i.n_inter, 0)::BIGINT AS n_inter,
              |  round(coalesce(i.n_inter, 0)::DOUBLE
              |    / (sa.n + sb.n - coalesce(i.n_inter, 0)), 6) AS jaccard_r
              |FROM sizes sa
              | JOIN sizes sb ON sa.source < sb.source
              | LEFT JOIN inter i
              |   ON i.key_a = sa.source AND i.key_b = sb.source
              |ORDER BY key_a, key_b""".stripMargin),
      (s, d) => CorpusAudit.sourceOverlapMatrix(
          documents(s, d), "source", "text")
        .orderBy("key_a", "key_b")),

    // Pairwise Jensen–Shannon divergence (nats) between source unigram
    // distributions — the mixture-design distance matrix. H(m) is
    // assembled from the intersection join plus per-source tail scalars
    // (see CorpusAudit.jsDivergenceMatrix scaladoc), so the oracle
    // mirrors the same decomposition term for term.
    Q("q160_js_divergence",
      Some(s"""WITH tok AS (
              |  SELECT source, unnest(string_split($normSql, ' ')) AS tok
              |  FROM documents),
              |c AS (SELECT source, tok, count(*)::DOUBLE AS c
              |      FROM tok GROUP BY 1, 2),
              |tot AS (SELECT source, sum(c) AS tot FROM c GROUP BY 1),
              |p AS (SELECT c.source, tok, c / tot AS p
              |      FROM c JOIN tot USING (source)),
              |scal AS (
              |  SELECT source, sum(-p * ln(p)) AS hh,
              |    sum(-(p / 2) * ln(p / 2)) AS fh
              |  FROM p GROUP BY 1),
              |it AS (
              |  SELECT a.source AS key_a, b.source AS key_b,
              |    sum(-((a.p + b.p) / 2) * ln((a.p + b.p) / 2)
              |      + (a.p / 2) * ln(a.p / 2)
              |      + (b.p / 2) * ln(b.p / 2)) AS t
              |  FROM p a JOIN p b ON a.tok = b.tok AND a.source < b.source
              |  GROUP BY 1, 2)
              |SELECT sa.source AS key_a, sb.source AS key_b,
              |  round(coalesce(i.t, 0) + sa.fh + sb.fh
              |    - (sa.hh + sb.hh) / 2, 6) AS js_r
              |FROM scal sa
              | JOIN scal sb ON sa.source < sb.source
              | LEFT JOIN it i
              |   ON i.key_a = sa.source AND i.key_b = sb.source
              |ORDER BY key_a, key_b""".stripMargin),
      (s, d) => CorpusAudit.jsDivergenceMatrix(
          documents(s, d), "source", "text")
        .orderBy("key_a", "key_b")),

    // Near-dup leakage: verified LSH pairs (Jaccard ≥ 0.5, the q61
    // action threshold) attributed to the unordered source pairs they
    // span — within-source rows are routine dedup, cross-source rows are
    // train-mix contamination.
    Q("q161_neardup_leakage",
      Some(s"""${TextQueries.bandsCte},
              |counts AS (SELECT doc_id, count(*) AS n FROM hashed
              |           GROUP BY doc_id),
              |inter AS (
              |  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
              |  FROM cand c
              |  JOIN hashed ha ON ha.doc_id = c.doc_a
              |  JOIN hashed hb ON hb.doc_id = c.doc_b AND hb.h = ha.h
              |  GROUP BY c.doc_a, c.doc_b),
              |jac AS (
              |  SELECT i.doc_a, i.doc_b,
              |    n_inter::DOUBLE / (ca.n + cb.n - n_inter) AS jaccard
              |  FROM inter i
              |   JOIN counts ca ON ca.doc_id = i.doc_a
              |   JOIN counts cb ON cb.doc_id = i.doc_b
              |  WHERE n_inter::DOUBLE / (ca.n + cb.n - n_inter)
              |    >= $LeakThreshold),
              |keyed AS (
              |  SELECT least(da.source, db.source) AS key_lo,
              |    greatest(da.source, db.source) AS key_hi, j.jaccard
              |  FROM jac j
              |   JOIN documents da ON da.doc_id = j.doc_a
              |   JOIN documents db ON db.doc_id = j.doc_b)
              |SELECT key_lo, key_hi, count(*)::BIGINT AS n_pairs,
              |  round(avg(jaccard), 6) AS avg_jaccard_r
              |FROM keyed GROUP BY 1, 2
              |ORDER BY key_lo, key_hi""".stripMargin),
      (s, d) => {
        val docs = documents(s, d)
        val shingles = docShingleTable(s, d)
        val pairs = withSubsetCoPartition(s)(
          Dedup.bandJoin(docBandTable(s, d), "doc_id", "doc_a", "doc_b")
            .localCheckpoint())
        val scored = Dedup.jaccardForPairs(shingles, pairs, "doc_id")
        CorpusAudit.nearDupLeakage(scored, docs, "doc_id", "source",
            LeakThreshold)
          .orderBy("key_lo", "key_hi")
      }),

    // Key-skew profile over the event stream's user key: top-20 heavy
    // keys with share / cumulative share, plus the Gini coefficient of
    // the whole key distribution — the measurement behind every
    // salting/AQE-valve decision in SCALE.md.
    Q("q162_key_skew",
      Some(s"""WITH c AS (
              |  SELECT user_id, count(*) AS n FROM events GROUP BY 1),
              |tot AS (SELECT sum(n)::DOUBLE AS tot, count(*)::DOUBLE AS s
              |        FROM c),
              |g AS (
              |  SELECT sum((2 * i - s - 1) * n) / (max(s) * max(tot))
              |    AS gini
              |  FROM (SELECT n,
              |          (row_number() OVER (ORDER BY n, user_id))::DOUBLE
              |            AS i
              |        FROM c), tot),
              |r AS (
              |  SELECT user_id, n,
              |    row_number() OVER (ORDER BY n DESC, user_id) AS rank,
              |    sum(n) OVER (ORDER BY n DESC, user_id ROWS BETWEEN
              |      UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              |  FROM c)
              |SELECT rank::INTEGER AS rank, user_id, n,
              |  round(n / tot, 6) AS share_r,
              |  round(cum / tot, 6) AS cum_share_r,
              |  round(gini, 6) AS gini_r
              |FROM r, tot, g WHERE rank <= $SkewTopK
              |ORDER BY rank""".stripMargin),
      (s, d) => Profile.keySkew(events(s, d), "user_id", SkewTopK)
        .orderBy("rank")),

    // k-anonymity / l-diversity release gate over documents: QI =
    // (source, 200-char length bucket), sensitive = lang; a group is
    // suppressed when n < 5 or distinct langs < 2.
    Q("q163_privacy_profile",
      Some(s"""WITH b AS (
              |  SELECT source,
              |    (n_chars // $LenBucket)::BIGINT AS len_bucket, lang
              |  FROM documents),
              |g1 AS (
              |  SELECT source, len_bucket, lang, count(*) AS n
              |  FROM b GROUP BY 1, 2, 3),
              |g2 AS (
              |  SELECT source, len_bucket, sum(n)::BIGINT AS n,
              |    count(*)::BIGINT AS n_sensitive
              |  FROM g1 GROUP BY 1, 2)
              |SELECT source, len_bucket, n, n_sensitive,
              |  (n < $KAnonK OR n_sensitive < $LDivL) AS suppressed
              |FROM g2 ORDER BY source, len_bucket""".stripMargin),
      (s, d) => Curation.privacyProfile(
          documents(s, d).select(col("source"),
            floor(col("n_chars") / LenBucket).as("len_bucket"),
            col("lang")),
          Seq("source", "len_bucket"), "lang", KAnonK, LDivL)
        .orderBy("source", "len_bucket"))
  )
}
