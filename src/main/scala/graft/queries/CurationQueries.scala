package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Curation
import graft.util.Tables._

/** Corpus-curation surface over `documents` (training-data pipeline
  * operators beyond the reference): deterministic hash splits, per-source
  * quotas, benchmark decontamination. Oracle SQL mirrors the same
  * md5-derived arithmetic, so both engines assign identical rows.
  */
object CurationQueries {

  val all: Seq[Q] = Seq(

    // Deterministic train/val/test split: md5(id) → bucket 0-99 →
    // 80/10/10. A pure projection (no shuffle); assignments never move as
    // the corpus grows.
    Q("q63_hash_split",
      Some("""SELECT doc_id, bucket,
             | CASE WHEN bucket < 80 THEN 'train'
             |      WHEN bucket < 90 THEN 'val'
             |      ELSE 'test' END AS split
             |FROM (SELECT doc_id,
             |        ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
             |          % 100 AS bucket
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin),
      (s, d) => Curation.hashSplit(documents(s, d), "doc_id")
        .select("doc_id", "bucket", "split").orderBy("doc_id")),

    // Per-source quota: keep the 5 longest docs per source (ties by id) —
    // the "cap documents per domain" curation step as a partitioned
    // window, one shuffle by source.
    Q("q64_per_source_cap",
      Some("""SELECT source, doc_id, n_chars FROM (
             |  SELECT source, doc_id, n_chars,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY n_chars DESC, doc_id) AS rn
             |  FROM documents) t
             |WHERE rn <= 5 ORDER BY source, doc_id""".stripMargin),
      (s, d) => Curation.capPerKey(documents(s, d), "source", 5,
          col("n_chars").desc, col("doc_id"))
        .select("source", "doc_id", "n_chars")
        .orderBy("source", "doc_id")),

    // Deterministic stratified sampling: per-segment keep rates through
    // md5-bucket arithmetic — reproducible across engines/retries/growth,
    // unlike RNG sampling. Pure filter, no shuffle.
    Q("q73_stratified_sample",
      Some("""SELECT c_custkey, c_mktsegment FROM customer
             |WHERE ('0x' || substr(md5(c_custkey::VARCHAR), 1, 15))::BIGINT
             |    % 100 <
             |  CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 20
             |       WHEN 'BUILDING' THEN 10 ELSE 5 END
             |ORDER BY c_custkey""".stripMargin),
      (s, d) => Curation.stratifiedSample(customer(s, d), "c_custkey",
          "c_mktsegment", Map("AUTOMOBILE" -> 20, "BUILDING" -> 10), 5)
        .select("c_custkey", "c_mktsegment").orderBy("c_custkey")),

    // Latest-version-per-key compaction (snapshot/CDC step): each user's
    // newest event by (ts, event_id) DESC — one shuffle, no global sort.
    Q("q74_latest_per_key",
      Some("""SELECT user_id, event_id, ts, event_type FROM (
             |  SELECT user_id, event_id, ts, event_type,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts DESC NULLS LAST, event_id DESC) AS rn
             |  FROM events) t
             |WHERE rn = 1 ORDER BY user_id""".stripMargin),
      (s, d) => Curation.latestPerKey(events(s, d), "user_id",
          col("ts").desc, col("event_id").desc)
        .select("user_id", "event_id", "ts", "event_type")
        .orderBy("user_id")),

    // MERGE/upsert (Delta-style MERGE INTO, relationally): updates win on
    // key collision, new keys insert — priority-tagged union + one
    // latest-per-key shuffle, snapshot-safe on plain parquet. Updates
    // derived from the table itself so the oracle is self-contained:
    // +1000 balance for custkey % 10 = 0, brand-new keys (+1e6) for % 97.
    Q("q78_upsert_merge",
      Some("""WITH cur AS (
             |  SELECT c_custkey, c_name, c_acctbal FROM customer),
             |updates AS (
             |  SELECT c_custkey, c_name, c_acctbal + 1000 AS c_acctbal
             |  FROM customer WHERE c_custkey % 10 = 0
             |  UNION ALL
             |  SELECT c_custkey + 1000000, c_name, c_acctbal
             |  FROM customer WHERE c_custkey % 97 = 0),
             |merged AS (
             |  SELECT *, 0 AS src FROM cur
             |  UNION ALL SELECT *, 1 AS src FROM updates)
             |SELECT c_custkey, c_name, c_acctbal FROM (
             |  SELECT *, row_number() OVER (PARTITION BY c_custkey
             |    ORDER BY src DESC) AS rn FROM merged) t
             |WHERE rn = 1 ORDER BY c_custkey""".stripMargin),
      (s, d) => {
        val cur = customer(s, d).select("c_custkey", "c_name", "c_acctbal")
        val updates = customer(s, d).filter(col("c_custkey") % 10 === 0)
          .select(col("c_custkey"), col("c_name"),
            (col("c_acctbal") + 1000).as("c_acctbal"))
          .unionByName(customer(s, d).filter(col("c_custkey") % 97 === 0)
            .select((col("c_custkey") + 1000000).as("c_custkey"),
              col("c_name"), col("c_acctbal")))
        Curation.upsert(cur, updates, "c_custkey").orderBy("c_custkey")
      }),

    // Benchmark decontamination: eval set = doc_id % 97 = 0; for each eval
    // doc, how many of its word-3-shingle hashes appear anywhere in the
    // train remainder (hash-keyed semi-join against the distinct train
    // shingle set, never an all-pairs comparison).
    Q("q65_decontam_overlap",
      Some(s"""${TextQueries.shingleCte},
              |ev AS (SELECT doc_id FROM documents WHERE doc_id % 97 = 0),
              |evsh AS (
              |  SELECT h.doc_id, h.h FROM hashed h JOIN ev USING (doc_id)),
              |trainh AS (
              |  SELECT DISTINCT h FROM hashed
              |  WHERE doc_id NOT IN (SELECT doc_id FROM ev)),
              |nsh AS (
              |  SELECT doc_id, count(*) AS n_shingles FROM evsh GROUP BY doc_id),
              |shared AS (
              |  SELECT doc_id, count(*) AS n_shared FROM evsh
              |  WHERE h IN (SELECT h FROM trainh) GROUP BY doc_id)
              |SELECT e.doc_id,
              |  coalesce(n.n_shingles, 0) AS n_shingles,
              |  coalesce(s.n_shared, 0) AS n_shared,
              |  CASE WHEN coalesce(n.n_shingles, 0) = 0 THEN 0.0
              |       ELSE round(coalesce(s.n_shared, 0) / n.n_shingles, 6)
              |  END AS contamination
              |FROM ev e
              |LEFT JOIN nsh n USING (doc_id)
              |LEFT JOIN shared s USING (doc_id)
              |ORDER BY doc_id""".stripMargin),
      (s, d) => Curation.contaminationOverlap(documents(s, d), "doc_id",
          "text", col("doc_id") % 97 === 0)
        .orderBy("doc_id")),

    // Token-budget sample packing (concatenate-and-slice shard layout):
    // each doc's shard is where its cumulative start offset lands. The
    // Spark side is the two-level distributed prefix sum (ops.Pack — no
    // global single-task sort); the oracle is the plain global window it
    // must equal. bucketSize 128 forces the multi-bucket path even at
    // sf0.01. Weight = ceil(n_chars/4), the ~4-chars/token heuristic
    // shared with TextOps.tokenStats; integer arithmetic end-to-end, so
    // parity is exact. start_offset MUST be cast ::BIGINT in the final
    // select: DuckDB's windowed sum(BIGINT) returns HUGEINT, which
    // pandas materializes as float64 — equal values but a different
    // dtype than Spark's int64 parquet column, and a type-sensitive
    // hash compare then mismatches (the r5 q96 red row; every other
    // oracle's integer outputs are BIGINT-or-narrower, where int32 vs
    // int64 is tolerated but int vs float is not).
    Q("q96_token_packing",
      Some("""WITH w AS (
             |  SELECT doc_id, ceil(n_chars / 4)::BIGINT AS n_tokens
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, n_tokens,
             |    sum(n_tokens) OVER (ORDER BY doc_id
             |      ROWS UNBOUNDED PRECEDING) - n_tokens AS start_offset
             |  FROM w)
             |SELECT doc_id, n_tokens, start_offset::BIGINT AS start_offset,
             |  (start_offset // 8192)::BIGINT AS shard_id
             |FROM c ORDER BY doc_id""".stripMargin),
      (s, d) => graft.ops.Pack.packByBudget(
          documents(s, d).select(col("doc_id"),
            ceil(col("n_chars") / 4).cast("long").as("n_tokens")),
          "doc_id", "n_tokens", budget = 8192L, bucketSize = 128L)
        .select("doc_id", "n_tokens", "start_offset", "shard_id")
        .orderBy("doc_id")),

    // Soft dedup: exact-dup copies keep with probability 1/√(cluster
    // size) — the word2vec subsampling rule at doc level, md5-coin
    // deterministic (Curation.softDedup; the middle ground between q24's
    // hard dedup and no dedup).
    Q("q169_soft_dedup",
      Some(s"""WITH k AS (
              |  SELECT doc_id, md5(${TextQueries.normSql}) AS ck
              |  FROM documents),
              |cs AS (SELECT ck, count(*)::BIGINT AS cluster_size
              |       FROM k GROUP BY ck)
              |SELECT doc_id, cluster_size,
              |  ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))
              |    ::BIGINT::DOUBLE / 1152921504606846976.0
              |    < 1.0 / sqrt(cluster_size) AS keep
              |FROM k JOIN cs USING (ck) ORDER BY doc_id""".stripMargin),
      (s, d) => Curation.softDedup(documents(s, d), "doc_id", "text")
        .select("doc_id", "cluster_size", "keep")
        .orderBy("doc_id"))
  )
}
