package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the driver testdata
  * (/root/testdata/sf{0.001,0.01,0.1}/&lt;name&gt;.parquet — TESTDATA.md).
  *
  * All engine queries read through here so scan behavior (vectorized
  * parquet reader, pushdown, pruning) is uniform. At 100 TB these become
  * partitioned-table reads; the call sites don't change.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` arrives in whatever parquet timestamp flavor the
    * fixture generator used, normalized here to session-tz
    * `TimestampType` (sessions pin UTC):
    *  - timestamp[ns]: Spark has no ns TimestampType, so sessions set
    *    `spark.sql.legacy.parquet.nanosAsLong=true` and we floor-divide
    *    to micros — matching DuckDB's truncating ns→µs read;
    *  - timestamp[us] without tz (isAdjustedToUTC=false): Spark reads
    *    TIMESTAMP_NTZ, which watermarks/unix_micros reject — cast to
    *    TimestampType interprets the naive value in the UTC session tz,
    *    the same instants DuckDB's naive TIMESTAMP read yields. */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Sanitized per-sf-dir suffix for persisted derived-table names, so
    * different scales (and fixture dirs) never alias one layout. */
  def tableKey(d: String): String =
    d.replaceAll("[^A-Za-z0-9]", "_").toLowerCase

  /** The supplier co-occurrence edge list (orders sharing a supplier,
    * support ≥ 5) as a PERSISTED bucketed(src)+sorted table —
    * build-if-absent, keyed by sf dir, mtime-guarded. The whole graph
    * family (PageRank, k-core, k-truss, modularity, HITS, LPA,
    * triangles, rich-club) reads THIS instead of rebuilding the same
    * co-occurrence self-join per query: at 100 TB the graph is built
    * once and re-read, and bucketing makes every src-keyed self-join
    * exchange-free on the edge side (q367's measured pattern). */
  def suppEdgeTable(s: SparkSession, d: String): DataFrame =
    graft.ops.Graphs.bucketedEdgeTable(s,
      graft.ops.Graphs.coOccurrenceEdges(lineitem(s, d),
        "l_orderkey", "l_suppkey", 5L),
      "graft_edges_" + tableKey(d),
      freshSince = new java.io.File(s"$d/lineitem.parquet").lastModified())

  /** The part co-occurrence edge list (support ≥ 2) — the denser
    * second graph family (k-hop, landmarks, common-neighbors, degree
    * distributions), same persisted bucketed layout as [[suppEdgeTable]]. */
  def partEdgeTable(s: SparkSession, d: String): DataFrame =
    graft.ops.Graphs.bucketedEdgeTable(s,
      graft.ops.Graphs.coOccurrenceEdges(lineitem(s, d),
        "l_orderkey", "l_partkey", 2L),
      "graft_pedges_" + tableKey(d),
      freshSince = new java.io.File(s"$d/lineitem.parquet").lastModified())

  /** The documents word-3-shingle table (doc_id, h) as a PERSISTED
    * bucketed(doc_id)+sorted table — the MinHash/LSH family's shared
    * trunk. Every LSH audit previously re-ran the normalize→tokenize→
    * k-gram-explode→hash pipeline over the corpus per query; a
    * production corpus shingles ONCE and the audits read the parquet.
    * Bucketing by doc id makes the verify stage's per-doc counts and
    * candidate semi-joins exchange-free on the shingle side. */
  def docShingleTable(s: SparkSession, d: String): DataFrame =
    graft.ops.Graphs.bucketedLayout(s,
      graft.ops.Dedup.shingleTable(documents(s, d), "doc_id", "text"),
      "graft_shingles_" + tableKey(d), buckets = 8, keyCol = "doc_id",
      sortCols = Seq("doc_id", "h"),
      freshSince = new java.io.File(s"$d/documents.parquet").lastModified())

  /** The MinHash LSH band-key table (doc_id, band, bk) as a PERSISTED
    * bucketed(bk)+sorted table, derived from [[docShingleTable]]
    * (layout chain: shingles → signatures → band keys, each a pure
    * function of content). Bucketing by band key lets the candidate
    * self-join read BOTH sides exchange-free (subset-key
    * co-partitioning, the q367 conf) — the 100 TB posture where the
    * index is built once and probed by every dedup/audit run. */
  def docBandTable(s: SparkSession, d: String): DataFrame =
    graft.ops.Graphs.bucketedLayout(s,
      graft.ops.Dedup.bandTable(
        graft.ops.Dedup.minhashFromShingles(docShingleTable(s, d),
          "doc_id"), "doc_id"),
      "graft_bands_" + tableKey(d), buckets = 8, keyCol = "bk",
      sortCols = Seq("bk", "band", "doc_id"),
      freshSince = new java.io.File(s"$d/documents.parquet").lastModified())

  /** The 60-bit SimHash signature table (doc_id, simhash) as a
    * PERSISTED bucketed(doc_id)+sorted table — the simhash family's
    * shared trunk ([[docShingleTable]]'s pattern applied to
    * [[graft.ops.Dedup.simhash]]). q31/q80/q81 previously recomputed
    * the signature (normalize→tokenize→hash→wide 60-bit agg over the
    * whole corpus) per query; a production corpus signs ONCE and every
    * dedup run reads the parquet. Bucketing by doc id makes the exact
    * hamming verify's two doc-keyed probes exchange-free on the
    * signature side. */
  def docSimhashTable(s: SparkSession, d: String): DataFrame =
    graft.ops.Graphs.bucketedLayout(s,
      graft.ops.Dedup.simhash(documents(s, d), "doc_id", "text"),
      "graft_simhash_" + tableKey(d), buckets = 8, keyCol = "doc_id",
      sortCols = Seq("doc_id"),
      freshSince = new java.io.File(s"$d/documents.parquet").lastModified())

  /** Runs `body` with subset-key co-partitioning enabled (scoped +
    * restored): lets a join whose keys are a superset of a bucketed
    * table's bucket key reuse the bucket layout instead of
    * re-exchanging. Spark plans exchanges lazily at first execution, so
    * `body` must EAGERLY materialize (localCheckpoint/collect) anything
    * whose plan should see the conf. */
  def withSubsetCoPartition[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.requireAllClusterKeysForCoPartition"
    val prev = s.conf.get(key)
    s.conf.set(key, "false")
    try body finally s.conf.set(key, prev)
  }
}
