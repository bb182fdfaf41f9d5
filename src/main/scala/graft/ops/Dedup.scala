package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators (builder north star; SURVEY.md §2.12):
  * exact (hash-groupBy), MinHash+LSH (shingle → minhash → band →
  * bucket-join), SimHash, and n-gram Jaccard verification.
  *
  * Everything is md5-derived so the DuckDB oracle reproduces results
  * exactly; all stages are shuffle-partitioned relational plans (no
  * driver-side state), which is what makes them viable at 100 TB:
  *  - shingling: per-row generate+explode (map-side only);
  *  - signatures: single hash-aggregate over (doc, shingle);
  *  - LSH: band-key equi-join — candidate generation without the O(n²)
  *    cross product; Catalyst shuffles both sides by band key.
  */
object Dedup {

  /** Deterministic 60-bit xor-seeds for the MinHash family,
    * h_j(x) = h(x) XOR seed_j. */
  val NumHashes = 16
  lazy val seeds: IndexedSeq[Long] = (0 until NumHashes).map { j =>
    val md = MessageDigest.getInstance("MD5")
      .digest(s"graft-minhash-$j".getBytes(StandardCharsets.UTF_8))
    val hex = md.map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Exact-duplicate groups: keeper (min id) + multiplicity per distinct
    * content hash. */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** (id, h): distinct word-3-shingles per doc as 60-bit hashes. Shingle
    * dedup is PER-DOCUMENT, so it's done row-locally with array_distinct
    * before the explode — zero shuffle (a global `.distinct()` here would
    * shuffle the whole shingle corpus for no semantic gain). The shingle
    * string is hashed and dropped map-side; all downstream set logic
    * (minhash, Jaccard) operates on the 16-byte h. */
  /** Word-k-gram SQL expression over a token-array column — the one
    * shared builder for every n-gram consumer (shingles, repetition).
    * CASE-guard: Spark's sequence(1, 0) steps DOWNWARD, so short docs
    * must map to an empty array explicitly. `distinct` = per-row set
    * semantics (shingles); without it, instances are kept (repetition
    * counts). */
  def kGramExpr(toksCol: String, k: Int, distinct: Boolean): String = {
    val joined = (0 until k).map(o => s"$toksCol[i - 1 + $o]").mkString(", ")
    val grams =
      s"transform(sequence(1, size($toksCol) - ${k - 1}), i -> concat_ws(' ', $joined))"
    val body = if (distinct) s"array_distinct($grams)" else grams
    s"CASE WHEN size($toksCol) >= $k THEN $body ELSE array() END"
  }

  def shingleTable(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    df.select(col(idCol), TextOps.tokens(TextOps.normalize(col(textCol))).as("_toks"))
      .select(col(idCol),
        explode(expr(kGramExpr("_toks", k, distinct = true))).as("shingle"))
      .select(col(idCol), TextOps.hash60(col("shingle")).as("h"))
  }

  /** MinHash signatures: one hash-agg pass computing all NumHashes minima. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    minhashFromShingles(shingleTable(df, idCol, textCol), idCol)

  /** Signature aggregation over an existing shingle table — lets pipelines
    * that need both shingles and signatures (LSH + Jaccard verify) compute
    * the shingle stage once and reuse it. */
  def minhashFromShingles(shingles: DataFrame, idCol: String): DataFrame = {
    val aggs = seeds.zipWithIndex.map { case (k, j) =>
      min(expr(s"h ^ ${k}L")).as(s"m$j")
    }
    shingles.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: signature → (band, band_key) rows → self-join on band
    * key → distinct candidate pairs (doc_a < doc_b). bands*rowsPerBand
    * must equal NumHashes. */
  def lshCandidatePairs(sig: DataFrame, idCol: String,
      bands: Int = 4, rowsPerBand: Int = 4): DataFrame =
    bandJoin(bandTable(sig, idCol, bands, rowsPerBand), idCol,
      "doc_a", "doc_b")

  /** Signature → (id, band, bk) band-key rows — the LSH index table a
    * pipeline PERSISTS: band keys are pure functions of the signature,
    * so an incremental run loads this table for the base corpus instead
    * of re-hashing it (see [[deltaNearDups]]). */
  def bandTable(sig: DataFrame, idCol: String,
      bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    require(bands * rowsPerBand == NumHashes)
    val bandStructs = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => s"m${b * rowsPerBand + r}")
      s"struct(${b} AS band, md5(concat_ws(',', ${cols.mkString(", ")})) AS bk)"
    }
    sig
      .select(col(idCol), explode(expr(s"array(${bandStructs.mkString(", ")})")).as("b"))
      .select(col(idCol), col("b.band").as("band"), col("b.bk").as("bk"))
  }

  /** The LSH candidate join shared by the MinHash (text) and sign-bit
    * (embedding) families: (id, band, bk) rows self-joined on the band
    * key — a hash equi-join, never a cross product — keeping ordered
    * pairs, distinct across bands.
    *
    * Skew valve: a degenerate band key (boilerplate signatures, constant
    * vectors) makes its bucket's join output quadratic in the bucket
    * size — the one way this join can blow up at 100 TB. Buckets larger
    * than `maxBucket` are dropped before the self-join (standard LSH
    * practice: an over-dense bucket carries ~no discriminative signal,
    * and its members still pair through their other bands). Bucket sizes
    * come from a count window over the SAME (band, bk) shuffle the join
    * needs — no second pass over the (possibly expensive) signature
    * pipeline feeding `bands`. The cap is mirrored into every DuckDB
    * oracle twin via [[MaxBucket]], so both engines prune identically if
    * it ever fires — never a silent Spark-only recall drop. */
  val MaxBucket = 100000L
  def bandJoin(bands: DataFrame, idCol: String, outA: String,
      outB: String, maxBucket: Long = MaxBucket): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bk"))
    val pruned = bands
      .withColumn("_n", count(lit(1)).over(w))
      .filter(col("_n") <= maxBucket)
      .select(col(idCol), col("band"), col("bk"))
    val a = pruned.select(col(idCol).as(outA), col("band"), col("bk"))
    val b = pruned.select(col(idCol).as(outB), col("band"), col("bk"))
    a.join(b, Seq("band", "bk"))
      .filter(col(outA) < col(outB))
      .select(outA, outB).distinct()
  }

  /** Exact n-gram Jaccard for candidate pairs: inverted-index join on the
    * shingle-hash table, never the cross product. The shingle table is
    * first semi-filtered to candidate docs, so the verify joins touch
    * candidate shingles only instead of shuffling the whole corpus.
    *
    * No forced broadcast on the candidate-id set: candidates are usually a
    * vanishing fraction of the corpus after LSH, but on a pathologically
    * duplicated corpus they are unbounded, and a hard `broadcast()` hint
    * there is a driver OOM at 100 TB. AQE sizes the built side at runtime
    * and picks broadcast exactly when it actually fits. */
  def jaccardForPairs(shingles: DataFrame, pairs: DataFrame,
      idCol: String): DataFrame =
    // candidateShingles has ONE consumer now (the per-doc set-row agg
    // inside jaccardOnCandidates), so it is not cached here; the set
    // rows — which feed both probe sides — are cached inside
    // jaccardOnCandidates with the harness-clearCache LIFECYCLE
    // (Verify/Bench call clearCache per query). Library callers who
    // need deterministic cleanup should build docShingleSets +
    // jaccardOnSets and own the cache, as nearDupComponentsOnIndex does.
    jaccardOnCandidates(candidateShingles(shingles, pairs, idCol),
      pairs, idCol)

  /** The shingle table semi-filtered to docs appearing in `pairs` — the
    * only rows the Jaccard verify touches. Split out so callers can own
    * (cache/unpersist) it explicitly. */
  def candidateShingles(shingles: DataFrame, pairs: DataFrame,
      idCol: String): DataFrame = {
    val candIds = pairs.select(col("doc_a").as(idCol))
      .union(pairs.select(col("doc_b").as(idCol))).distinct()
    shingles.join(candIds, Seq(idCol), "left_semi")
  }

  /** Per-doc shingle-hash SET rows: (id, _hs sorted array<long>, n) —
    * the lightweight per-doc proxy the array-kernel Jaccard verify
    * joins against ([[jaccardOnSets]]). One hash-agg over the shingle
    * table; on the persisted doc_id-bucketed layout the groupBy is
    * exchange-free. Arrays are doc-sized (bounded by document length),
    * never corpus-sized. */
  def docShingleSets(sh: DataFrame, idCol: String): DataFrame =
    sh.groupBy(col(idCol)).agg(
      sort_array(collect_list(col("h"))).as("_hs"),
      count(lit(1)).as("n"))

  /** Jaccard verify over prebuilt per-doc set rows (see
    * [[docShingleSets]]); the caller controls the sets frame's caching
    * (it feeds BOTH probe sides). Row-local intersection via the
    * sorted-merge kernel — join-multiplicity-exact vs the former
    * pair×shingle expansion join + re-aggregation, at |pairs| rows
    * shuffled instead of |pairs|·|set| (guide §2.3: shuffle the per-doc
    * array once, decide row-locally). Pairs with an empty intersection
    * drop out (the expansion join's inner semantics). */
  def jaccardOnSets(sets: DataFrame, pairs: DataFrame,
      idCol: String): DataFrame = {
    import graft.expr.VectorKernels.sorted_intersect_count
    pairs
      .join(sets.select(col(idCol).as("doc_a"), col("_hs").as("_ha"),
        col("n").as("n_a")), Seq("doc_a"))
      .join(sets.select(col(idCol).as("doc_b"), col("_hs").as("_hb"),
        col("n").as("n_b")), Seq("doc_b"))
      .withColumn("n_inter", sorted_intersect_count(col("_ha"), col("_hb")))
      .where(col("n_inter") >= 1)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_a"),
        col("n_b"))
      .withColumn("jaccard",
        col("n_inter").cast("double")
          / (col("n_a") + col("n_b") - col("n_inter")))
  }

  /** Jaccard verify over a pre-filtered candidate-shingle table (see
    * [[candidateShingles]]); the caller controls its caching. The sets
    * frame built here feeds both probe sides of [[jaccardOnSets]] —
    * cached with the same harness-clearCache convention as
    * [[jaccardForPairs]]' candidate cache; owner-controlled callers
    * build [[docShingleSets]] themselves. */
  def jaccardOnCandidates(sh: DataFrame, pairs: DataFrame,
      idCol: String): DataFrame =
    jaccardOnSets(docShingleSets(sh, idCol).cache(), pairs, idCol)

  /** EXACT-recall set-similarity self-join via PREFIX FILTERING (the
    * AllPairs/SSJoin family — Chaudhuri et al. ICDE'06, Bayardo et al.
    * WWW'07): every pair of docs with shingle-set Jaccard ≥ `threshold`,
    * with no probabilistic misses. The deterministic complement to the
    * MinHash-LSH path: LSH buys a smaller candidate set at the price of
    * band-collision recall; the prefix filter is LOSSLESS — if
    * J(A,B) ≥ t then |A∩B| ≥ ⌈t·|A|⌉, so the globally-rarest common
    * shingle sits within the first |A| − ⌈t·|A|⌉ + 1 of A's shingles
    * under the (document-frequency, hash) order — and within B's prefix
    * by the symmetric argument — hence the equi-join on prefix shingles
    * cannot skip a qualifying pair.
    *
    * Scale posture: ordering by ASCENDING document frequency puts the
    * rarest (most selective) shingles in the prefixes, which is exactly
    * what keeps the candidate join's buckets small; the join itself is
    * [[bandJoin]] (band 0, key = shingle hash), so the hot-bucket valve
    * caps any degenerate boilerplate shingle identically in both
    * engines. Verification reuses the inverted-index Jaccard
    * ([[jaccardForPairs]]) over candidate docs only.
    *
    * Audit-vs-production contract (measured, SCALE.md r14): this
    * LOSSLESS form is the AUDIT — its cost grows with the intrinsic
    * pair volume (5.8× at a 10× decade on near-uniform doc lengths);
    * the PRODUCTION recall monitor at 100 TB is the sampled form
    * (q338's 10 % sample: 1.4× per decade, trunk-dominated — the p²
    * discount quarters the pair volume per halving of the sample).
    *
    * Cache lifecycle:
    * the shingle table is cached here with the same harness-clearCache
    * convention as [[jaccardForPairs]] (it feeds the df counts, sizes,
    * prefixes, and the verify). */
  def prefixFilterPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame =
    prefixFilterPairsOnShingles(shingleTable(docs, idCol, textCol).cache(),
      idCol, threshold)

  /** [[prefixFilterPairs]] over a PREBUILT shingle table — the seam the
    * persisted bucketed shingle layout reads through (a production
    * corpus shingles once; the audit re-reads the parquet). The caller
    * owns `sh`'s lifecycle: pass a cached frame when it is a fresh
    * in-memory build, or the persisted table directly (its four
    * consumers here — df counts, sizes, prefixes, verify — are cheap
    * re-scans of a bucketed parquet table). */
  def prefixFilterPairsOnShingles(sh: DataFrame, idCol: String,
      threshold: Double): DataFrame =
    // the per-doc set rows double as the AllPairs SIZE table (n = the
    // former sizes agg) and both verify probes — built once, cached
    // with the harness-clearCache convention; owner-controlled callers
    // (q262's shared-branch audit) build them once for several verifies
    prefixFilterPairsWithSets(sh, docShingleSets(sh, idCol).cache(),
      idCol, threshold)

  /** [[prefixFilterPairsOnShingles]] with PREBUILT per-doc set rows
    * ([[docShingleSets]]) — the seam that lets an audit computing
    * several Jaccard verifies over the same shingle table (q262: the
    * LSH branch and the exact branch) build the set rows once. `sets`
    * supplies both the size filter and the verify probes; the caller
    * owns its lifecycle. */
  def prefixFilterPairsWithSets(sh: DataFrame, sets: DataFrame,
      idCol: String, threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      "threshold must be in (0,1]")
    val dfreq = sh.groupBy(col("h")).agg(count(lit(1)).as("_df"))
    val sizes = sets.select(col(idCol), col("n").as("_n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("_df"), col("h"))
    val prefix = sh.join(dfreq, "h")
      .withColumn("_rn", row_number().over(w))
      .join(sizes, idCol)
      .where(col("_rn") <=
        col("_n") - ceil(lit(threshold) * col("_n")) + 1)
      .select(col(idCol), lit(0).as("band"), col("h").as("bk"))
    // Note: the classic AllPairs SIZE filter (prune pairs with
    // min(|A|,|B|) < t·max before verifying) was tried and MEASURED
    // SLOWER here (9.4 s vs 7.9 s at sf0.1): on near-uniform doc
    // lengths it prunes ~24% of candidates but costs two extra joins
    // against the size table. Re-add it for corpora with heavy length
    // skew, where it prunes most of the candidate set.
    val cand = bandJoin(prefix, idCol, "doc_a", "doc_b")
    jaccardOnSets(sets, cand, idCol)
      .filter(col("jaccard") >= threshold)
  }

  /** 60-bit SimHash over distinct token hashes: one wide hash-agg (60
    * per-bit signed sums), then bit reassembly — no row explosion. */
  val SimhashBits = 60
  /** Incremental (delta) near-dup detection against a persisted LSH
    * index — the daily-ETL shape at 100 TB: the base corpus is NOT
    * re-shingled or re-hashed; only the delta slice is, and its band
    * keys probe the stored index. Candidates are CROSS-side band
    * collisions (delta × base) verified by exact shingle Jaccard —
    * delta-internal dups are [[lshCandidatePairs]] on the delta alone,
    * deliberately not conflated here.
    *
    * `baseBands`/`baseShingles` are the persisted index tables (band
    * keys from [[bandTable]], shingle hashes from [[shingleTable]] —
    * both pure functions of content, so append-only under corpus
    * growth). The hot-bucket valve caps each side's buckets
    * independently at `maxBucket` (the stored index prunes once at
    * build time; the delta prunes per run) — mirrored in the oracle via
    * [[MaxBucket]] as everywhere else. */
  def deltaNearDupsOnIndex(baseBands: DataFrame, baseShingles: DataFrame,
      delta: DataFrame, idCol: String, textCol: String,
      minJaccard: Double, maxBucket: Long = MaxBucket): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bk"))
    def prune(t: DataFrame) = t
      .withColumn("_n", count(lit(1)).over(win))
      .filter(col("_n") <= maxBucket)
      .select(col(idCol), col("band"), col("bk"))
    val deltaShingles = shingleTable(delta, idCol, textCol)
    val deltaBands = bandTable(minhashFromShingles(deltaShingles, idCol),
      idCol)
    val cand = prune(deltaBands).select(col(idCol).as("doc_a"),
        col("band"), col("bk"))
      .join(prune(baseBands).select(col(idCol).as("doc_b"),
        col("band"), col("bk")), Seq("band", "bk"))
      .select("doc_a", "doc_b").distinct()
    jaccardForPairs(deltaShingles.unionByName(baseShingles), cand, idCol)
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a").as("doc_new"), col("doc_b").as("doc_base"),
        col("n_inter"), col("n_a").as("n_new"), col("n_b").as("n_base"),
        col("jaccard"))
  }

  /** Convenience twin of [[deltaNearDupsOnIndex]] that builds the base
    * index inline — for tests, oracles, and first-run bootstrap; a real
    * incremental pipeline persists the index and calls the core. */
  def deltaNearDups(base: DataFrame, delta: DataFrame, idCol: String,
      textCol: String, minJaccard: Double,
      maxBucket: Long = MaxBucket): DataFrame = {
    val baseShingles = shingleTable(base, idCol, textCol)
    deltaNearDupsOnIndex(
      bandTable(minhashFromShingles(baseShingles, idCol), idCol),
      baseShingles, delta, idCol, textCol, minJaccard, maxBucket)
  }

  /** Sorted-neighborhood dedup (Hernández & Stolfo, "The merge/purge
    * problem for large databases", SIGMOD 1995): sort the corpus by a
    * short derived key (here the first `keyLen` chars of the normalized
    * text), slide a window of `w` consecutive rows, verify every
    * in-window pair by exact shingle Jaccard, and keep pairs ≥
    * `minJaccard`. The sort-based complement to the hash-based blockers:
    * MinHash/SimHash bucket on CONTENT fragments, SNM on sort-order
    * LOCALITY — it catches near-dups whose prefixes agree (clerical
    * variants, re-crawls with appended noise) with w·n candidate pairs,
    * and misses pairs whose keys sort apart (that recall gap is the
    * method; multi-pass SNM re-runs with a different key).
    *
    * Scale shape: the global rank is the two-level numbering scheme
    * ([[graft.ops.Pack]]'s pattern) — value-banded by the key's first
    * character: per-band counts roll to running offsets on the
    * ≤|alphabet| band table (tiny by construction), rank = offset +
    * per-band row_number, so no single task ever sorts the corpus. The
    * truncated key bounds the shuffle payload (the full text never
    * enters the sort). In-window pairs come from an equi-join on
    * ⌊rank/w⌋ blocks (+1 overflow block — a gap ≤ w−1 spans at most one
    * boundary), NOT a rank-inequality theta join. Skew note: the band
    * split follows the key's first-character distribution; a corpus
    * where most docs share one first char degrades toward one band —
    * acceptable because the band only carries the window sort, not the
    * verify. */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String,
      textCol: String, w: Int, minJaccard: Double,
      keyLen: Int = 24): DataFrame =
    sortedNeighborhoodPairsOnShingles(df,
      shingleTable(df, idCol, textCol), idCol, textCol, w, minJaccard,
      keyLen)

  /** [[sortedNeighborhoodPairs]] with the Jaccard verify over a
    * PREBUILT shingle table — the persisted-layout seam. The SNM sort
    * key is a cheap one-pass prefix scan of the raw corpus, but the
    * verify previously re-ran the whole normalize→tokenize→shingle→
    * hash pipeline per query; a production corpus shingles once
    * (`Tables.docShingleTable`) and SNM verifies against the persisted
    * bucketed frame. Caller owns the shingle frame's lifecycle. */
  def sortedNeighborhoodPairsOnShingles(df: DataFrame,
      shingles: DataFrame, idCol: String, textCol: String, w: Int,
      minJaccard: Double, keyLen: Int = 24): DataFrame = {
    val cand = snmCandidates(df, idCol, textCol, w, keyLen)
    jaccardForPairs(shingles, cand.select("doc_a", "doc_b"), idCol)
      .filter(col("jaccard") >= minJaccard)
      .join(cand, Seq("doc_a", "doc_b"))
      .select(col("doc_a"), col("doc_b"), col("rank_gap"),
        col("jaccard"))
  }

  /** SNM candidate pairs BEFORE the similarity verify — the blocking
    * stage alone (doc_a, doc_b, rank_gap with gap ≤ w−1), shared by
    * [[sortedNeighborhoodPairs]] and [[blockingQualityAudit]]. */
  private[graft] def snmCandidates(df: DataFrame, idCol: String,
      textCol: String, w: Int, keyLen: Int = 24): DataFrame = {
    require(w >= 2, "window must be >= 2")
    require(keyLen >= 1, "keyLen must be >= 1")
    val win = org.apache.spark.sql.expressions.Window
    val keyed = df.select(col(idCol),
      substring(TextOps.normalize(col(textCol)), 1, keyLen).as("_key"))
      .withColumn("_b0", substring(col("_key"), 1, 1))
    val counts = keyed.groupBy("_b0").agg(count(lit(1)).as("_n"))
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_n")).over(
        win.orderBy(col("_b0"))
          .rowsBetween(win.unboundedPreceding, -1)), lit(0L)))
      .select(col("_b0"), col("_off"))
    val ranked = keyed
      .join(broadcast(offsets), Seq("_b0"))
      .withColumn("_rn", col("_off") + row_number().over(
        win.partitionBy(col("_b0")).orderBy(col("_key"), col(idCol))))
      .select(col(idCol), col("_rn"))
    val leftSide = ranked
      .select(col(idCol).as("doc_a"), col("_rn").as("_rna"))
      .withColumn("_jb", explode(array(expr(s"_rna div $w"),
        expr(s"_rna div $w") + 1)))
    val rightSide = ranked
      .select(col(idCol).as("doc_b"), col("_rn").as("_rnb"),
        expr(s"_rn div $w").as("_jb"))
    // cached: the candidate table feeds the verify join AND the final
    // rank_gap re-join (lifecycle: cleared by the caller's clearCache,
    // same convention as jaccardForPairs)
    leftSide.join(rightSide, Seq("_jb"))
      .filter(col("_rnb") > col("_rna") &&
        col("_rnb") - col("_rna") <= w - 1)
      .select(col("doc_a"), col("doc_b"),
        (col("_rnb") - col("_rna")).as("rank_gap"))
      .cache()
  }

  /** MinHash estimator-bias audit: on the LSH candidate pairs, compare
    * the signature-agreement estimate ĵ = (#matching components)/16
    * against the EXACT shingle Jaccard, grouped by agreement count —
    * the calibration table that tells you what an LSH threshold
    * actually means in exact-Jaccard terms on YOUR corpus (the
    * estimator is unbiased per pair but candidate SELECTION conditions
    * on banding, so the observed bias per stratum is the operational
    * number). One shingle pass feeds both sides (signatures and the
    * exact verify — the q30 trunk); the match count is a fixed 16-term
    * codegen sum over the wide signature columns, never a per-pair
    * array fold. Returns one row per agreement count: est16, n_pairs,
    * est_r, mean_exact_r, mean_bias_r (ĵ − j, 12-dp-gridded sums). */
  def minhashBiasAudit(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    minhashBiasAuditOnShingles(shingleTable(df, idCol, textCol).cache(),
      idCol)

  /** [[minhashBiasAudit]] over a PREBUILT shingle table (the persisted-
    * layout seam; caller owns the frame's lifecycle). Signatures and
    * candidates are re-derived from the shingles — both are one
    * hash-agg/band-join over the (small) shingle table. */
  def minhashBiasAuditOnShingles(shingles: DataFrame,
      idCol: String): DataFrame = {
    def t12(c: Column) = round(c, 12).cast("decimal(28,12)")
    val sig = minhashFromShingles(shingles, idCol)
    val cand = lshCandidatePairs(sig, idCol)
    val exact = jaccardForPairs(shingles, cand, idCol)
    val matches = (0 until NumHashes)
      .map(j => when(col(s"_am$j") === col(s"_bm$j"), 1L).otherwise(0L))
      .reduce(_ + _)
    val sigA = sig.select(col(idCol).as("doc_a") +:
      (0 until NumHashes).map(j => col(s"m$j").as(s"_am$j")): _*)
    val sigB = sig.select(col(idCol).as("doc_b") +:
      (0 until NumHashes).map(j => col(s"m$j").as(s"_bm$j")): _*)
    exact
      .join(sigA, Seq("doc_a")).join(sigB, Seq("doc_b"))
      .withColumn("_est16", matches)
      .groupBy(col("_est16").as("est16"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(t12(col("jaccard"))).cast("double").as("_sj"),
        sum(t12(col("_est16").cast("double") / NumHashes
          - col("jaccard"))).cast("double").as("_sb"))
      .select(col("est16"), col("n_pairs"),
        round(col("est16").cast("double") / NumHashes, 6).as("est_r"),
        round(col("_sj") / col("n_pairs").cast("double"), 6)
          .as("mean_exact_r"),
        round(col("_sb") / col("n_pairs").cast("double"), 6)
          .as("mean_bias_r"))
      .orderBy(col("est16"))
  }

  /** UNSUPERVISED Fellegi–Sunter parameter estimation by EM (Winkler
    * 1988) — q397's weights WITHOUT the ground-truth label: over the
    * SNM candidate pairs' comparison vectors (source/lang/length
    * agreement), fit the two-class independent-Bernoulli mixture
    *   P(γ) = p·Π m_j^{γ_j}(1−m_j)^{1−γ_j}
    *        + (1−p)·Π u_j^{γ_j}(1−u_j)^{1−γ_j}
    * with `iters` fixed EM steps from the deterministic
    * (p₀, m₀, u₀) start. Responsibilities and the per-feature M-step
    * rates are 12-dp-re-rounded each step (the plattScaling
    * discipline), so both engines walk the same trajectory. All
    * E/M work lives on the SNM pair frame (w·n pairs). Returns one row
    * per feature: (feature, n_pairs, p_match_r, m_r, u_r, w_agree_r,
    * w_disagree_r). */
  def fellegiSunterEm(docs: DataFrame, idCol: String, textCol: String,
      w: Int, iters: Int, p0: Double = 0.05, m0: Double = 0.9,
      u0: Double = 0.3): DataFrame = {
    val cand = snmCandidates(docs, idCol, textCol, w)
    val meta = docs.select(col(idCol), col("source"), col("lang"),
      col("n_chars"))
    // The EM's sufficient statistics are fully determined by the COUNTS
    // of the 8 possible (f1, f2, f3) agreement patterns — per-pattern g
    // is constant, and every per-row t12 term is the same decimal
    // repeated count times. ONE data-sized pass reduces the pair stream
    // to this ≤ 2³-row contingency; the recursion then runs
    // DRIVER-LOCAL on it (the round-13 bounded-state posture —
    // bradleyTerry/powerIterLocal — replacing `iters` checkpoint +
    // crossJoin + full-pair-rescan jobs with arithmetic on 8 numbers).
    // Every float op replays the engine expressions exactly: HALF_UP
    // 12-dp rounds, decimal(28,12) sums via exact BigDecimal × count,
    // the same left-associated products — the unrolled oracle CTE chain
    // walks the identical trajectory (FsEmParitySpec pins the old
    // relational recursion against this port).
    val combos: Array[(Boolean, Boolean, Boolean, Long)] = cand
      .join(meta.select(col(idCol).as("doc_a"),
        col("source").as("_sa"), col("lang").as("_la"),
        col("n_chars").as("_ca")), Seq("doc_a"))
      .join(meta.select(col(idCol).as("doc_b"),
        col("source").as("_sb"), col("lang").as("_lb"),
        col("n_chars").as("_cb")), Seq("doc_b"))
      .select((col("_sa") === col("_sb")).as("f1"),
        (col("_la") === col("_lb")).as("f2"),
        (abs(col("_ca") - col("_cb")) <= 2).as("f3"))
      .groupBy(col("f1"), col("f2"), col("f3"))
      .agg(count(lit(1)).as("_cnt"))
      .collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2),
        r.getLong(3)))
    def r12(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(12, java.math.RoundingMode.HALF_UP).doubleValue()
    // t12(double) as decimal(28,12): HALF_UP 12-dp round of the double,
    // then the exact decimal of that value (Similarity.t12Local's form)
    def t12d(x: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(r12(x)).setScale(12,
        java.math.RoundingMode.HALF_UP)
    val nPairs = combos.map(_._4).sum
    var p = p0
    var m3v = Array(m0, m0, m0)
    var u3v = Array(u0, u0, u0)
    if (nPairs > 0) for (_ <- 1 to iters) {
      val zero = java.math.BigDecimal.ZERO
      var sg = zero
      val gs = Array(zero, zero, zero)
      val hs = Array(zero, zero, zero)
      combos.foreach { case (f1, f2, f3, cnt) =>
        val fs = Array(f1, f2, f3)
        def lik(v: Array[Double], j: Int): Double =
          if (fs(j)) v(j) else 1.0 - v(j)
        val pm = lik(m3v, 0) * lik(m3v, 1) * lik(m3v, 2)
        val pu = lik(u3v, 0) * lik(u3v, 1) * lik(u3v, 2)
        val g = r12(p * pm / (p * pm + (1.0 - p) * pu))
        val c = java.math.BigDecimal.valueOf(cnt)
        sg = sg.add(t12d(g).multiply(c))
        (0 until 3).foreach { j =>
          if (fs(j)) {
            gs(j) = gs(j).add(t12d(g).multiply(c))
            hs(j) = hs(j).add(t12d(1.0 - g).multiply(c))
          }
        }
      }
      val nD = nPairs.toDouble
      val sgD = sg.doubleValue()
      p = r12(sgD / nD)
      m3v = gs.map(g => r12(g.doubleValue() / sgD))
      u3v = hs.map(h => r12(h.doubleValue() / (nD - sgD)))
    }
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def r6opt(cond: Boolean, x: => Double): Option[Double] =
      if (nPairs > 0 && cond) Some(r6(x)) else None
    val sp = docs.sparkSession
    import sp.implicits._
    Seq(("f_source", 0), ("f_lang", 1), ("f_len", 2)).map {
      case (f, j) =>
        val (mj, uj) = (m3v(j), u3v(j))
        (f, nPairs,
          if (nPairs > 0) Some(r6(p)) else None,
          if (nPairs > 0) Some(r6(mj)) else None,
          if (nPairs > 0) Some(r6(uj)) else None,
          r6opt(mj > 0 && uj > 0, math.log(mj / uj)),
          r6opt(mj < 1 && uj < 1, math.log((1.0 - mj) / (1.0 - uj))))
    }.toDF("feature", "n_pairs", "p_match_r", "m_r", "u_r",
      "w_agree_r", "w_disagree_r").orderBy("feature")
  }

  /** Blocking-quality audit (entity-resolution methodology, Christen
    * 2012): how good is a blocking scheme BEFORE the expensive verify?
    *  - reduction ratio  RR = 1 − |candidates| / C(N,2) — how much of
    *    the quadratic comparison space the blocking avoids;
    *  - pair completeness PC = |true pairs ∩ candidates| / |true pairs|
    *    — the recall of the blocking against ground truth.
    * Ground truth here = exact-content duplicate pairs (same md5 of the
    * text), the one label a corpus carries for free; candidates = the
    * [[snmCandidates]] window blocking. Both sides stay relational:
    * true pairs come from the same keeper-grouping hash-agg as
    * [[exactDupGroups]] (pairs materialize only WITHIN a content-hash
    * group — never across), and the intersection is one equi-join on
    * (doc_a, doc_b). All counts exact BIGINTs; C(N,2) on DECIMAL(38,0)
    * stays exact past 2 billion docs. Returns one row: n_docs,
    * n_true_pairs, n_cand_pairs, n_found_pairs, rr_r, pc_r. */
  def blockingQualityAudit(df: DataFrame, idCol: String,
      textCol: String, w: Int, keyLen: Int = 24): DataFrame = {
    val cand = snmCandidates(df, idCol, textCol, w, keyLen)
    // true duplicate pairs: ordered (a < b) pairs within a content group
    val hashed = df.select(col(idCol).as("_id"),
      md5(col(textCol)).as("_h"))
    val truePairs = hashed.select(col("_id").as("doc_a"), col("_h"))
      .join(hashed.select(col("_id").as("doc_b"), col("_h")), Seq("_h"))
      .filter(col("doc_b") > col("doc_a"))
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint() // consumed by the count AND the intersection
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val nTrue = truePairs.agg(count(lit(1)).as("n_true_pairs"))
    val nCand = cand.agg(count(lit(1)).as("n_cand_pairs"))
    val nFound = truePairs.join(cand.select("doc_a", "doc_b"),
        Seq("doc_a", "doc_b"), "left_semi")
      .agg(count(lit(1)).as("n_found_pairs"))
    def d38(c: Column) = c.cast("decimal(38,0)")
    nDocs.crossJoin(broadcast(nTrue)).crossJoin(broadcast(nCand))
      .crossJoin(broadcast(nFound))
      .select(col("n_docs"), col("n_true_pairs"), col("n_cand_pairs"),
        col("n_found_pairs"),
        round(lit(1.0) - col("n_cand_pairs").cast("double")
          / (d38(col("n_docs")) * (col("n_docs") - 1) / 2)
            .cast("double"), 6).as("rr_r"),
        round(col("n_found_pairs").cast("double")
          / nullif(col("n_true_pairs").cast("double"), lit(0.0)), 6)
          .as("pc_r"))
  }

  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // per-doc token dedup is row-local (array_distinct) — no shuffle
    val tok = df
      .select(col(idCol),
        explode(array_distinct(TextOps.tokens(TextOps.normalize(col(textCol)))))
          .as("tok"))
      .withColumn("h", TextOps.hash60(col("tok")))
    val bitSums = (0 until SimhashBits).map { i =>
      sum(expr(s"CASE WHEN shiftright(h, $i) & 1 = 1 THEN 1 ELSE -1 END")).as(s"s$i")
    }
    val assembled = (0 until SimhashBits)
      .map(i => expr(s"CASE WHEN s$i > 0 THEN ${1L << i}L ELSE 0L END"))
      .reduce(_ + _)
    tok.groupBy(col(idCol))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol), assembled.as("simhash"))
  }

  /** Hamming distance between two simhash values (for near-dup grouping). */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with hamming distance ≤ `maxDist`, WITHOUT an
    * all-pairs comparison: pigeonhole banding — split the 60-bit hash
    * into maxDist+1 equal chunks; two hashes within distance maxDist
    * differ in at most maxDist chunks, so they must agree EXACTLY on at
    * least one → a chunk-keyed equi-join (through the shared
    * [[bandJoin]], same hot-bucket valve) yields a candidate superset,
    * then one exact bit_count verify prunes it. The classic
    * Manku/Jain/Sarma web-dedup shape: linear in the corpus, shuffle
    * keyed on uniform 15-bit chunks. The one-row-per-doc simhash table
    * feeds three consumers (banding + both verify probes) — cached;
    * the cache entry lives until spark.sqlContext.clearCache() (which
    * Verify/Bench call per query). Library callers composing many
    * invocations should own the cache instead: compute [[simhash]] once,
    * cache it, run [[simhashNearDupsOnTable]], and unpersist — exactly
    * what [[simhashRemovals]] does. */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame =
    simhashNearDupsOnTable(simhash(df, idCol, textCol).cache(), idCol,
      maxDist)

  /** The pigeonhole band join + exact hamming verify over an EXISTING
    * (id, simhash) table — the owner-controlled variant of
    * [[simhashNearDups]]: `sh` feeds three consumers (banding + both
    * verify probes), so the caller decides whether/how long to cache it.
    * Adds no cache or checkpoint of its own. Also the natural seam for
    * property tests: feed synthetic hashes with known pairwise distances
    * and assert the banding's exact-recall guarantee. */
  def simhashNearDupsOnTable(sh: DataFrame, idCol: String,
      maxDist: Int = 3): DataFrame = {
    val nBands = maxDist + 1
    require(SimhashBits % nBands == 0,
      s"$SimhashBits bits must split evenly into $nBands chunks")
    val bits = SimhashBits / nBands
    val mask = (1L << bits) - 1
    val bandStructs = (0 until nBands).map { b =>
      // shiftright(), not the '>>' operator: Spark 4.1's SQL parser
      // rejects '>>' (PARSE_SYNTAX_ERROR) — it is DuckDB/Postgres syntax
      s"struct($b AS band, CAST(shiftright(simhash, ${b * bits}) & ${mask}L AS STRING) AS bk)"
    }
    val bands = sh
      .select(col(idCol),
        explode(expr(s"array(${bandStructs.mkString(", ")})")).as("b"))
      .select(col(idCol), col("b.band").as("band"), col("b.bk").as("bk"))
    bandJoin(bands, idCol, "doc_a", "doc_b")
      .join(sh.select(col(idCol).as("doc_a"), col("simhash").as("ha")),
        Seq("doc_a"))
      .join(sh.select(col(idCol).as("doc_b"), col("simhash").as("hb")),
        Seq("doc_b"))
      .withColumn("hamming", hammingDist(col("ha"), col("hb")).cast("int"))
      .filter(col("hamming") <= maxDist)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Near-dup components from verified pairs — ADAPTIVE on the edge
    * count (known for free: the edge set is checkpointed either way):
    *
    *  - small graphs (≤ `smallGraphMaxEdges` directed edges, i.e. what
    *    LSH+verify yields on anything but a pathologically duplicated
    *    corpus — verified near-dup pairs are sparse by construction): an
    *    exact single-pass union-find on ONE executor partition. One
    *    narrow job, no iteration, no per-round checkpoint/count jobs.
    *  - large graphs: min-label propagation WITH POINTER JUMPING
    *    (label ← label(label) each round, the Shiloach–Vishkin
    *    shortcut) run TO THE FIXPOINT — the loop stops when a round
    *    lowers zero labels, so every node ends with the true component
    *    minimum no matter how long the duplicate chain is (a fixed
    *    round count would split a chain longer than its iteration
    *    budget into multiple "keepers" and silently under-remove).
    *    Rounds needed = O(log diameter), NOT diameter — a 100-link dup
    *    chain converges in ~7 rounds, not 100; `maxIters` is only a
    *    runaway guard. Rounds-to-fixpoint is exported via the session
    *    conf `spark.graft.dedup.lastComponentsRounds` (read by
    *    [[graft.tools.ComponentsProbe]]).
    *
    * Both paths return (node, label), label = min doc id in the
    * component, and are asserted identical in DedupSpec.
    *
    * The gate is tunable WITHOUT a code change via the session config
    * `spark.graft.dedup.unionFindMaxEdges` (directed-edge count,
    * default 2^20): a deployment whose executors have more/less task
    * memory than the default assumes can move the single-task
    * union-find boundary per job. An explicit `smallGraphMaxEdges ≥ 0`
    * argument wins over the config (the sentinel −1 means "read the
    * config").
    * Returns (node, label) where label = min doc id in the component. */
  def nearDupComponents(pairs: DataFrame, maxIters: Int = 50,
      smallGraphMaxEdges: Long = -1L,
      knownPairCount: Option[Long] = None): DataFrame = {
    val maxEdges =
      if (smallGraphMaxEdges >= 0L) smallGraphMaxEdges
      else pairs.sparkSession.conf
        .get("spark.graft.dedup.unionFindMaxEdges", (1L << 20).toString)
        .toLong
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    // Path choice needs the edge count. When the caller already counted
    // the pair set (nearDupRemovals counts its checkpointed pairs anyway
    // for the emptiness gate), reuse it — directed edges = 2 × pairs —
    // instead of running a checkpoint + count job pair just to decide.
    // With a known-small count, union-find reads the edges exactly once
    // off the caller's (checkpointed) pairs, so no extra checkpoint.
    val nEdges = knownPairCount.map(_ * 2).getOrElse(-1L)
    if (nEdges >= 0 && nEdges <= maxEdges)
      return smallGraphComponents(edges)
    // Iterative algorithms MUST truncate lineage each round: every
    // generation references the previous one twice, so the LOGICAL plan
    // (not just the computation) doubles per iteration — 2^iters copies
    // of the whole upstream pipeline sent through the analyzer. cache()
    // does not cut lineage; localCheckpoint() does (eager, plan replaced
    // by the materialized blocks).
    val edgesCk = edges.localCheckpoint()
    if (nEdges < 0 && edgesCk.count() <= maxEdges)
      return smallGraphComponents(edgesCk)
    var labels = edgesCk.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint()
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxIters) {
      val neighborMin = edgesCk
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(min(col("label")).as("nlabel"))
      val prop = labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"), col("label").as("prev"),
          least(col("label"), coalesce(col("nlabel"), col("label")))
            .as("label"))
      // pointer jumping (Shiloach–Vishkin shortcut): label ← label(label).
      // Plain neighbor-min propagation needs DIAMETER rounds — a
      // 100-link duplicate chain would take 100 shuffle rounds; halving
      // the label-chain depth each round makes it O(log diameter)
      // (measured: q81's simhash graph 9 → 4 rounds,
      // tools/bench_r10_components_*.json). Every label value is itself
      // a node id (labels only ever move to other nodes' ids), so the
      // lookup self-join always matches; the extra join is node-sized,
      // not edge-sized.
      val stepped = prop.join(
          prop.select(col("node").as("label"), col("label").as("_jl")),
          Seq("label"), "left")
        .select(col("node"), col("prev"),
          least(col("label"), coalesce(col("_jl"), col("label")))
            .as("label"))
        .localCheckpoint()
      // convergence check is a cheap count over the just-materialized
      // blocks — both steps are monotone (labels only decrease, always
      // to ids of same-component nodes), so zero lowered labels means
      // label(u) ≤ label(v) for every edge (u,v); by edge symmetry the
      // label is then constant per component, and the component min m
      // can never move (no smaller id exists), so the constant is m
      changed = stepped.filter(col("label") < col("prev")).count()
      labels = stepped.select("node", "label")
      round += 1
    }
    require(changed == 0,
      s"nearDupComponents did not converge within $maxIters rounds")
    // observable convergence: rounds-to-fixpoint = graph diameter; the
    // scale probes read this back (SCALE.md fallback table) and a
    // deployment can alert on it without log scraping
    pairs.sparkSession.conf
      .set("spark.graft.dedup.lastComponentsRounds", round.toString)
    labels
  }

  /** Exact connected components via union-find over an edge set small
    * enough for one partition. Task memory is driven by the DISTINCT
    * NODE count (the parent map), not the edge count — edges stream
    * through the iterator once. Worst case (a perfect matching) is one
    * node per directed edge, so the ≤ 2^20 default bounds the boxed map
    * at ~1M entries (~100-200 MB even with md5-string keys); real dup
    * graphs have far fewer nodes than edges, which is what makes them
    * dup graphs. The edges are read exactly once, so the caller may pass
    * either a checkpointed frame or a short-lineage derivation.
    * Runs executor-side as a single narrow task — NOT a driver collect —
    * with union-by-min (attach the larger root under the smaller), so
    * each root IS the component minimum, plus path compression. Key type
    * stays generic: anything with a Comparable runtime value (long ids,
    * md5 strings) works, matching the propagation path's `min`
    * semantics. */
  private def smallGraphComponents(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StructField, StructType}
    val idType = edges.schema("src").dataType
    val schema = StructType(Seq(
      StructField("node", idType), StructField("label", idType)))
    val rows = edges.rdd.coalesce(1).mapPartitions { it =>
      val parent = scala.collection.mutable.HashMap.empty[Any, Any]
      def cmp(a: Any, b: Any): Int =
        a.asInstanceOf[Comparable[Any]].compareTo(b)
      def find(x: Any): Any = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      it.foreach { row =>
        val s = row.get(0); val d = row.get(1)
        parent.getOrElseUpdate(s, s); parent.getOrElseUpdate(d, d)
        val rs = find(s); val rd = find(d)
        if (rs != rd) {
          if (cmp(rs, rd) <= 0) parent(rd) = rs else parent(rs) = rd
        }
      }
      parent.keysIterator.map(n => Row(n, find(n)))
    }
    edges.sparkSession.createDataFrame(rows, schema)
  }

  /** The shared LSH-dedup trunk: candidates → Jaccard verify at
    * `threshold` → connected components of the verified-pair graph,
    * returned as (node, label). Docs in no verified pair are absent
    * (singletons are not graph nodes). The verified edge set is
    * materialized once (localCheckpoint) and counted ONCE off the
    * materialized blocks — that single count serves both the emptiness
    * short-circuit and nearDupComponents' small-vs-large path choice, so
    * no separate isEmpty job or second checkpoint/count pair runs. All
    * three pipeline caches are unpersisted deterministically before
    * returning. [[nearDupRemovals]] and [[nearDupClusterHistogram]] are
    * thin rollups over this. */
  def nearDupComponentsOf(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val shingles = shingleTable(docs, idCol, textCol).cache()
    val comps = nearDupComponentsOnIndex(shingles,
      bandTable(minhashFromShingles(shingles, idCol), idCol),
      idCol, threshold)
    shingles.unpersist()
    comps
  }

  /** The components trunk over PREBUILT shingle + band tables — the
    * persisted-layout seam ([[nearDupComponentsOf]] builds both inline;
    * a production corpus persists them once — shingles bucketed by doc
    * id, bands by band key — and every dedup/audit run reads the
    * parquet). Caller owns the input frames' lifecycles. */
  def nearDupComponentsOnIndex(shingles: DataFrame, bands: DataFrame,
      idCol: String, threshold: Double): DataFrame = {
    val cand = bandJoin(bands, idCol, "doc_a", "doc_b").cache()
    // own the candidate SET-row cache (vs jaccardOnCandidates' internal
    // one, which only a harness clearCache reclaims): the per-doc set
    // rows feed both probe sides of the verify; the verified pairs are
    // localCheckpoint-materialized by count() below, after which the
    // caches are dead weight and unpersisted deterministically.
    val candSets = docShingleSets(
      candidateShingles(shingles, cand, idCol), idCol).cache()
    val verified = jaccardOnSets(candSets, cand, idCol)
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b").localCheckpoint()
    val nPairs = verified.count()
    val comps =
      if (nPairs == 0L)
        verified.select(col("doc_a").as("node"), col("doc_a").as("label"))
          .limit(0)
      else nearDupComponents(verified, knownPairCount = Some(nPairs))
    cand.unpersist()
    candSets.unpersist()
    comps
  }

  /** [[nearDupRemovals]] over the persisted index tables. */
  def nearDupRemovalsOnIndex(shingles: DataFrame, bands: DataFrame,
      idCol: String, threshold: Double): DataFrame =
    nearDupComponentsOnIndex(shingles, bands, idCol, threshold)
      .filter(col("label") < col("node"))
      .select(col("node").as(idCol))

  /** [[nearDupClusterHistogram]] over the persisted index tables. */
  def nearDupClusterHistogramOnIndex(shingles: DataFrame,
      bands: DataFrame, idCol: String, threshold: Double): DataFrame =
    nearDupComponentsOnIndex(shingles, bands, idCol, threshold)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))

  /** The end-to-end corpus dedup: [[nearDupComponentsOf]] → drop every
    * non-keeper member (keeper = each cluster's min id). Returns the ids
    * of REMOVED docs (kept = corpus minus these). */
  def nearDupRemovals(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame =
    nearDupComponentsOf(docs, idCol, textCol, threshold)
      .filter(col("label") < col("node"))
      .select(col("node").as(idCol))

  /** Dedup REPORT: distribution of near-dup cluster sizes —
    * (cluster_size, n_clusters) for clusters of size ≥ 2. The number a
    * curation run actually reviews before committing to a removal list
    * (a corpus whose mass sits in a few giant clusters wants a
    * different threshold than one of scattered pairs). Two tiny rollups
    * over the component labels; cost is [[nearDupComponentsOf]]. */
  def nearDupClusterHistogram(docs: DataFrame, idCol: String,
      textCol: String, threshold: Double): DataFrame =
    nearDupComponentsOf(docs, idCol, textCol, threshold)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))

  /** The SimHash end-to-end corpus dedup — the cheap alternative to the
    * MinHash path of [[nearDupRemovals]] (one wide aggregate per doc, no
    * shingle explosion): simhash → pigeonhole band join → exact hamming
    * verify ≤ `maxDist` → connected components → drop every non-keeper
    * member. Returns the ids of REMOVED docs.
    *
    * Same lifecycle discipline as [[nearDupRemovals]]: the simhash table
    * is cached HERE (it feeds banding + both verify probes) and
    * unpersisted deterministically; the verified edge set is
    * localCheckpoint-materialized and counted ONCE, the count serving
    * both the emptiness short-circuit and nearDupComponents'
    * union-find-vs-propagation choice. The components machinery is
    * family-agnostic — this path reuses [[nearDupComponents]] unchanged. */
  def simhashRemovals(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val sh = simhash(docs, idCol, textCol).cache()
    // the verified edge set is checkpoint-materialized inside
    // simhashRemovalsOnTable before this returns, so the unpersist
    // cannot re-trigger the signature pipeline
    val removed = simhashRemovalsOnTable(sh, idCol, maxDist)
    sh.unpersist()
    removed
  }

  /** [[simhashRemovals]] over an EXISTING (id, simhash) table — the
    * persisted-layout seam (q81 reads `Tables.docSimhashTable`; caller
    * owns the frame's lifecycle). The verified edge set is
    * localCheckpoint-materialized and counted ONCE, the count serving
    * both the emptiness short-circuit and nearDupComponents'
    * union-find-vs-propagation choice. */
  def simhashRemovalsOnTable(sh: DataFrame, idCol: String,
      maxDist: Int = 3): DataFrame = {
    val pairs = simhashNearDupsOnTable(sh, idCol, maxDist)
      .select("doc_a", "doc_b").localCheckpoint()
    val nPairs = pairs.count()
    if (nPairs == 0L) pairs.select(col("doc_a").as(idCol)).limit(0)
    else nearDupComponents(pairs, knownPairCount = Some(nPairs))
      .filter(col("label") < col("node"))
      .select(col("node").as(idCol))
  }

  /** Cross-document duplicated word-k-grams — the exact SUBSTRING-level
    * duplication signal (document-level dedup misses boilerplate repeated
    * inside otherwise-distinct pages; repeated long n-grams are the unit
    * the "dedup the training data" line of work removes). Emits every
    * k-gram appearing in at least `minDocs` distinct documents with its
    * document and occurrence counts.
    *
    * Shape: instance k-grams (NOT per-doc distinct — occurrence counts
    * are part of the signal) → TWO stacked hash-aggs, both keyed on the
    * gram: (gram, doc) partial counts first, then the per-gram rollup.
    * Stacking keeps every reduction map-side-combinable — the (gram, doc)
    * agg shrinks repeated-within-doc grams before the shuffle, and the
    * second agg is a near-free regroup of the first's output (same key
    * prefix). A single `countDistinct(doc)` agg would plan an Expand
    * (2× the shuffle rows) for no benefit. At 100 TB the shuffle key
    * would be `hash60(gram)` with `min(gram)` as exemplar to narrow the
    * exchange rows; here the gram string stays the key so the oracle is
    * exact (no collision caveat). */
  def duplicatedNGrams(df: DataFrame, idCol: String, textCol: String,
      k: Int, minDocs: Int = 2): DataFrame = {
    val perDoc = df
      .select(col(idCol),
        TextOps.tokens(TextOps.normalize(col(textCol))).as("_toks"))
      .select(col(idCol),
        explode(expr(kGramExpr("_toks", k, distinct = false))).as("gram"))
      .groupBy(col("gram"), col(idCol))
      .agg(count(lit(1)).as("n_in_doc"))
    perDoc.groupBy(col("gram"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_in_doc")).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Per-document duplicated-n-gram COVERAGE — the fraction of each
    * document's token positions lying inside at least one k-gram that
    * also appears in another document. This is the actionable form of
    * [[duplicatedNGrams]]: "60% of this page is boilerplate shared with
    * other pages" is the filter/trim signal substring-level dedup acts
    * on (document-hash dedup scores the same page 0).
    *
    * Shape: positional instance grams (posexplode — position matters,
    * so no distinct) → equi-join on the gram against the duplicated-gram
    * set (semi-join: only membership matters) → each surviving gram
    * instance covers token positions [pos, pos+k); the union of covered
    * positions is |distinct (doc, position)| — an explode bounded by k
    * per gram instance, then one distinct+count keyed by doc. Every join
    * is an equi-join on gram or doc; nothing is quadratic. Docs shorter
    * than k, or with no shared grams, report coverage 0 via the final
    * left join. */
  def dupNGramCoverage(df: DataFrame, idCol: String, textCol: String,
      k: Int, minDocs: Int = 2): DataFrame = {
    val toks = df.select(col(idCol),
      TextOps.tokens(TextOps.normalize(col(textCol))).as("_toks"))
    // the positional gram table feeds BOTH the dup-set derivation and
    // the coverage semi-join — cache it so the corpus is tokenized and
    // exploded once, not twice. LIFECYCLE: harness clearCache() per
    // query (same documented convention as jaccardForPairs).
    val grams = toks.select(col(idCol),
      posexplode(expr(kGramExpr("_toks", k, distinct = false)))
        .as(Seq("pos", "gram")))
      .cache()
    // dup set from the SAME gram table ([[duplicatedNGrams]] minus the
    // re-scan): per-(gram, doc) partials, then the per-gram doc count
    val dupSet = grams
      .groupBy(col("gram"), col(idCol)).agg(count(lit(1)).as("_n"))
      .groupBy(col("gram")).agg(count(lit(1)).as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select("gram")
    val covered = grams
      .join(dupSet, Seq("gram"), "left_semi")
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("_ti"))
      .distinct()
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_covered"))
    toks.select(col(idCol), size(col("_toks")).cast("long").as("n_tokens"))
      .join(covered, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"))
      .withColumn("coverage_r",
        round(col("n_covered") / col("n_tokens"), 6))
  }

  /** SEGMENT-level exact dedup (the within-corpus repeated-passage
    * remover; Rae et al., "Scaling Language Models: … Gopher",
    * arXiv:2112.11446 §A.1.3 dedups repeated paragraphs the same
    * keep-first way): documents split into consecutive `segTokens`-token
    * segments ([[TextOps.chunkWindows]] with overlap 0); a segment
    * instance SURVIVES iff it is the first occurrence of its text
    * corpus-wide, first = smallest (doc id, segment index). Emits one row
    * per doc: segment/token totals, how many instances were dropped as
    * duplicates, and the kept-token fraction — the numbers a curation
    * pipeline thresholds on before re-assembling surviving text.
    *
    * Scale shape: first-occurrence is a groupBy(segment).min(struct) —
    * partial-aggregated map-side, so a segment repeated in millions of
    * docs (boilerplate headers) arrives at the reducer as one row per
    * map partition, NOT as a row per instance. The deliberate
    * alternative — row_number over a window partitioned by segment
    * text — has no partial agg and hands the hottest segment's entire
    * instance list to one sort task; at boilerplate skew that's the
    * difference between a flat reduce and a straggler. The join back is
    * an equi-join on the segment key (AQE-splittable on skew). */
  def segmentDedup(df: DataFrame, idCol: String, textCol: String,
      segTokens: Int): DataFrame = {
    val segs = TextOps.chunkWindows(df, idCol, textCol, segTokens, 0)
    val first = segs.groupBy(col("chunk_text"))
      .agg(min(struct(col(idCol), col("chunk_idx"))).as("_f"))
    segs.join(first, Seq("chunk_text"))
      .withColumn("_dup",
        !(col(s"_f.$idCol") === col(idCol) &&
          col("_f.chunk_idx") === col("chunk_idx")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("_dup"), 1L).otherwise(0L)).as("n_dup"),
        sum(when(col("_dup"), 0L).otherwise(col("n_tokens")))
          .as("kept_tokens"),
        sum(col("n_tokens")).as("total_tokens"))
      .withColumn("kept_r",
        round(col("kept_tokens") / col("total_tokens"), 6))
  }

  /** Fellegi–Sunter match/unmatch weights (the probabilistic
    * record-linkage foundation, 1969): over a blocked candidate-pair
    * set with ground-truth match labels, each comparison feature k
    * earns m_k = P(agree | match) and u_k = P(agree | non-match), and
    * the log-likelihood-ratio weights ln(m/u) (agreement) and
    * ln((1−m)/(1−u)) (disagreement) that a linkage scorer sums per
    * pair. Here the candidates are [[snmCandidates]] blocking, truth =
    * exact content hash, and the features arrive as boolean columns on
    * a caller-built pair frame — the op reduces them to the weight
    * table (one hash-agg per feature batch; exact counts, ln on the
    * ratio of exact ratios, NULL when a cell is empty or a rate hits
    * 0/1 — boundary weights are infinite by definition). Returns one
    * row per feature: feature, n_match, n_nonmatch, m_r, u_r,
    * w_agree_r, w_disagree_r. */
  def fellegiSunterWeights(pairs: DataFrame, matchCol: String,
      featureCols: Seq[String]): DataFrame = {
    require(featureCols.nonEmpty, "need at least one comparison feature")
    val base = pairs.select(col(matchCol).cast("boolean").as("_m") +:
      featureCols.map(f => col(f).cast("boolean").as(f)): _*)
    val aggs = featureCols.flatMap { f =>
      Seq(sum(when(col("_m") && col(f), 1L).otherwise(0L)).as(s"_ma_$f"),
        sum(when(!col("_m") && col(f), 1L).otherwise(0L)).as(s"_ua_$f"))
    } ++ Seq(sum(when(col("_m"), 1L).otherwise(0L)).as("_nm"),
      sum(when(!col("_m"), 1L).otherwise(0L)).as("_nu"))
    val g = base.agg(aggs.head, aggs.tail: _*).localCheckpoint()
    val rows = featureCols.map { f =>
      val mRate = col(s"_ma_$f").cast("double") /
        nullif(col("_nm").cast("double"), lit(0.0))
      val uRate = col(s"_ua_$f").cast("double") /
        nullif(col("_nu").cast("double"), lit(0.0))
      g.select(lit(f).as("feature"), col("_nm").as("n_match"),
        col("_nu").as("n_nonmatch"),
        round(mRate, 6).as("m_r"), round(uRate, 6).as("u_r"),
        round(when(mRate > 0 && uRate > 0, log(mRate / uRate)), 6)
          .as("w_agree_r"),
        round(when(mRate < 1 && uRate < 1,
          log((lit(1.0) - mRate) / (lit(1.0) - uRate))), 6)
          .as("w_disagree_r"))
    }
    rows.reduce(_ unionByName _)
  }
}
