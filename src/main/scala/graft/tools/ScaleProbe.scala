package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generates a synthetic ~sf1 dataset (10 × sf0.1) for the round-7
  * scale probe of the five most expensive queries (VERDICT_r6 item 5:
  * "scale-probe the top-5 at sf1 if the driver can produce it" — the
  * driver generates only sf{0.001,0.01,0.1} and `/root/testdata` is
  * read-only, so the extra decade is synthesized here, OUTSIDE the
  * testdata tree, and used for growth-curve measurement only — never
  * for correctness oracles).
  *
  * Only the tables the probed queries read are produced:
  *
  *  - `documents` (q109 prefix-filter join, q80 SimHash near-dup, q161
  *    near-dup leakage): 10 copies; copy i > 0 remaps doc_id and
  *    prefixes EVERY token with "c<i>" — token vocabularies are then
  *    disjoint across copies, so shingle/band collisions (and thus
  *    near-dup pairs) replicate PER COPY: pair volume grows linearly
  *    with data, the growth a real 10× corpus with the same internal
  *    duplication rate would show. Plain copies would instead create
  *    10-cliques of exact dups (quadratic pair blowup — a different,
  *    unrepresentative workload).
  *  - `lineitem` (q103 PageRank on the supplier co-occurrence graph,
  *    q140 k-hop reach on the part co-occurrence graph): 10 copies with
  *    orderkey AND partkey AND suppkey all remapped per copy — 10
  *    disjoint copies of the same graph, i.e. 10× vertices and 10×
  *    edges at identical structure. Remapping only the orderkey would
  *    keep the vertex set fixed and multiply every edge's support by
  *    10, silently densifying the graph past its support thresholds —
  *    a harsher but unrepresentative scaling.
  *  - `orders` (round 8, q215 HITS on the customer⋈supplier bipartite
  *    graph): o_orderkey remapped with the SAME offset as
  *    l_orderkey (the join key stays consistent) and o_custkey
  *    remapped per copy — 10 disjoint bipartite graphs, matching the
  *    lineitem convention.
  *  - `customer` (round 11, q354 Theil inequality / q366 Hellinger
  *    segment pairs): c_custkey remapped with the SAME per-copy offset
  *    as o_custkey, so orders⋈customer joins stay consistent — 10
  *    disjoint customer populations whose per-segment revenue
  *    distributions replicate (segment COUNT stays fixed at 5: the
  *    group grids these queries end on keep their production shape).
  *  - `part` (round 11, q374 Bradley–Terry brand duels): p_partkey
  *    remapped with the SAME per-copy offset as l_partkey, so
  *    lineitem⋈part stays join-consistent; p_brand is KEPT — the 25
  *    brands' daily revenues each multiply by 10 while the duel grid
  *    (the items² frame every MM iteration runs on) keeps its
  *    production 25-brand shape.
  *  - `embeddings` (round 10, q350 isotropy / q351 participation
  *    ratio / q361 MMR re-rank): 10 copies with vec_id remapped and
  *    the VECTOR kept — 10× rows of identical per-row work, the right
  *    shape for timing the one-pass reductions and the d² fan-out.
  *    NOTE (timing-only, like every synth table): cross-copy duplicate
  *    vectors change the VALUES of global geometry stats (isotropy's
  *    mean pairwise cosine gains cosine-1 pairs; an MMR pool fills
  *    with exact dups) — never probe correctness against this dir.
  *  - `events` (round 9, q312 Markov attribution / q319 full-outer
  *    stream-stream join / q316 survival): event_id AND user_id
  *    remapped per copy, ts kept — 10 disjoint user populations on the
  *    same time axis, so per-user journeys (and thus transitions,
  *    stream-join matches, and survival subjects) replicate linearly;
  *    the Markov chain's PROBABILITIES are invariant under this
  *    scaling (same answer, 10× the input — a correctness check the
  *    probe gets for free).
  *
  * Usage: `sbt "runMain graft.tools.ScaleProbe"` writes
  * /tmp/graft_sf1synth (idempotent: skips tables already present),
  * then `graft.Bench` is pointed at that dir with a q109/q140/q80/
  * q103/q161 filter for the timing runs (results → SCALE.md).
  */
object ScaleProbe {
  val Copies = 10
  val OutDir = "/tmp/graft_sf1synth"

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copies(base: DataFrame)(remap: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until Copies).map(i => remap(base, i)).reduce(_ union _)

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docsX = copies(docs) { (d, i) =>
      if (i == 0) d
      else d.select(
        (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        // prefix every whitespace-delimited token: disjoint vocabulary
        // per copy, so near-dup structure replicates instead of
        // cross-linking copies into exact-dup cliques
        regexp_replace(col("text"), "(\\S+)", s"c$i$$1").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.withColumn("n_chars", length(col("text")))

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val liX = copies(li) { (l, i) =>
      if (i == 0) l
      else l
        .withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * 100000000L))
        .withColumn("l_partkey", col("l_partkey") + lit(i.toLong * 10000000L))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i.toLong * 1000000L))
    }

    def write(df: DataFrame, name: String): Unit = {
      val path = s"$OutDir/$name.parquet"
      if (!new java.io.File(path).exists()) {
        df.write.mode("overwrite").parquet(path)
        System.err.println(s"[scaleprobe] wrote $path")
      } else System.err.println(s"[scaleprobe] kept existing $path")
    }
    val ord = spark.read.parquet(s"$src/orders.parquet")
    val ordX = copies(ord) { (o, i) =>
      if (i == 0) o
      else o
        .withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * 100000000L))
        .withColumn("o_custkey", col("o_custkey") + lit(i.toLong * 10000000L))
    }

    val ev = graft.util.Tables.events(spark, src)
    val evX = copies(ev) { (e, i) =>
      if (i == 0) e
      else e
        .withColumn("event_id", col("event_id") + lit(i.toLong * 1000000000L))
        .withColumn("user_id", col("user_id") + lit(i.toLong * 100000000L))
    }

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val embX = copies(emb) { (e, i) =>
      if (i == 0) e
      else e.withColumn("vec_id", col("vec_id") + lit(i.toLong * 1000000L))
    }

    val prt = spark.read.parquet(s"$src/part.parquet")
    val prtX = copies(prt) { (p, i) =>
      if (i == 0) p
      else p.withColumn("p_partkey",
        col("p_partkey") + lit(i.toLong * 10000000L))
    }

    val cust = spark.read.parquet(s"$src/customer.parquet")
    val custX = copies(cust) { (c, i) =>
      if (i == 0) c
      else c.withColumn("c_custkey",
        col("c_custkey") + lit(i.toLong * 10000000L))
    }

    write(docsX, "documents")
    write(liX, "lineitem")
    write(ordX, "orders")
    write(prtX, "part")
    write(custX, "customer")
    write(evX, "events")
    write(embX, "embeddings")
    // bounded dimension tables pass through unscaled (round 12, for
    // the q445-style orders⋈customer⋈nation joins): keys keep their
    // ranges, so each nation/region/supplier simply carries 10× the
    // fact rows — the growth a fixed dimension table sees in reality
    for (t <- Seq("nation", "region", "supplier"))
      write(spark.read.parquet(s"$src/$t.parquet"), t)
    spark.stop()
  }
}
