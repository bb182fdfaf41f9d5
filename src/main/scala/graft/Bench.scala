package graft
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line of per-query best-of-N seconds.
  *
  * Sharded by default across fresh JVMs (SPARK_GRAFT_BENCH_FORK_EVERY,
  * default 64 -> 5 shards for the 300-query suite): rounds 2-6 showed that
  * a single long-lived JVM accumulates codegen/broadcast garbage and GC
  * pressure that inflates a shifting subset of late queries by >1.5x per
  * run, forcing manual best-of-3 spike adjudication every round. A fresh
  * JVM per shard bounds that accumulation at the source; each shard pays
  * its own (untimed) warmup so per-query numbers stay steady-state.
  * Set SPARK_GRAFT_BENCH_FORK_EVERY=0 to force the old single-JVM mode.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // optional comma-separated name-prefix filter for focused local
    // timing (e.g. SPARK_GRAFT_BENCH_FILTER=q81,q61); unset = all
    // queries, the driver contract. Children are driven with EXACT
    // name lists (SPARK_GRAFT_BENCH_EXACT=1) so a prefix can never
    // double-select across shards.
    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    val exact = sys.env.contains("SPARK_GRAFT_BENCH_EXACT")
    val selected: Seq[String] = filter match {
      case Some(ps) => SparkEntry.queries.keys.toSeq.filter(n =>
        if (exact) ps.contains(n) else ps.exists(n.startsWith))
      case None => SparkEntry.queries.keys.toSeq
    }
    val forkEvery = sys.env.getOrElse("SPARK_GRAFT_BENCH_FORK_EVERY", "64").toInt
    val isChild = sys.env.contains("SPARK_GRAFT_BENCH_CHILD")
    val results: Seq[(String, Double)] =
      if (!isChild && forkEvery > 0 && selected.size > forkEvery)
        runSharded(selected, forkEvery, sfDir)
      else
        runInProcess(selected, sfDir)
    emit(results, sfDir)
  }

  /** Parent mode: split the query list into shards of `forkEvery` and run
    * each in a freshly spawned JVM (same classpath + JVM args as this
    * one — build.sbt's `run / fork := true` guarantees both are real).
    * Children run SEQUENTIALLY: parallel shards on one machine would
    * contend for the same 32 cores and reintroduce the noise this mode
    * exists to remove. Any shard that fails to spawn or exits nonzero
    * falls back to an in-process run of its queries, so the bench always
    * produces a complete line for the driver.
    */
  private def runSharded(names: Seq[String], forkEvery: Int,
      sfDir: String): Seq[(String, Double)] = {
    val javaBin = sys.props("java.home") + "/bin/java"
    val cp = sys.props("java.class.path")
    // re-use this JVM's own flags (--add-opens set, -Xmx, -D spark props);
    // drop debug agents a local session might have attached
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-Xdebug"))
    val shards = names.grouped(forkEvery).toSeq
    System.err.println(s"[bench] sharding ${names.size} queries across " +
      s"${shards.size} fresh JVMs (fork-every $forkEvery)")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val leftover = scala.collection.mutable.ArrayBuffer.empty[String]
    shards.zipWithIndex.foreach { case (shard, idx) =>
      val outPath = java.nio.file.Files.createTempFile(
        s"graft_bench_shard${idx}_", ".json")
      try {
        val cmd = (Seq(javaBin) ++ jvmArgs ++
          Seq("-cp", cp, "graft.Bench")).asJava
        val pb = new ProcessBuilder(cmd)
        pb.environment().put("SPARK_GRAFT_BENCH_CHILD", "1")
        pb.environment().put("SPARK_GRAFT_BENCH_EXACT", "1")
        pb.environment().put("SPARK_GRAFT_BENCH_FILTER", shard.mkString(","))
        pb.environment().put("SPARK_GRAFT_BENCH_OUT", outPath.toString)
        pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
        // child stderr -> our stderr (progress lines); child stdout (its
        // own JSON line) -> discarded, the parent prints the ONE merged
        // line the driver contract requires
        pb.redirectError(ProcessBuilder.Redirect.INHERIT)
        pb.redirectOutput(java.io.File.createTempFile("graft_bench_stdout", ".log"))
        val p = pb.start()
        val rc = p.waitFor()
        val parsed = if (rc == 0) parseQueriesJson(
          new String(java.nio.file.Files.readAllBytes(outPath),
            java.nio.charset.StandardCharsets.UTF_8)) else Map.empty[String, Double]
        val missing = shard.filterNot(parsed.contains)
        if (rc != 0 || missing.nonEmpty) {
          System.err.println(s"[bench] WARN shard $idx rc=$rc, " +
            s"${missing.size} queries missing -> in-process fallback")
          leftover ++= missing
        }
        buf ++= shard.flatMap(n => parsed.get(n).map(n -> _))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] WARN shard $idx spawn failed: $e " +
          "-> in-process fallback")
        leftover ++= shard
      } finally {
        try java.nio.file.Files.deleteIfExists(outPath) catch { case _: Throwable => }
      }
    }
    if (leftover.nonEmpty) buf ++= runInProcess(leftover.toSeq, sfDir)
    buf.toSeq
  }

  /** Extract the {"queries":{...}} map out of a child's JSON line with a
    * tiny regex scan — the format is ours (flat string->number, no
    * nesting, Locale.ROOT decimals), so a JSON library isn't needed.
    */
  private[graft] def parseQueriesJson(line: String): Map[String, Double] = {
    val qStart = line.indexOf("\"queries\":{")
    if (qStart < 0) return Map.empty
    val body = line.substring(qStart + "\"queries\":{".length,
      line.indexOf('}', qStart))
    val re = """"([^"]+)":(-?[0-9.]+)""".r
    re.findAllMatchIn(body).map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  /** Single-JVM measurement path (also the per-shard child body). */
  private def runInProcess(names: Seq[String],
      sfDir: String): Seq[(String, Double)] = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional runtime-conf overrides (same contract as graft.Verify):
    // SPARK_GRAFT_SPARK_CONF="k=v,k=v" — forces alternate physical
    // paths (e.g. the distributed components fallback) under the same
    // timing harness; forked shard children inherit the env var
    sys.env.get("SPARK_GRAFT_SPARK_CONF").foreach(_.split(',')
      .map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })
    // absorb one-off JVM/codegen/scan-init cost so per-query numbers
    // reflect steady state rather than whichever query runs first. The
    // warmup query is a FIXED name (an unordered Map's headOption would
    // shadow a different query per JVM, adding run-to-run noise).
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
      SparkEntry.queries.get("q01_pricing_summary")
        .foreach(_(spark, sfDir).count())
    } catch { case _: Throwable => }
    // best-of-N (default 2): one-shot numbers on a shared machine carry
    // multi-second contention noise (observed: the same sub-second query
    // jumping 0.8s -> 6s between runs) plus first-run Catalyst
    // analysis/codegen cost that amortizes to nothing at scale. The min
    // over N runs is the steady-state per-query time.
    //
    // The N runs are DECORRELATED IN TIME (round-robin passes over the
    // whole shard, min across passes) rather than back-to-back: a
    // contention burst lasts seconds, so adjacent runs both land inside
    // it and the min still reports the spike — which is exactly how the
    // r7 driver bench flagged q84/q57/q86 at 2-8x their steady state
    // while the isolated re-measure (tools/adjudicate.sh) showed all
    // three at ~1x. With a full pass (~a minute of other queries)
    // between a query's runs, one burst can no longer inflate both.
    // Pass 2+ still amortizes first-run cost: identical generated code
    // hits the codegen cache, only cheap re-analysis repeats.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    val best = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    var i = 0
    for (pass <- 1 to runs; name <- names) {
      SparkEntry.queries.get(name).foreach { fn =>
        val t0 = System.nanoTime()
        // a throwing query must stay visible: a swallowed failure times
        // as near-zero and masquerades as a fast query (the r11 q377
        // 10x-probe lesson) — keep the run alive but say what broke,
        // and NEVER record the failed pass's elapsed time: min-over-
        // passes would otherwise prefer the failure's near-zero time
        // over a real run and the artifact would carry a fake number
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.toString.take(300)}")
            false
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // opt-in per-pass trace for mover adjudication: best-of-N hides
        // WHICH pass paid a first-touch table rebuild or GC burst
        if (sys.env.contains("SPARK_GRAFT_BENCH_TRACE"))
          System.err.println(
            f"[bench] trace $name%-28s pass $pass $dt%8.3f s")
        // drop caches a query may have built (dedup pipelines cache
        // shared stages) so later queries aren't squeezed by stale blocks
        spark.sqlContext.clearCache()
        // inter-query hygiene: finished streaming queries leave their
        // memory-sink temp views behind (rows pinned in storage memory),
        // and 260+ query executions accumulate broadcast/codegen garbage
        // that otherwise collects mid-measurement — drop the views and
        // take the GC hit BETWEEN timings, not inside a later query
        spark.catalog.listTables().collect()
          .filter(t => t.isTemporary && t.name.startsWith("graft_stream_"))
          .foreach(t => spark.catalog.dropTempView(t.name))
        i += 1
        if (i % 16 == 0) System.gc()
        if (ok) {
          val cur = best.get(name).fold(dt)(math.min(_, dt))
          best(name) = cur
        }
        if (pass == runs) best.get(name) match {
          case Some(cur) =>
            System.err.println(f"[bench] $name%-28s $cur%8.3f s (best of $runs)")
          case None =>
            // all passes failed: the name is OMITTED from the JSON (an
            // absent row is honest; a near-zero row is a lie) — in
            // sharded mode the parent notices the gap and retries it
            // in-process, which surfaces the same FAILED line again
            System.err.println(f"[bench] $name%-28s OMITTED (all $runs passes failed)")
        }
      }
    }
    spark.stop()
    names.flatMap(n => best.get(n).map(n -> _))
  }

  private def emit(results: Seq[(String, Double)], sfDir: String): Unit = {
    // keep the JSON line SHORT (ms-rounded values) and print it before
    // exiting: the driver captures the output tail, and a long line
    // risks having its head truncated off the capture window.
    // Locale.ROOT: a comma-decimal default locale would otherwise turn
    // 0.123 into "0,123" and break the JSON consumer
    def r(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":${r(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    System.out.flush()
    // ALSO persist the line to a stable artifact file: the driver's
    // stdout capture window truncated the 133-query line in r5
    // (BENCH_r05.json parsed:null), so the full JSON must survive
    // somewhere the driver/judge can always read it.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/bench_out.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[bench] json written to $outPath")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] WARN could not write $outPath: $e") }
  }
}
