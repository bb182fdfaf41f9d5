package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is parquet timestamp[ns] — read as long, converted in
      // graft.util.Tables.events (matches DuckDB's truncating read).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional runtime-conf overrides (e.g. SPARK_GRAFT_SPARK_CONF=
    // "spark.graft.dedup.unionFindMaxEdges=0") — lets the scale probes
    // force alternate physical paths (the distributed components
    // fallback) through the SAME correctness gate, no code edits
    sys.env.get("SPARK_GRAFT_SPARK_CONF").foreach(_.split(',')
      .map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })
    new java.io.File(outDir).mkdirs()
    // optional comma-separated name-prefix filter for focused local runs
    // (e.g. SPARK_GRAFT_VERIFY_FILTER=q82,q89); unset (the driver) = all
    val filter = sys.env.get("SPARK_GRAFT_VERIFY_FILTER")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = filter match {
      case Some(ps) =>
        SparkEntry.queries.filter { case (n, _) => ps.exists(n.startsWith) }
      case None => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // remove any partial/stale output so a failure can't be masked
        // by a previous run's parquet in the same outDir; recursive — a
        // partial write can leave a _temporary subtree that a flat delete
        // would miss, keeping the stale directory alive
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete()
        }
        rm(new java.io.File(s"$outDir/$name"))
      }
      // release any caches built by shared-stage pipelines
      spark.sqlContext.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
