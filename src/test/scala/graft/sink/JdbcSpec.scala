package graft.sink

import java.util.Properties

import graft.SparkTestBase
import graft.etl.Incremental

/** Runtime JDBC coverage (O6/O22/O23) against EMBEDDED DERBY — the
  * in-process JDBC database that ships with Spark, so the sandbox needs no
  * server. Exercises the reference's whole durable-store contract
  * (/root/reference/fetch_youtube_data.py:154-198): existence probe,
  * append-creates-then-appends, truncate-replace, and the incremental
  * anti-join read back from a real JDBC relation.
  */
class JdbcSpec extends SparkTestBase {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val props = new Properties()

  test("tableExists: absent before, present after; probe is metadata-only") {
    assert(!Jdbc.tableExists(spark, url, "video_stats", props))
    Jdbc.append(Seq(("v1", 10L)).toDF("videoId", "views"),
      url, "video_stats", props)
    assert(Jdbc.tableExists(spark, url, "video_stats", props))
    assert(Jdbc.tableExists(spark, url, "VIDEO_STATS", props),
      "probe must absorb the engine's unquoted-identifier case folding")
  }

  test("tableExists honors a schema qualifier") {
    Jdbc.append(Seq(("x", 1L)).toDF("k", "n"), url, "qual_t", props)
    // Derby puts unqualified tables in the APP schema
    assert(Jdbc.tableExists(spark, url, "app.qual_t", props))
    assert(!Jdbc.tableExists(spark, url, "nosuch.qual_t", props))
  }

  test("tableExists: connectivity failure propagates, never reads as absent") {
    intercept[java.sql.SQLException] {
      Jdbc.tableExists(spark, "jdbc:derby:memory:noSuchDb", "t", props)
    }
  }

  test("append: creates on first write, appends (not replaces) on second") {
    val t = "append_t"
    Jdbc.append(Seq(("a", 1L), ("b", 2L)).toDF("k", "n"), url, t, props)
    Jdbc.append(Seq(("c", 3L)).toDF("k", "n"), url, t, props)
    val back = Jdbc.read(spark, url, t, props)
    assert(back.count() == 3)
    assert(back.select("k").as[String].collect().sorted.toSeq ==
      Seq("a", "b", "c"))
  }

  test("replace: truncate semantics — old rows gone, DDL preserved") {
    val t = "replace_t"
    Jdbc.append(Seq(("stale", 1L)).toDF("k", "n"), url, t, props)
    Jdbc.replace(Seq(("fresh", 2L), ("fresh2", 3L)).toDF("k", "n"),
      url, t, props)
    val back = Jdbc.read(spark, url, t, props)
    assert(back.count() == 2)
    // compare client-side: Derby maps StringType to CLOB and rejects a
    // pushed-down CLOB = CHAR predicate (Postgres/TEXT would accept it)
    val ks = back.select("k").as[String].collect().toSet
    assert(!ks.contains("stale") && ks == Set("fresh", "fresh2"))
    // truncate path kept the table object alive the whole time
    assert(Jdbc.tableExists(spark, url, t, props))
  }

  test("incremental anti-join against a real JDBC sink (O6-O8 end-to-end)") {
    val t = "sink_t"
    Jdbc.append(Seq("v1", "v2").toDF("videoId"), url, t, props)
    val fetched = Seq("v1", "v2", "v3", "v3").toDF("videoId")
    val sink = Jdbc.read(spark, url, t, props)
    val fresh = Incremental.incrementalBatch(fetched, sink, "videoId")
    assert(fresh.isDefined)
    assert(fresh.get.as[String].collect().toSeq == Seq("v3"))
    // append the fresh rows; a second round over the same fetch is a no-op
    Jdbc.append(fresh.get, url, t, props)
    val again = Incremental.incrementalBatch(
      fetched, Jdbc.read(spark, url, t, props), "videoId")
    assert(again.isEmpty, "re-run with same fetch must short-circuit")
  }
}
