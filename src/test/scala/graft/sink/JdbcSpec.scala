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

  test("case folding: quoted mixed-case DDL — the reference's `SELECT " +
      "videoid` bug is reproduced raw and absorbed by the engine's API") {
    // The reference's latent bug (fetch_youtube_data.py:155): pandas
    // to_sql quotes "videoId", so the raw lowercase `SELECT videoid`
    // only works because Postgres folds unquoted identifiers DOWN.
    // Derby folds UP — the same raw SQL breaks, proving the bug is
    // fold-direction luck. The engine never writes raw identifiers:
    // tableExists compares case-insensitively and the DataFrame API
    // quotes through, so both directions survive.
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().executeUpdate(
        """CREATE TABLE "CaseFold"("videoId" VARCHAR(50), "views" BIGINT)""")
      // 1) raw unquoted SELECT against the quoted column fails here
      //    (folds to VIDEOID), exactly as it would NOT in Postgres —
      //    the regression the reference shipped
      intercept[java.sql.SQLException] {
        conn.createStatement().executeQuery(
          """SELECT videoid FROM "CaseFold"""")
      }
    } finally conn.close()
    // 2) the engine's probe absorbs folding in BOTH directions
    assert(Jdbc.tableExists(spark, url, "CaseFold", props))
    assert(Jdbc.tableExists(spark, url, "casefold", props))
    assert(Jdbc.tableExists(spark, url, "CASEFOLD", props))
    // 3) append + read-back + incremental key matching go through the
    //    DataFrame API (quoted identifiers), surviving the mixed case.
    //    Spark's writer resolves the dialect-quoted "CaseFold" table.
    Jdbc.append(Seq(("v1", 1L)).toDF("videoId", "views"),
      url, "\"CaseFold\"", props)
    val sink = Jdbc.read(spark, url, "\"CaseFold\"", props)
    assert(sink.columns.toSeq == Seq("videoId", "views"),
      "exact-case column names must round-trip")
    val fresh = Incremental.incrementalBatch(
      Seq("v1", "v2").toDF("videoId"), sink.select("videoId"), "videoId")
    assert(fresh.isDefined &&
      fresh.get.as[String].collect().toSeq == Seq("v2"))
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
