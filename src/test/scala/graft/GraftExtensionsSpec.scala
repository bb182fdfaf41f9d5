package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions path needs its own session (extensions bind at session
  * build time, and getOrCreate would hand back the shared test session),
  * so default/active sessions are cleared first and restored after. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions registers the engine's SQL functions") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // withExtensions (not the spark.sql.extensions static conf): a
      // static conf cannot take effect when an earlier suite's
      // SparkContext is being reused; the builder hook always applies
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      assert(spark.sql("SELECT iso8601_seconds('PT1H2M10S') AS s")
        .head.getDouble(0) == 3730.0)
      assert(spark.sql(
        """SELECT cosine_sim(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)),
          |                  array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS c"""
          .stripMargin).head.getDouble(0) == 1.0)
      assert(spark.sql(
        """SELECT dot_product(array(CAST(2 AS FLOAT), CAST(3 AS FLOAT)),
          |                   array(CAST(4 AS FLOAT), CAST(5 AS FLOAT))) AS d"""
          .stripMargin).head.getDouble(0) == 23.0)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
