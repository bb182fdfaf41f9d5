package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the Hash60 kernel vs the builtin md5-hex chain on the q430 gram
  * stream. Not part of the API. */
object HashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.TextOps
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[hash] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val grams = docs
      .select(col("doc_id"), TextOps.normalize(col("text")).as("_t"))
      .select(col("doc_id"),
        explode(expr("CASE WHEN length(_t) >= 3 THEN " +
          "transform(sequence(1, length(_t) - 2), " +
          "i -> substring(_t, i, 3)) ELSE array() END")).as("_g"))
    for (pass <- 1 to 3) {
      time(s"p$pass explode only")(noop(grams))
      time(s"p$pass kernel hash60")(noop(
        grams.select(col("doc_id"),
          graft.expr.Hash60Kernel.hash60col(col("_g")).as("h"))))
      time(s"p$pass builtin chain")(noop(
        grams.select(col("doc_id"),
          conv(substring(md5(col("_g")), 1, 15), 16, 10).cast("long")
            .as("h"))))
    }
    spark.stop()
  }
}
