package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage timing for the cosineTopK family (q418/q419): where do
  * ~6 s go — the broadcast NL join + cosine, the top-k reduction, or the
  * downstream rollup? Not part of the API. */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.expr.VectorKernels.cosine_sim
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[knn] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (pass <- 1 to 2) {
      println(s"=== pass $pass ===")
      val q = broadcast(emb
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")))
      val joined = emb
        .select(col("vec_id").as("neighbor_id"), col("embedding"))
        .join(q, col("neighbor_id") =!= col("q_id"))
      time("bnlj only (count)")(joined.count())
      val sims = joined
        .select(col("q_id"), col("neighbor_id"),
          cosine_sim(col("embedding"), col("q_emb")).as("sim"))
        .filter(col("sim").isNotNull)
      time("bnlj+cosine (noop)")(noop(sims))
      // window form
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id"))
        .orderBy(col("sim").desc, col("neighbor_id").asc)
      time("window topk (noop)")(noop(
        sims.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 10)
          .select(col("q_id"), col("rn"), col("neighbor_id"),
            round(col("sim"), 9).as("sim_r"))))
      // typed top-k aggregate form
      spark.conf.set(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1048576")
      time("topk agg (noop)")(noop(
        sims.groupBy(col("q_id"))
          .agg(graft.expr.TopKNeighbors.topk_neighbors(
            col("sim"), col("neighbor_id"), 10).as("_top"))
          .select(col("q_id"), posexplode(col("_top")))
          .select(col("q_id"), (col("pos") + 1).cast("int").as("rn"),
            col("col.neighbor_id").as("neighbor_id"),
            round(col("col.sim"), 9).as("sim_r"))))
      // two-level agg form
      val top = struct((-col("sim")).as("_ns"), col("neighbor_id"))
      val partial = sims
        .withColumn("_pid", spark_partition_id())
        .groupBy(col("_pid"), col("q_id"))
        .agg(slice(sort_array(collect_list(top)), 1, 10).as("_top"))
      time("two-level topk (noop)")(noop(
        partial.select(col("q_id"), explode(col("_top")).as("_t"))
          .groupBy(col("q_id"))
          .agg(slice(sort_array(collect_list(col("_t"))), 1, 10).as("_top"))
          .select(col("q_id"), posexplode(col("_top")))
          .select(col("q_id"), (col("pos") + 1).cast("int").as("rn"),
            col("col._ns"), col("col.neighbor_id").as("neighbor_id"))
          .select(col("q_id"), col("rn"), col("neighbor_id"),
            round(-col("_ns"), 9).as("sim_r"))))
      spark.sqlContext.clearCache()
    }
    spark.stop()
  }
}
