package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Intervals
import graft.util.Tables._

/** Interval-overlap batch: the bucketed overlap self-join
  * ([[graft.ops.Intervals.overlapJoin]] — equi-join on day buckets with
  * exactly-once pair emission, never a per-key cross product).
  */
object OverlapQueries {

  private val BucketDays = 4

  val all: Seq[Q] = Seq(

    // Which of a customer's order windows coincide, and for how long:
    // q105's deterministic intervals (duration = o_orderkey % 7 + 1
    // days), pairs oriented a_id < b_id, exclusive ends. The oracle is
    // the direct theta join — the engine's bucket/emit-once machinery
    // must reproduce it exactly.
    Q("q255_interval_overlap",
      Some("""WITH iv AS (
             |  SELECT o_custkey, o_orderkey AS id, o_orderdate AS s,
             |    o_orderdate + (o_orderkey % 7 + 1)::INTEGER
             |      * INTERVAL 1 DAY AS e
             |  FROM orders)
             |SELECT a.o_custkey, a.id AS a_id, b.id AS b_id,
             |  (least(a.e, b.e)::DATE - greatest(a.s, b.s)::DATE)
             |    ::BIGINT AS overlap_days
             |FROM iv a JOIN iv b
             |  ON a.o_custkey = b.o_custkey AND a.id < b.id
             | AND a.s < b.e AND b.s < a.e
             |ORDER BY 1, 2, 3""".stripMargin),
      (s, d) => {
        val iv = orders(s, d).select(col("o_custkey"),
          col("o_orderkey").as("id"), col("o_orderdate").as("s"),
          date_add(col("o_orderdate"),
            (col("o_orderkey") % 7 + 1).cast("int")).as("e"))
        Intervals.overlapJoin(iv, "o_custkey", "id", "s", "e",
            BucketDays)
          .orderBy("o_custkey", "a_id", "b_id")
      }))
}
