package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a custom typed `Aggregator` (SURVEY.md §2.5's "custom
  * Aggregator if a non-built-in aggregate emerges" — this one emerges from
  * scale, not parity).
  *
  * Per-group top-k via `row_number().over(Window...)` shuffles and sorts
  * EVERY row of the group. This aggregator keeps only k (score, id)
  * entries per group in each partial buffer, so the map-side combine
  * reduces shuffle volume to k·groups rows and nothing is ever fully
  * sorted. For k ≪ group size at 100 TB that's orders of magnitude less
  * shuffle I/O than the window form.
  *
  * Ties break deterministically: higher score first, then lower id.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[Long]] {

  private def trim(l: List[(Double, Long)]): List[(Double, Long)] =
    l.sortBy(t => (-t._1, t._2)).take(k)

  override def zero: List[(Double, Long)] = Nil
  override def reduce(b: List[(Double, Long)], a: (Double, Long)): List[(Double, Long)] =
    trim(a :: b)
  override def merge(x: List[(Double, Long)], y: List[(Double, Long)]): List[(Double, Long)] =
    trim(x ::: y)
  override def finish(b: List[(Double, Long)]): Seq[Long] =
    trim(b).map(_._2)

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    Encoders.kryo[List[(Double, Long)]]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
