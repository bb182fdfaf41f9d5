package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact frequent-item ("heavy hitter") detection with bounded memory:
  * a Misra-Gries summary as a typed Spark [[Aggregator]] feeds a
  * candidate set, which a second exact pass recounts and thresholds.
  * The MG guarantee (every item with true count > n/(k+1) survives the
  * summary) makes the two-pass result EXACT for threshold φ whenever
  * k+1 ≥ 1/φ — which is why the query can be oracle-checked against a
  * plain GROUP BY ... HAVING even though the sketch itself is lossy.
  *
  * Scale posture (100 TB): pass 1 is a partial-aggregating typed
  * Aggregator — each task keeps at most k counters regardless of
  * cardinality (the point of MG vs a plain groupBy whose hash table is
  * O(distinct)); merges are associative summary merges, so the driver
  * sees one ≤k-entry map. Pass 2 is a semi-join of the token table
  * against the ≤k-row broadcast candidate list + one hash agg over only
  * candidate rows. Nothing driver-side except the ≤k-entry summary —
  * the same shape Spark's own `approx_count_distinct` partials take.
  */
object Heavy {

  /** Misra-Gries frequent-items summary of capacity `k`. Per element:
    * increment if tracked, insert if room, else decrement all (the
    * classic majority-generalization). Merge sums two summaries then
    * subtracts the (k+1)-th largest count — the standard mergeable-
    * summaries reduction (Agarwal et al., PODS'12) that preserves the
    * undercount ≤ n/(k+1) bound. */
  final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k > 0, "capacity must be positive")

    def zero: Map[String, Long] = Map.empty

    def reduce(b: Map[String, Long], term: String): Map[String, Long] =
      b.get(term) match {
        case Some(c) => b.updated(term, c + 1L)
        case None if b.size < k => b.updated(term, 1L)
        case None =>
          // full, unseen item: decrement every counter, drop zeros
          b.iterator
            .map { case (t, c) => (t, c - 1L) }
            .filter(_._2 > 0L)
            .toMap
      }

    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        val cut = sum.values.toArray.sorted(Ordering[Long].reverse).apply(k)
        sum.iterator
          .map { case (t, c) => (t, c - cut) }
          .filter(_._2 > 0L)
          .toMap
      }
    }

    def finish(m: Map[String, Long]): Map[String, Long] = m

    // the buffer is an opaque ≤k-entry map shipped between partial and
    // final aggregation — kryo keeps it off the row format, which is fine
    // for a summary that never joins columnar data
    def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    def outputEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
  }

  /** Exact items with frequency share > `phi` in `df(termCol)`, via the
    * MG(k) candidate pass + exact recount. Requires k+1 ≥ 1/φ — the
    * precondition under which MG provably misses nothing above the
    * threshold. Returns (term, cnt, share). */
  def heavyHitters(df: DataFrame, termCol: String, phi: Double,
      k: Int): DataFrame = {
    require(phi > 0 && phi < 1, "phi must be in (0,1)")
    require(k + 1 >= 1.0 / phi,
      s"capacity k=$k too small for phi=$phi: need k+1 >= 1/phi for exactness")
    val spark = df.sparkSession
    import spark.implicits._
    val terms = df.select(col(termCol).cast("string").as("term"))
    val summary = terms.as[String].select(new MisraGries(k).toColumn)
    val candidates = summary.flatMap(_.keysIterator).toDF("term")
    val total = terms.agg(count(lit(1)).as("n_total"))
    terms
      .join(broadcast(candidates), Seq("term"), "left_semi")
      .groupBy("term")
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .where(col("cnt") > col("n_total") * lit(phi))
      .select(col("term"), col("cnt"),
        round(col("cnt") / col("n_total"), 6).as("share"))
  }
}
