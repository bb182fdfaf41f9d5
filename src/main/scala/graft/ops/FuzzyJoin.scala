package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked approximate string matching (entity resolution): join two
  * string columns on edit distance without an all-pairs comparison.
  *
  * Scale posture (100 TB): Levenshtein over the cross product is
  * O(n·m·len²) — never viable. Blocking turns it into an EQUI-join on a
  * cheap deterministic key (string length band + an interior character
  * window), so Catalyst plans a hash/sort-merge join and only candidates
  * that agree on the block key pay the edit-distance kernel. Recall
  * contract: any pair within distance `maxDist` that preserves the block
  * window still matches — the window is chosen off the string head
  * precisely because head corruption is the common typo mode being
  * repaired. Tighter recall needs multiple block passes (q-gram or
  * multi-window), which compose as unions of the same equi-join shape.
  */
object FuzzyJoin {

  /** Candidate block key: (length, chars 2..4). Length is preserved by
    * substitution typos; the interior window survives head corruption. */
  private def blockKey(c: org.apache.spark.sql.Column) =
    concat_ws("#", length(c).cast("string"), substring(c, 2, 3))

  /** Match each left row's `leftCol` string against the right dimension's
    * `rightCol` within `maxDist` substitutions, keeping the single best
    * match (min distance, ties by match string). The right side is
    * expected to be a modest dimension (vocabulary / canonical names) and
    * is broadcast; left stays fully distributed.
    */
  def bestMatch(left: DataFrame, leftCol: String, right: DataFrame,
      rightCol: String, maxDist: Int): DataFrame = {
    val dim = broadcast(
      right.select(col(rightCol)).distinct()
        .withColumn("_bk", blockKey(col(rightCol))))
    val cand = left
      .withColumn("_bk", blockKey(col(leftCol)))
      .join(dim, Seq("_bk"))
      .withColumn("match_dist",
        levenshtein(col(leftCol), col(rightCol)).cast("long"))
      .where(col("match_dist") <= maxDist)
    // best match per left row: min (distance, candidate) struct — one
    // agg, no window sort
    val leftCols = left.columns.map(col)
    cand
      .groupBy(leftCols: _*)
      .agg(min(struct(col("match_dist"), col(rightCol))).as("_best"))
      .select(leftCols :+ col(s"_best.$rightCol").as("matched") :+
        col("_best.match_dist").as("match_dist"): _*)
  }
}
