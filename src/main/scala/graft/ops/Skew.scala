package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join utilities (SURVEY.md §4 engine posture).
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) handles most runtime skew; this manual salting form is for the
  * planned-skew case — a known hot key joined against a replicable side —
  * where it guarantees fan-out regardless of runtime statistics:
  *
  *  - the BIG side gets a deterministic salt in [0, salts) derived from a
  *    hash of the whole row (uniform, reproducible — no rand(), which
  *    would break retry/replay semantics of recomputed tasks);
  *  - the SMALL side is replicated `salts` times;
  *  - the join key becomes (key, salt), splitting each hot key's rows
  *    across `salts` reducers.
  *
  * Result is row-identical to the plain equi-join.
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0)
    val bigSalted = big.withColumn("_salt",
      pmod(hash(struct(big.columns.toIndexedSeq.map(col): _*)), lit(salts)))
    val smallExploded = small.withColumn("_salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    bigSalted.join(smallExploded, Seq(key, "_salt")).drop("_salt")
  }
}
