package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact SHAPLEY-VALUE multi-touch attribution — the coalition-game
  * member of the attribution ladder: q205 gives the position
  * heuristics (first/last/linear), q252 time-decay, and
  * [[Markov.removalAttribution]] the chain-counterfactual; the
  * Shapley model (Shapley 1953 applied per Zhao et al. 2018's
  * simplified game, v(S) = converters whose touched-channel set ⊆ S)
  * is the one with the fairness axioms — order-free, symmetric,
  * efficient — and the only one of the four that credits channel
  * COMBINATIONS rather than positions or transitions.
  *
  * Scale posture: one pass over events to per-user journey facts;
  * everything after is arithmetic on the 2^k coalition lattice —
  * bounded by the CHANNEL universe (four types here), never by rows.
  *
  * Exactness: values are exact integers scaled by 4! = 24 (coalition
  * weights |S|!·(k−1−|S|)! are integer literals); v(S) is a
  * subset-mask count; one double division at the end.
  */
object Attribution {

  /** The fixed channel universe (the four non-conversion event types)
    * with their coalition bits — a contract, shared with the oracle. */
  val Channels: Seq[(String, Int)] =
    Seq("click" -> 1, "error" -> 2, "signup" -> 4, "view" -> 8)

  /** (channel, S-mask without c, S∪{c} mask, |S|!·(k−1−|S|)!) — the
    * exact integer Shapley coalition weights, shared with the oracle
    * as a VALUES literal. */
  val ShapleyWeights: Seq[(String, Int, Int, Long)] = {
    def fact(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)
    val k = Channels.length
    val full = Channels.map(_._2).sum
    for {
      (name, bit) <- Channels
      sMask <- 0 to full
      if (sMask & ~full) == 0 && (sMask & bit) == 0
    } yield {
      val size = Integer.bitCount(sMask)
      (name, sMask, sMask | bit, fact(size) * fact(k - 1 - size))
    }
  }

  /** Per-user pre-conversion journey facts: (_user, _mask bitset of
    * touched channels, _conv 0/1). Touches are events of non-`conv`
    * type before the user's FIRST `conv` event (all events for
    * non-converters). */
  private def journeys(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, convType: String): DataFrame = {
    val e = events.select(col(userCol).as("_user"),
      col(typeCol).as("_type"), unix_micros(col(tsCol)).as("_us"))
    val conv = e.filter(col("_type") === convType)
      .groupBy(col("_user")).agg(min(col("_us")).as("_conv_us"))
    val touched = e.join(conv, Seq("_user"), "left")
      .where(col("_type") =!= convType &&
        (col("_conv_us").isNull || col("_us") < col("_conv_us")))
    val maskExpr = Channels.map { case (name, bit) =>
      max(when(col("_type") === name, lit(bit)).otherwise(lit(0)))
    }.reduce(_ + _)
    val masks = touched.groupBy(col("_user"))
      .agg(maskExpr.as("_mask"))
    e.select(col("_user")).distinct()
      .join(masks, Seq("_user"), "left")
      .join(conv.select(col("_user"), lit(1).as("_conv")),
        Seq("_user"), "left")
      .select(col("_user"), coalesce(col("_mask"), lit(0)).as("_mask"),
        coalesce(col("_conv"), lit(0)).as("_conv"))
  }

  /** Exact Shapley attribution over the 2⁴ coalition lattice:
    * v(S) = number of CONVERTING users whose touched-channel set ⊆ S
    * (remove the channels outside S and those journeys still
    * complete), φ_c = Σ_{S∌c} |S|!(k−1−|S|)!/k! · (v(S∪c) − v(S)).
    * Reported as the exact 24-scaled integer `phi24` plus
    * phi_r = phi24/24 — converters who touched NO channel sit in
    * v(∅) and receive no credit (Σφ = v(full) − v(∅)). Returns one
    * row per channel: channel, phi24, phi_r. */
  def shapleyAttribution(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, convType: String): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val u = journeys(events, userCol, typeCol, tsCol, convType)
      .filter(col("_conv") === 1)
      .groupBy(col("_mask")).agg(count(lit(1)).as("_u"))
      .localCheckpoint()
    val full = Channels.map(_._2).sum
    val coalitions = (0 to full).filter(m => (m & ~full) == 0).toDF("_s")
    val v = broadcast(coalitions).join(u,
        (col("_mask").bitwiseAND(col("_s")) === col("_mask")), "left")
      .groupBy(col("_s")).agg(coalesce(sum(col("_u")), lit(0L)).as("_v"))
      .localCheckpoint()
    val w = ShapleyWeights.toDF("channel", "_s", "_sc", "_w")
    broadcast(w)
      .join(v.select(col("_s"), col("_v")), Seq("_s"))
      .join(v.select(col("_s").as("_sc"), col("_v").as("_vc")),
        Seq("_sc"))
      .groupBy(col("channel"))
      .agg(sum(col("_w") * (col("_vc") - col("_v"))).as("phi24"))
      .select(col("channel"), col("phi24"),
        (col("phi24").cast("double") / lit(24.0)).as("phi_r"))
      .orderBy(col("channel"))
  }

}
