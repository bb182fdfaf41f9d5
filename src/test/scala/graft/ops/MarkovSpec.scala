package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Markov journey machinery against hand-solved chains: transition
  * construction (truncate-at-conversion, START/END bookkeeping),
  * removal-effect attribution on a symmetric two-path chain and on a
  * single-path chain (the stranded-START edge case), and the
  * absorption profile's closed-form values. */
class MarkovSpec extends SparkTestBase {

  test("journeyTransitions: truncation, START prefix, END close") {
    import spark.implicits._
    // user 1 converts at step 2 (step-3 view must be cut);
    // user 2 never converts (gets the END edge)
    val ev = Seq(
      (1L, 1L, "click"), (1L, 2L, "purchase"), (1L, 3L, "view"),
      (2L, 1L, "view"), (2L, 2L, "click"))
      .toDF("user_id", "event_id", "event_type")
    val got = Markov.journeyTransitions(ev, "user_id", "event_type",
        Seq(col("event_id")), "purchase")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("START", "click") -> 1L, ("click", "purchase") -> 1L,
      ("START", "view") -> 1L, ("view", "click") -> 1L,
      ("click", "END") -> 1L))
  }

  test("removalAttribution: symmetric two-path chain splits 50/50") {
    import spark.implicits._
    val trans = Seq(
      ("START", "a", 1L), ("START", "b", 1L),
      ("a", "purchase", 1L), ("b", "purchase", 1L))
      .toDF("from_state", "to_state", "n")
    val got = Markov.removalAttribution(trans, "purchase", 8)
      .collect().map(r => r.getString(0) -> r).toMap
    for (s <- Seq("a", "b")) {
      val r = got(s)
      assert(r.getAs[Double]("p_full_r") == 1.0)
      assert(r.getAs[Double]("p_removed_r") == 0.5)
      assert(r.getAs[Double]("removal_effect_r") == 0.5)
      assert(r.getAs[Double]("attribution_r") == 0.5)
    }
  }

  test("removalAttribution: stranded START reports p_removed=0") {
    import spark.implicits._
    val trans = Seq(("START", "a", 1L), ("a", "purchase", 1L))
      .toDF("from_state", "to_state", "n")
    val r = Markov.removalAttribution(trans, "purchase", 8)
      .collect()
    assert(r.length == 1 && r.head.getString(0) == "a")
    assert(r.head.getAs[Double]("p_removed_r") == 0.0)
    assert(r.head.getAs[Double]("removal_effect_r") == 1.0)
    assert(r.head.getAs[Double]("attribution_r") == 1.0)
  }

  test("absorptionProfile: closed-form two-state chain") {
    import spark.implicits._
    // START→a always; a converts half the time, else END.
    val trans = Seq(
      ("START", "a", 2L), ("a", "purchase", 1L), ("a", "END", 1L))
      .toDF("from_state", "to_state", "n")
    val got = Markov.absorptionProfile(trans, "purchase", 8)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("a").getAs[Double]("p_conv_r") == 0.5)
    assert(got("a").getAs[Double]("steps_r") == 1.0)
    assert(got("START").getAs[Double]("p_conv_r") == 0.5)
    assert(got("START").getAs[Double]("steps_r") == 2.0)
  }

  test("orderTest: first-order chain gives G2 = 0") {
    import spark.implicits._
    // A B A B A: every trigram's next state is determined by the
    // middle alone, so P(c|ab) = P(c|b) exactly
    val ev = Seq((1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"),
      (1L, 4L, "B"), (1L, 5L, "A")).toDF("user_id", "event_id",
      "event_type")
    val r = Markov.orderTest(ev, "user_id", "event_type",
      Seq(col("event_id"))).collect()(0)
    assert(r.getAs[Long]("n_trigrams") == 3L)
    assert(r.getAs[Long]("m_states") == 2L)
    assert(r.getAs[Long]("df") == 2L)
    assert(r.getAs[Double]("g2_r") == 0.0)
  }

  test("orderTest: second-order dependence gives G2 = 4 ln 2") {
    import spark.implicits._
    // X A P vs Y A Q: what follows A is fully determined by what
    // PRECEDED it — each term contributes ln(1*2 / (1*1)) = ln 2
    val ev = Seq((1L, 1L, "X"), (1L, 2L, "A"), (1L, 3L, "P"),
      (2L, 1L, "Y"), (2L, 2L, "A"), (2L, 3L, "Q"))
      .toDF("user_id", "event_id", "event_type")
    val r = Markov.orderTest(ev, "user_id", "event_type",
      Seq(col("event_id"))).collect()(0)
    assert(r.getAs[Long]("n_trigrams") == 2L)
    assert(r.getAs[Long]("m_states") == 5L)
    assert(r.getAs[Long]("df") == 80L)
    assert(math.abs(r.getAs[Double]("g2_r") - 4 * math.log(2)) < 1e-6)
  }

  test("entropyProduction: a reversible shuttle gives EP ~ 0; an " +
      "asymmetric flow gives the hand value (n-nr)ln(n/nr)") {
    import spark.implicits._
    def evs(user: Long, types: Seq[String]) = types.zipWithIndex.map {
      case (t, i) => (user, t,
        new java.sql.Timestamp(1000L * (i + 1)), i.toLong)
    }
    // A,B repeated: A->B 3, B->A 2 -> EP = (3-2) ln(3/2)
    val df = evs(1L, Seq("A", "B", "A", "B", "A", "B"))
      .toDF("user_id", "event_type", "ts", "event_id")
    val r = Markov.entropyProduction(df, "user_id", "event_type",
      Seq(org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("event_id"))).collect()(0)
    assert(r.getAs[Long]("n_transitions") == 5)
    assert(r.getAs[Long]("n_pairs") == 1)
    assert(r.getAs[Long]("n_onesided") == 0)
    assert(math.abs(r.getAs[Double]("ep_r") - math.log(1.5)) < 1e-6)
    // one-way loop A->B->C->A: every pair one-sided, EP = 0 by the
    // documented exclusion
    val loop = evs(1L, Seq("A", "B", "C", "A", "B", "C", "A"))
      .toDF("user_id", "event_type", "ts", "event_id")
    val rl = Markov.entropyProduction(loop, "user_id", "event_type",
      Seq(org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("event_id"))).collect()(0)
    assert(rl.getAs[Long]("n_onesided") == 3)
    assert(rl.getAs[Long]("n_pairs") == 0)
    assert(rl.getAs[Double]("ep_r") == 0.0)
  }
}
