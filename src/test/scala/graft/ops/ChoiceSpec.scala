package graft.ops

import graft.SparkTestBase

class ChoiceSpec extends SparkTestBase {

  test("bradleyTerry: two items reach the closed-form fixed point " +
      "W_a/(W_a+W_b) in one step and stay there") {
    import spark.implicits._
    // A beats B 3 of 4: the sum-normalized MLE is p = (0.75, 0.25)
    val duels = Seq(("A", "B"), ("A", "B"), ("A", "B"), ("B", "A"))
      .toDF("winner", "loser")
    val got = Choice.bradleyTerry(duels, "winner", "loser", 10)
      .collect().sortBy(_.getAs[Int]("rnk"))
    assert(got.length == 2)
    assert(got(0).getAs[String]("item") == "A")
    assert(got(0).getAs[Long]("w") == 3)
    assert(got(0).getAs[Double]("p_r") == 0.75)
    assert(got(1).getAs[String]("item") == "B")
    assert(got(1).getAs[Double]("p_r") == 0.25)
  }

  test("bradleyTerry: transitive duels rank A > B > C; strengths sum " +
      "to 1; a winless item goes to zero") {
    import spark.implicits._
    val duels = Seq(("A", "B"), ("A", "B"), ("B", "C"), ("B", "C"),
      ("A", "C"), ("A", "C")).toDF("winner", "loser")
    val got = Choice.bradleyTerry(duels, "winner", "loser", 20)
      .collect().sortBy(_.getAs[Int]("rnk"))
    assert(got.map(_.getAs[String]("item")).toSeq == Seq("A", "B", "C"))
    val ps = got.map(_.getAs[Double]("p_r"))
    assert(ps(0) > ps(1) && ps(1) > ps(2), ps.toSeq.toString)
    assert(math.abs(ps.sum - 1.0) < 1e-5)
    // C never wins: its MM numerator is 0, so p_C -> 0 monotonically
    assert(ps(2) < 0.02, ps.toSeq.toString)
  }

  test("bradleyTerry: the conf-gated item cap fails loudly on an " +
      "over-cap catalog (driver-OOM guard)") {
    import spark.implicits._
    val duels = Seq(("A", "B"), ("B", "C"), ("C", "A"))
      .toDF("winner", "loser")
    spark.conf.set("spark.graft.driverLocal.itemCap", "2")
    try {
      val e = intercept[IllegalArgumentException] {
        Choice.bradleyTerry(duels, "winner", "loser", 2)
      }
      assert(e.getMessage.contains("driver-local"), e.getMessage)
    } finally spark.conf.unset("spark.graft.driverLocal.itemCap")
  }
}
