package graft.ops

import graft.SparkTestBase

class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val vocab = Seq("small ring", "small king", "large ring",
    "blue bolt").toDF("name")

  test("bestMatch repairs a head-corrupted string within the block") {
    val dirty = Seq((1L, "zmall ring")).toDF("id", "s")
    val got = FuzzyJoin.bestMatch(dirty, "s", vocab, "name", 1).collect()
    assert(got.length == 1)
    val r = got.head
    // both "small ring" and "small king"? no — "zmall ring" vs
    // "small king" differs at positions 1 and 7 → dist 2, filtered.
    assert(r.getAs[String]("matched") == "small ring")
    assert(r.getAs[Long]("match_dist") == 1L)
  }

  test("ties broken by (distance, candidate) — deterministic best") {
    // "zmall qing" is dist 2 from both ring/king variants → no match at 1;
    // at maxDist 2 both qualify, lexicographic min wins
    val dirty = Seq((1L, "zmall qing")).toDF("id", "s")
    val got = FuzzyJoin.bestMatch(dirty, "s", vocab, "name", 2).collect()
    assert(got.length == 1)
    assert(got.head.getAs[String]("matched") == "small king")
  }

  test("no candidate within distance → row dropped (inner semantics)") {
    val dirty = Seq((1L, "qqqqqqqqqq")).toDF("id", "s")
    assert(FuzzyJoin.bestMatch(dirty, "s", vocab, "name", 1).isEmpty)
  }

  test("exact matches survive with distance 0") {
    val dirty = Seq((1L, "blue bolt")).toDF("id", "s")
    val r = FuzzyJoin.bestMatch(dirty, "s", vocab, "name", 1).collect().head
    assert(r.getAs[String]("matched") == "blue bolt")
    assert(r.getAs[Long]("match_dist") == 0L)
  }

  test("length-changing corruption falls outside the block (documented recall)") {
    val dirty = Seq((1L, "small ringg")).toDF("id", "s") // length 11 vs 10
    assert(FuzzyJoin.bestMatch(dirty, "s", vocab, "name", 1).isEmpty)
  }
}
