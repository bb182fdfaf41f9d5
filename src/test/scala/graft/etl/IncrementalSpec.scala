package graft.etl

import graft.SparkTestBase

/** O4/O8/O9 invariants (SURVEY.md §5.2): the incremental filter is a set
  * difference — disjoint from the sink, subset of fetched, idempotent. */
class IncrementalSpec extends SparkTestBase {
  import spark.implicits._

  private def fixture = {
    val fetched = Seq("a", "b", "b", "c", "d").toDF("videoId")
    val sink = Seq("b", "d", "e").toDF("videoId")
    (fetched, sink)
  }

  test("newKeys = dedup(fetched) minus sink") {
    val (fetched, sink) = fixture
    val got = Incremental.newKeys(fetched, sink, "videoId")
      .as[String].collect().sorted.toSeq
    assert(got == Seq("a", "c"))
  }

  test("newKeys is disjoint from sink and a subset of fetched") {
    val (fetched, sink) = fixture
    val fresh = Incremental.newKeys(fetched, sink, "videoId")
    assert(fresh.join(sink, Seq("videoId"), "left_semi").isEmpty)
    assert(fresh.join(fetched, Seq("videoId"), "left_anti").isEmpty)
  }

  test("idempotence: filtering twice adds nothing (run(run(S)) == run(S))") {
    val (fetched, sink) = fixture
    val once = Incremental.newKeys(fetched, sink, "videoId")
    val twice = Incremental.newKeys(once, sink, "videoId")
    assert(once.as[String].collect().sorted.toSeq ==
      twice.as[String].collect().sorted.toSeq)
    // after appending to the sink, nothing is new — the :152-165 invariant
    val appended = sink.union(once)
    assert(Incremental.incrementalBatch(fetched, appended, "videoId").isEmpty)
  }

  test("empty sink passes everything; empty fetched yields nothing") {
    val (fetched, _) = fixture
    val empty = Seq.empty[String].toDF("videoId")
    assert(Incremental.newKeys(fetched, empty, "videoId").count() == 4)
    assert(Incremental.newKeys(empty, fetched, "videoId").isEmpty)
  }
}
