package graft.ops

import graft.SparkTestBase

class GraphsSpec extends SparkTestBase {
  import spark.implicits._

  test("coOccurrenceEdges orients src<dst, dedups within group, thresholds") {
    val df = Seq(
      (10L, 2L), (10L, 1L), (10L, 2L), // group 10: edge (1,2), dup item
      (20L, 1L), (20L, 2L),            // edge (1,2) again → support 2
      (30L, 1L), (30L, 3L)             // edge (1,3) support 1
    ).toDF("g", "i")
    val e = Graphs.coOccurrenceEdges(df, "g", "i", 2L).collect()
    assert(e.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, 2L)))
  }

  test("triangleCounts finds each triangle once, per-vertex counts") {
    // K4 on {1,2,3,4} minus edge (3,4): triangles (1,2,3) and (1,2,4)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
      .toDF("src", "dst")
    val got = Graphs.triangleCounts(edges).orderBy("vertex").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got == Seq(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("open wedges produce no triangles") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    assert(Graphs.triangleCounts(edges).isEmpty)
  }

  test("end-to-end: co-occurrence graph of a shared group is a clique") {
    val df = Seq((1L, 1L), (1L, 2L), (1L, 3L)).toDF("g", "i")
    val tri = Graphs.triangleCounts(Graphs.coOccurrenceEdges(df, "g", "i", 1L))
      .orderBy("vertex").collect().map(r => r.getLong(1)).toSeq
    assert(tri == Seq(1L, 1L, 1L))
  }
}
