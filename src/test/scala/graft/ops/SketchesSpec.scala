package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The Count-Min contract: estimates never undercount, match a JVM
  * brute-force model of the identical hash arithmetic cell-for-cell,
  * collapse to exact counts when the sketch is wide enough, and merge
  * by cell-wise sum (sketch of a union == summed sketches). */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  private val Depth = 4
  private val Width = 32

  /** The op's exact position arithmetic, recomputed on the JVM. */
  private def positions(key: Long): Seq[(Int, Long)] = (0 until Depth).map { j =>
    val h = MessageDigest.getInstance("MD5")
      .digest(s"$key#$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    j -> java.lang.Long.parseLong(h, 16) % Width
  }

  test("estimate == JVM brute-force cell model; est >= true always; " +
      "unseen keys can only overcount, never fabricate a negative") {
    val rnd = new scala.util.Random(7)
    // zipf-ish: key k appears ~ 200/k times, so collisions are uneven
    val stream = (1L to 40L).flatMap(k => Seq.fill((200 / k).toInt)(k))
    val trueCnt = stream.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong }
    val sketch = Sketches.cmsBuild(stream.toDF("id"), "id", Depth, Width)
    // JVM model: counters keyed by (row, pos)
    val counters = stream.flatMap(positions)
      .groupBy(identity).map { case (c, v) => c -> v.size.toLong }
    val probeKeys = (1L to 40L) ++ Seq.fill(20)(rnd.nextLong().abs % 1000L)
    val got = Sketches.cmsEstimate(probeKeys.distinct.toDF("id"), "id",
        sketch, Depth, Width)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    probeKeys.distinct.foreach { k =>
      val want = positions(k).map(counters.getOrElse(_, 0L)).min
      assert(got(k) == want, s"key $k: got ${got(k)} model $want")
      assert(got(k) >= trueCnt.getOrElse(k, 0L),
        s"key $k undercounted: ${got(k)} < ${trueCnt.getOrElse(k, 0L)}")
    }
  }

  test("wide sketch (no collisions) is exact; sketch size <= depth*width") {
    val data = (1L to 50L).flatMap(k => Seq.fill(k.toInt)(k))
    val wide = 4096
    val sketch = Sketches.cmsBuild(data.toDF("id"), "id", Depth, wide)
    assert(sketch.count() <= Depth.toLong * wide)
    val got = Sketches.cmsEstimate((1L to 50L).toDF("id"), "id", sketch,
        Depth, wide)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 50L).foreach(k => assert(got(k) == k, s"key $k: ${got(k)}"))
  }

  test("mergeable: sketch(A ++ B) == cell-wise sum of sketch(A), sketch(B)") {
    val a = (1L to 30L).flatMap(k => Seq.fill(3)(k))
    val b = (20L to 60L).flatMap(k => Seq.fill(2)(k))
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = cells(Sketches.cmsBuild((a ++ b).toDF("id"), "id", Depth, Width))
    val pa = cells(Sketches.cmsBuild(a.toDF("id"), "id", Depth, Width))
    val pb = cells(Sketches.cmsBuild(b.toDF("id"), "id", Depth, Width))
    val merged = (pa.keySet ++ pb.keySet).map(c =>
      c -> (pa.getOrElse(c, 0L) + pb.getOrElse(c, 0L))).toMap
    assert(whole == merged, "cell-wise sum must equal the union's sketch")
  }

  test("the probe plan broadcasts the sketch") {
    val sketch = Sketches.cmsBuild((1L to 100L).toDF("id"), "id", Depth, Width)
    val plan = Sketches.cmsEstimate((1L to 10L).toDF("id"), "id", sketch,
      Depth, Width).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"probe must broadcast the sketch:\n$plan")
  }
}
