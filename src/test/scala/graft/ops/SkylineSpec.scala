package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SkylineSpec extends SparkTestBase {
  import spark.implicits._

  test("frontier2D: domination semantics (hand case) — equal y at a " +
      "larger x is dominated; larger y survives") {
    val d = Seq(("g", 1L, 5.0), ("g", 2L, 7.0), ("g", 3L, 7.0),
      ("g", 4L, 6.0), ("g", 2L, 3.0)) // second row at x=2 collapses
      .toDF("grp", "x", "y")
    val got = Skyline.frontier2D(d, "grp", "x", "y")
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    // (3,7) is dominated by (2,7) (same y, strictly smaller x);
    // (4,6) by (2,7)
    assert(got == Set((1L, 5.0), (2L, 7.0)))
  }

  test("frontier2D ≡ brute-force NOT EXISTS on fixed-seed random data, " +
      "per group") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(300)((s"g${rnd.nextInt(3)}",
      rnd.nextInt(40).toLong, (rnd.nextInt(500) / 10.0)))
    val df = rows.toDF("grp", "x", "y")
    val got = Skyline.frontier2D(df, "grp", "x", "y")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // brute force: points (after best-y-per-x collapse) not dominated by
    // any other point (x' <= x, y' >= y, strictly better somewhere)
    val best = rows.groupBy(r => (r._1, r._2)).map { case ((g, x), rs) =>
      (g, x, rs.map(_._3).max)
    }.toSeq
    val want = best.filter { case (g, x, y) =>
      !best.exists { case (g2, x2, y2) =>
        g2 == g && x2 <= x && y2 >= y && (x2 < x || y2 > y)
      }
    }.toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }
}
