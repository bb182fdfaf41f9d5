package graft.ops

import graft.SparkTestBase

/** Hand cases for the spatial-autocorrelation batch: Moran's I,
  * Geary's C, join counts, Getis–Ord General G, local Moran — on tiny
  * planted lattices where the statistics have closed forms. Points are
  * placed at cell centers (h = 1, coordinates k + 0.5). */
class SpatialSpec extends SparkTestBase {
  import spark.implicits._

  /** n points at the center of cell (cx, cy). */
  private def at(n: Int, cx: Int, cy: Int): Seq[(Double, Double)] =
    Seq.fill(n)((cx + 0.5, cy + 0.5))

  test("moranI: a perfect 2x2 checkerboard gives I = -1 (maximal " +
      "negative autocorrelation); E[I] = -1/3") {
    // counts 2,0 / 0,2 on a 2x2 lattice: all 8 directed rook pairs
    // cross-colored, d in {+4,-4}, num = 8*(-16), W=8, sum_d2 = 4*16
    val pts = (at(2, 0, 0) ++ at(2, 1, 1)).toDF("x", "y")
    val r = Spatial.moranI(pts, "x", "y", 1.0).collect()(0)
    assert(r.getAs[Long]("n_cells") == 4)
    assert(r.getAs[Long]("n_occupied") == 2)
    assert(r.getAs[Long]("w") == 8)
    assert(r.getAs[Double]("i_r") == -1.0, r.toString)
    assert(math.abs(r.getAs[Double]("e_i_r") - (-1.0 / 3)) < 1e-12)
  }

  test("moranI: a left-heavy strip (3,3,0,1 on 1x4) gives I > E[I] " +
      "(positive clumping)") {
    // d = 4x-7 = (5,5,-7,-3); directed pair products 25*2-35*2+21*2
    // = 22 > 0; sum_d2 = 108; I = 4*22/(6*108) ~ 0.136 > -1/3
    val blob = (at(3, 0, 0) ++ at(3, 1, 0) ++ at(1, 3, 0))
      .toDF("x", "y")
    val rb = Spatial.moranI(blob, "x", "y", 1.0).collect()(0)
    assert(rb.getAs[Long]("n_cells") == 4)
    assert(rb.getAs[Double]("i_r") > rb.getAs[Double]("e_i_r"),
      rb.toString)
  }

  test("gearyC: the checkerboard maximizes local differences " +
      "(C = 1.5 on the 2x2; C > 1 = negative autocorrelation)") {
    // num = 8 directed pairs * (2-0)^2 = 32; sum_d2 = 64;
    // C = 3*16*32/(2*8*64) = 1536/1024 = 1.5
    val pts = (at(2, 0, 0) ++ at(2, 1, 1)).toDF("x", "y")
    val r = Spatial.gearyC(pts, "x", "y", 1.0).collect()(0)
    assert(r.getAs[Long]("w") == 8)
    assert(r.getAs[Double]("c_r") == 1.5, r.toString)
  }

  test("joinCounts: checkerboard has zero BB and zero WW — every " +
      "rook join is BW") {
    val pts = (at(2, 0, 0) ++ at(2, 1, 1)).toDF("x", "y")
    val r = Spatial.joinCounts(pts, "x", "y", 1.0).collect()(0)
    assert(r.getAs[Long]("bb") == 0)
    assert(r.getAs[Long]("ww") == 0)
    assert(r.getAs[Long]("bw") == 4)
    // E[BW] = W*p*q = 8 * 0.5 * 0.5 = 2 -> observed BW double expected
    assert(r.getAs[Double]("e_bw_r") == 2.0, r.toString)
  }

  test("getisG: all mass in adjacent cells pushes G above E[G]") {
    // 3,3 adjacent on a 1x2 lattice: num = 2*9, den = 36-18 = 18
    // -> G = 1; E[G] = W/(n(n-1)) = 2/2 = 1 (tiny lattice: equal);
    // on a 2x2 lattice with the far corner occupied instead G < 1
    val near = (at(3, 0, 0) ++ at(3, 1, 0)).toDF("x", "y")
    val rn = Spatial.getisG(near, "x", "y", 1.0).collect()(0)
    assert(rn.getAs[Double]("g_r") == 1.0, rn.toString)
    val far = (at(3, 0, 0) ++ at(3, 1, 1)).toDF("x", "y")
    val rf = Spatial.getisG(far, "x", "y", 1.0).collect()(0)
    // diagonal cells share no rook edge: numerator 0
    assert(rf.getAs[Double]("g_r") == 0.0, rf.toString)
    assert(rf.getAs[Double]("e_g_r") > 0.0)
  }

  test("localMoran: the hot core cell of a plus-shaped blob carries " +
      "the largest positive li; ordering is |li| desc") {
    // center cell 5, four rook neighbors 3 each, on a 3x3 lattice
    val pts = (at(5, 1, 1) ++ at(3, 0, 1) ++ at(3, 2, 1)
      ++ at(3, 1, 0) ++ at(3, 1, 2)).toDF("x", "y")
    val rows = Spatial.localMoran(pts, "x", "y", 1.0, 9).collect()
    assert(rows.length == 9)
    // li sorted non-increasing in |li|
    val lis = rows.map(r => r.getAs[java.math.BigDecimal]("li")
      .abs.doubleValue())
    assert(lis.zip(lis.tail).forall { case (a, b) => a >= b })
    val top = rows(0)
    assert(top.getAs[Long]("cx") == 1 && top.getAs[Long]("cy") == 1)
    assert(top.getAs[java.math.BigDecimal]("li").signum() > 0)
  }

  test("lattice: bounding box zero-fills interior holes") {
    val pts = (at(1, 0, 0) ++ at(1, 2, 2)).toDF("x", "y")
    val lat = Spatial.lattice(pts, "x", "y", 1.0).collect()
    assert(lat.length == 9)
    assert(lat.count(_.getAs[Long]("_x") == 0L) == 7)
  }
}
