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

  // ---- HyperLogLog

  private val P = 8
  private val M = 1 << P

  /** The op's exact register arithmetic, recomputed on the JVM. */
  private def hllModel(keys: Seq[Long]): Map[Long, Long] =
    keys.map { k =>
      val hex = MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val h = java.lang.Long.parseLong(hex, 16)
      val idx = h % M
      val w = h >> P
      val rho =
        if (w == 0) (60 - P) + 1
        else (60 - P) + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      idx -> rho.toLong
    }.groupBy(_._1).map { case (i, rs) => i -> rs.map(_._2).max }

  test("hllRegisters == JVM model register-for-register; duplicates " +
      "move nothing") {
    val keys = (1L to 500L)
    val dup = keys ++ keys.take(100) ++ keys.take(100)
    val got = Sketches.hllRegisters(dup.toDF("id"), "id", P)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == hllModel(keys), "registers must equal the JVM model")
  }

  test("hll registers merge by elementwise max (union == max of parts)") {
    val a = (1L to 300L)
    val b = (200L to 700L)
    def regs(ks: Seq[Long]) = Sketches.hllRegisters(ks.toDF("id"), "id", P)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val whole = regs((a ++ b).distinct)
    val pa = regs(a)
    val pb = regs(b)
    val merged = (pa.keySet ++ pb.keySet).map(i =>
      i -> math.max(pa.getOrElse(i, 0L), pb.getOrElse(i, 0L))).toMap
    assert(whole == merged, "register max-merge must equal union's table")
  }

  test("hllEstimate: raw path within 3σ = 3·1.04/√m of a 5000-key " +
      "truth; linear-counting path handles a 30-key set") {
    val big = Sketches.hllEstimate(
      Sketches.hllRegisters((1L to 5000L).toDF("id"), "id", P), P)
      .collect().head
    val estBig = big.getAs[Double]("est")
    assert(math.abs(estBig - 5000.0) / 5000.0 < 3 * 1.04 / math.sqrt(M),
      s"raw estimate $estBig too far from 5000")
    val small = Sketches.hllEstimate(
      Sketches.hllRegisters((1L to 30L).toDF("id"), "id", P), P)
      .collect().head
    val estSmall = small.getAs[Double]("est")
    // 30 ≪ 2.5m with zero registers → the linear-counting branch, which
    // is near-exact at this occupancy
    assert(small.getAs[Long]("v_zero") > 0)
    assert(math.abs(estSmall - 30.0) / 30.0 < 0.15,
      s"linear-counting estimate $estSmall too far from 30")
  }

  test("hllEstimate == JVM float model (same alpha, same branch)") {
    val keys = (1L to 1200L)
    val regs = hllModel(keys)
    val z = (0 until M).map(i =>
      math.pow(2.0, -regs.getOrElse(i.toLong, 0L).toDouble)).sum
    val v = (0 until M).count(i => !regs.contains(i.toLong))
    val alphaMM = Sketches.hllAlpha(M) * M * M
    val raw = alphaMM / z
    val want =
      if (v > 0 && raw <= 2.5 * M) M * math.log(M.toDouble / v) else raw
    val got = Sketches.hllEstimate(
      Sketches.hllRegisters(keys.toDF("id"), "id", P), P)
      .collect().head.getAs[Double]("est")
    assert(math.abs(got - want) < 1e-6,
      s"engine $got vs JVM model $want")
  }

  test("hllOverlap: identical sets give intersect == each estimate; " +
      "disjoint sets stay within the sketch error of zero") {
    import spark.implicits._
    val xs = (0L until 3000L).toDF("k")
    val same = Sketches.hllOverlap(xs, xs, "k", 8).head
    assert(same.getDouble(0) == same.getDouble(1), "est_a == est_b")
    assert(same.getDouble(2) == same.getDouble(0), "union of equals")
    assert(math.abs(same.getDouble(3) - same.getDouble(0)) < 1e-6)
    val ys = (100000L until 103000L).toDF("k")
    val disj = Sketches.hllOverlap(xs, ys, "k", 8).head
    // 3σ ≈ 3·1.04/√256 ≈ 20% of 3000 per estimate; I-E compounds ×3
    assert(math.abs(disj.getDouble(3)) < 3 * 3 * 0.065 * 3000,
      disj.toString)
  }

  test("amsF2: a single repeated key is estimated EXACTLY (every trial " +
      "sums to ±n), and exact F2 is right on a permutation") {
    import spark.implicits._
    val rep = Seq.fill(37)("k").toDF("key")
    val r = Sketches.amsF2(rep, "key", trials = 9).head
    // f2_exact = 37² and every S_t = ±37 → est = 37² with zero error
    assert((r.getLong(0), r.getLong(1), r.getDouble(2))
      == (1369L, 1369L, 0.0), r.toString)
    val perm = (1 to 64).map(_.toString).toDF("key")
    val p = Sketches.amsF2(perm, "key", trials = 9).head
    assert(p.getLong(0) == 64L, "distinct keys: F2 = n")
    assert(p.getLong(1) >= 0L, "estimate is a square")
    // deterministic hashing → two runs agree bit-for-bit
    val p2 = Sketches.amsF2(perm, "key", trials = 9).head
    assert(p.getLong(1) == p2.getLong(1) && p.getDouble(2) == p2.getDouble(2))
  }

  test("kmvDistinct: EXACT below k (kth_hash null), estimates within " +
      "the sketch error above k, duplicates never inflate the sketch") {
    val rows = ((1 to 30).map(i => ("small", i)) ++
      (1 to 30).map(i => ("small", i)) ++ // duplicates
      (1 to 5000).map(i => ("big", i)))
      .toDF("grp", "id")
    val got = Sketches.kmvDistinct(rows, "grp", "id", 64)
      .collect().map(r => r.getString(0) -> r).toMap
    val small = got("small")
    assert(small.getAs[Long]("k_used") == 30)
    assert(small.isNullAt(small.fieldIndex("kth_hash")))
    assert(small.getAs[Double]("est_r") == 30.0, "below k the sketch is exact")
    val big = got("big")
    assert(big.getAs[Long]("k_used") == 64)
    val est = big.getAs[Double]("est_r")
    // σ ≈ 1/√62 ≈ 12.7%; allow 4σ
    assert(math.abs(est - 5000) / 5000 < 0.51, s"est=$est")
    // determinism
    val again = Sketches.kmvDistinct(rows, "grp", "id", 64)
      .collect().map(r => r.getString(0) ->
        r.getAs[Double]("est_r")).toMap
    assert(again("big") == est)
  }

  test("kmvSetAlgebra: disjoint small sets are EXACT (J=0); identical " +
      "sets give J=1; half-overlap is exact below k") {
    val rows = ((1 to 20).map(i => ("a", i)) ++
      (21 to 40).map(i => ("b", i)) ++ // disjoint from a
      (1 to 20).map(i => ("c", i)) ++ // identical to a
      (11 to 30).map(i => ("d", i))) // half-overlaps a
      .toDF("grp", "id")
    val got = Sketches.kmvSetAlgebra(rows, "grp", "id", 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = got(("a", "b"))
    assert(ab.getAs[Long]("k_union") == 40)
    assert(ab.getAs[Double]("jaccard_r") == 0.0)
    assert(ab.getAs[Double]("est_inter_r") == 0.0)
    assert(ab.getAs[Double]("est_union_r") == 40.0)
    val ac = got(("a", "c"))
    assert(ac.getAs[Double]("jaccard_r") == 1.0)
    assert(ac.getAs[Double]("est_union_r") == 20.0)
    assert(ac.getAs[Double]("est_inter_r") == 20.0)
    val ad = got(("a", "d"))
    assert(ad.getAs[Long]("k_union") == 30)
    assert(ad.getAs[Long]("n_both") == 10)
    assert(ad.getAs[Double]("jaccard_r") == 0.333333)
    assert(ad.getAs[Double]("est_inter_r") == 10.0)
  }

  test("KMinValues reduce/merge: sorted-insert short-circuit path equals " +
      "the naive distinct-sort-take over any input order and split") {
    val kmv = new KMinValues(8)
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val n = 1 + rng.nextInt(40)
      val xs = Seq.fill(n)(rng.nextInt(20).toLong) // dense → many dups
      val want = xs.distinct.sorted.take(8)
      // single-fold path (reduce only)
      val folded = xs.foldLeft(kmv.zero)(kmv.reduce)
      assert(kmv.finish(folded) == want, s"reduce path, xs=$xs")
      // split-fold + merge path, at every split point
      for (cut <- 0 to n) {
        val (l, r) = xs.splitAt(cut)
        val m = kmv.merge(l.foldLeft(kmv.zero)(kmv.reduce),
          r.foldLeft(kmv.zero)(kmv.reduce))
        assert(kmv.finish(m) == want, s"merge at $cut, xs=$xs")
      }
      // invariant after every reduce step: sorted ascending, distinct, ≤ k
      xs.scanLeft(kmv.zero)(kmv.reduce).foreach { b =>
        assert(b == b.distinct.sorted && b.size <= 8, s"invariant, b=$b")
      }
    }
  }
}
