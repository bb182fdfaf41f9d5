package graft.ops

import graft.SparkTestBase

/** Perceptual dHash: exact hash values on synthetic gradients (all
  * bits set / cleared), orientation handling, invariance between an
  * image and its brightness-shifted copy, pigeonhole pair recall at
  * small Hamming distance, and the non-image / too-small guards. */
class ImageDHashSpec extends SparkTestBase {

  private def le16(v: Int) = Array(v & 0xff, (v >> 8) & 0xff)
  private def le32(v: Int) =
    Array(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)
  private def ascii(s: String) = s.getBytes("US-ASCII").map(_ & 0xff)

  /** Bottom-up (positive height) 24-bpp BMP; pix is top-down rows. */
  private def bmp24(pix: Seq[Seq[(Int, Int, Int)]]): Array[Byte] = {
    val h = pix.size; val w = pix.head.size
    val stride = ((3 * w + 3) / 4) * 4
    val rows = pix.reverse.flatMap { row =>
      row.flatMap { case (r, g, b) => Seq(b, g, r) } ++
        Seq.fill(stride - 3 * w)(0)
    }
    val off = 54
    val hdr = ascii("BM") ++ le32(off + rows.size) ++ le32(0) ++
      le32(off) ++ le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++
      le16(24) ++ le32(0) ++ le32(rows.size) ++ Seq.fill(16)(0)
    (hdr ++ rows).map(_.toByte)
  }

  private def gray(v: Int) = (v, v, v)

  test("imageDHash: monotone gradients give all-ones / all-zeros") {
    import spark.implicits._
    // 9 columns with strictly increasing luma → every right-neighbor
    // comparison true → all 64 bits set (hash = -1); decreasing → 0.
    val inc = bmp24(Seq.fill(8)((0 until 9).map(i => gray(i * 20))))
    val dec = bmp24(Seq.fill(8)((0 until 9).map(i => gray(200 - i * 20))))
    val got = Multimodal.imageDHash(
        Seq((1L, inc), (2L, dec)).toDF("id", "payload"), "id", "payload")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == -1L, s"increasing gradient: ${got(1L)}")
    assert(got(2L) == 0L, s"decreasing gradient: ${got(2L)}")
  }

  test("imageDHash: brightness shift is hash-invariant; pairs found") {
    import spark.implicits._
    // a fixed random-ish pattern and the same pattern +40 luma: the
    // ORDER of adjacent cells never changes → identical hashes
    val base = (0 until 8).map(y => (0 until 9).map(i =>
      gray((i * 37 + y * 11) % 180)))
    val shifted = base.map(_.map { case (r, _, _) => gray(r + 40) })
    val df = Seq((1L, bmp24(base)), (2L, bmp24(shifted))).toDF("id", "p")
    val hashes = Multimodal.imageDHash(df, "id", "p")
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) == hs(2L), "brightness shift must not change dHash")
    val pairs = Multimodal.imageDHashPairs(hashes, "id", "dhash", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0)))
  }

  test("imageDHashPairs: distance over threshold is excluded") {
    import spark.implicits._
    // hashes differing in 4 bits spread across all 4 bands: no band
    // agrees AND hamming > 3 → no pair at maxHamming 3
    val far = Seq((1L, 0L), (2L, (1L << 0) | (1L << 16) | (1L << 32) |
      (1L << 48))).toDF("id", "dhash")
    assert(Multimodal.imageDHashPairs(far, "id", "dhash", 3)
      .collect().isEmpty)
    // 1-bit difference: caught
    val near = Seq((1L, 0L), (2L, 1L << 63)).toDF("id", "dhash")
    val got = Multimodal.imageDHashPairs(near, "id", "dhash", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 2L, 1)))
  }

  test("imageDHash: non-BMP and sub-grid images yield no row") {
    import spark.implicits._
    val tiny = bmp24(Seq.fill(8)((0 until 4).map(gray))) // w=4 < 9
    val df = Seq((1L, "nope".getBytes), (2L, tiny)).toDF("id", "p")
    assert(Multimodal.imageDHash(df, "id", "p").collect().isEmpty)
  }
}
