package graft.ops

import graft.SparkTestBase

/** Byte-accurate image header parsing — hand-crafted minimal headers for
  * each container format, plus the garbage-tolerance contract. */
class ImageHeaderSpec extends SparkTestBase {
  import spark.implicits._

  private def png(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdrLen = Array(0, 0, 0, 13)
    val ihdrTag = "IHDR".getBytes("ASCII").map(_.toInt)
    val dims = Array(w >> 24, w >> 16, w >> 8, w, h >> 24, h >> 16, h >> 8, h)
    (sig ++ ihdrLen ++ ihdrTag ++ dims).map(_.toByte)
  }

  private def gif(w: Int, h: Int): Array[Byte] =
    ("GIF89a".getBytes("ASCII").map(_.toInt) ++
      Array(w & 0xff, w >> 8, h & 0xff, h >> 8)).map(_.toByte)

  private def bmp(w: Int, h: Int): Array[Byte] = {
    val le32 = (v: Int) => Array(v, v >> 8, v >> 16, v >> 24)
    (Array('B'.toInt, 'M'.toInt) ++ Array.fill(12)(0) ++ le32(40) ++
      le32(w) ++ le32(h)).map(_.toByte)
  }

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    val app0 = Array(0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46) // 4-byte segment
    val sof0 = Array(0xff, 0xc0, 0x00, 0x0b, 0x08,
      h >> 8, h & 0xff, w >> 8, w & 0xff, 0x01, 0x00)
    (Array(0xff, 0xd8) ++ app0 ++ sof0).map(_.toByte)
  }

  test("PNG/GIF/BMP/JPEG dimensions parse from their native byte layouts") {
    assert(Multimodal.parseImageHeader(png(1920, 1080)) ==
      ("png", 1920, 1080))
    assert(Multimodal.parseImageHeader(gif(640, 480)) == ("gif", 640, 480))
    assert(Multimodal.parseImageHeader(bmp(800, 600)) == ("bmp", 800, 600))
    assert(Multimodal.parseImageHeader(jpeg(4032, 3024)) ==
      ("jpeg", 4032, 3024))
  }

  test("JPEG: DHT before SOF is skipped, not mistaken for a frame header") {
    val dht = Array(0xff, 0xc4, 0x00, 0x05, 0x00, 0x01, 0x02)
    val sof2 = Array(0xff, 0xc2, 0x00, 0x0b, 0x08, 0x00, 0x64, 0x00,
      0xc8, 0x01, 0x00) // progressive SOF2, 200x100
    val b = (Array(0xff, 0xd8) ++ dht ++ sof2).map(_.toByte)
    assert(Multimodal.parseImageHeader(b) == ("jpeg", 200, 100))
  }

  test("BMP top-down (negative height) reports absolute height") {
    val b = bmp(10, -20)
    assert(Multimodal.parseImageHeader(b) == ("bmp", 10, 20))
  }

  test("garbage, truncated, and null payloads yield nulls, never throw") {
    assert(Multimodal.parseImageHeader(null) == (null, null, null))
    assert(Multimodal.parseImageHeader(Array[Byte]()) == (null, null, null))
    assert(Multimodal.parseImageHeader("not an image".getBytes) ==
      (null, null, null))
    assert(Multimodal.parseImageHeader(png(1, 1).take(10)) ==
      (null, null, null))
    // JPEG SOI with no SOF: recognized container, unknown dims
    assert(Multimodal.parseImageHeader(
      Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)) == ("jpeg", null, null))
  }

  test("imageDimensions: distributed parse over a binary column, " +
      "mixed formats and nulls") {
    val rows = Seq(
      (1L, png(320, 240)), (2L, gif(16, 16)), (3L, jpeg(100, 50)),
      (4L, "junk".getBytes), (5L, null)
    ).toDF("media_id", "content")
    val got = Multimodal.imageDimensions(rows, "content")
      .orderBy("media_id")
      .select("media_id", "format", "width", "height")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)), Option(r.get(3)))).toSeq
    assert(got == Seq(
      (1L, "png", Some(320), Some(240)),
      (2L, "gif", Some(16), Some(16)),
      (3L, "jpeg", Some(100), Some(50)),
      (4L, null, None, None),
      (5L, null, None, None)))
  }
}
