package graft.ops

import graft.SparkTestBase

/** Byte-accurate signal extraction over media payloads: PCM16 WAV
  * frame-RMS (exact for DC, A/√2 for a square wave) and 24-bit BMP
  * luma histograms — real decoders over hand-crafted containers, the
  * [[AudioHeaderSpec]]/[[ImageHeaderSpec]] discipline applied to the
  * sample/pixel payloads. */
class MediaSignalSpec extends SparkTestBase {
  import spark.implicits._

  private def le16(v: Int) = Array(v & 0xff, (v >> 8) & 0xff)
  private def le32(v: Int) =
    Array(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)
  private def ascii(s: String) = s.getBytes("US-ASCII").map(_ & 0xff)

  /** PCM16 mono WAV around explicit samples. */
  private def wav16(samples: Seq[Int], channels: Int = 1): Array[Byte] = {
    val blockAlign = channels * 2
    val fmt = ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(8000) ++ le32(8000 * blockAlign) ++ le16(blockAlign) ++
      le16(16)
    val dataBytes = samples.flatMap(le16)
    val data = ascii("data") ++ le32(dataBytes.length) ++ dataBytes
    val body = ascii("WAVE") ++ fmt ++ data
    (ascii("RIFF") ++ le32(body.length) ++ body).map(_.toByte)
  }

  /** Uncompressed 24-bpp BMP from (r, g, b) rows, bottom-up with
    * 4-byte row padding. */
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
      le16(24) ++ le32(0) ++ le32(rows.size) ++
      Seq.fill(16)(0)
    (hdr ++ rows).map(_.toByte)
  }

  test("audioEnergy: DC level is exact, square wave RMS = |A|, short " +
      "final frame keeps its true sample count") {
    // 6 samples of +1000, then 3 of ±2000 square → frames of 4:
    // f0 = 1000 (exact), f1 = sqrt((2·10^6 + 2·4·10^6)/4)... hand:
    // samples: 1000×6, 2000, -2000, 2000 → f0: 4×1000 → rms 1000;
    // f1: (1000,1000,2000,-2000) → sqrt((1+1+4+4)·10^6/4) = sqrt(2.5e6)
    // f2: (2000) single-sample short frame → 2000
    val s = Seq.fill(6)(1000) ++ Seq(2000, -2000, 2000)
    val df = Seq((1L, wav16(s))).toDF("id", "payload")
    val got = Multimodal.audioEnergy(df, "id", "payload", 4)
      .collect().map(r => r.getInt(1) -> (r.getInt(2), r.getDouble(3)))
      .toMap
    assert(got.size == 3)
    assert(got(0) == ((4, 1000.0)))
    assert(got(1)._1 == 4)
    assert(got(1)._2 == math.rint(math.sqrt(2.5e6) * 1e6) / 1e6)
    assert(got(2) == ((1, 2000.0)))
  }

  test("audioEnergy: negative samples parse as signed PCM16") {
    val df = Seq((1L, wav16(Seq(-32768, -32768)))).toDF("id", "payload")
    val got = Multimodal.audioEnergy(df, "id", "payload", 2).collect()
    assert(got.head.getDouble(3) == 32768.0)
  }

  test("audioEnergy: stereo and non-WAV payloads yield no rows") {
    val df = Seq(
      (1L, wav16(Seq(1, 2, 3, 4), channels = 2)),
      (2L, "not audio".getBytes)).toDF("id", "payload")
    assert(Multimodal.audioEnergy(df, "id", "payload", 2).count() == 0)
  }

  test("imageHistogram: exact luma bins incl. row padding; pure " +
      "black/white and a known gray") {
    // 2×2: black, white, pure red (luma 76), pure green (luma 150)
    val img = bmp24(Seq(
      Seq((0, 0, 0), (255, 255, 255)),
      Seq((255, 0, 0), (0, 255, 0))))
    val df = Seq((7L, img)).toDF("id", "payload")
    val got = Multimodal.imageHistogram(df, "id", "payload", 256)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(got == Map(0 -> 1L, 255 -> 1L, 76 -> 1L, 149 -> 1L),
      got.toString) // 587·255/1000 = 149 (integer division)
    // 8 coarse bins: 0→0, 76→2, 149→4, 255→7
    val coarse = Multimodal.imageHistogram(df, "id", "payload", 8)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(coarse == Map(0 -> 1L, 2 -> 1L, 4 -> 1L, 7 -> 1L))
  }

  test("imageHistogram: compressed / non-24bpp payloads yield no rows") {
    val notBmp = Seq((1L, "BMxx".getBytes)).toDF("id", "payload")
    assert(Multimodal.imageHistogram(notBmp, "id", "payload", 8)
      .count() == 0)
  }

  test("audioQuality: exact clip/silence/peak/DC on hand samples; " +
      "stereo rejected") {
    // 8 samples: two full-scale clips (+32767, -32768), two silent
    // (0, 300 <= default thresh 327), four ordinary
    val s = Seq(32767, -32768, 0, 300, 1000, -2000, 500, -500)
    val df = Seq((1L, wav16(s)), (2L, wav16(Seq(1, 2, 3), channels = 2)))
      .toDF("id", "payload")
    val rows = Multimodal.audioQuality(df, "id", "payload").collect()
    assert(rows.length == 1, "stereo payload must yield no row")
    val r = rows(0)
    assert(r.getAs[Int]("n_samples") == 8)
    assert(r.getAs[Int]("peak_abs") == 32768)
    assert(r.getAs[Double]("clip_ratio_r") == 0.25)
    assert(r.getAs[Double]("silence_ratio_r") == 0.25)
    assert(r.getAs[Double]("dc_offset_r")
      == math.rint(s.sum.toDouble / 8 * 1e6) / 1e6)
  }

  test("audioQuality: clipMargin widens the clip band, threshold 0 " +
      "counts only exact zeros as silence") {
    val s = Seq(32000, -32000, 0, 100)
    val df = Seq((1L, wav16(s))).toDF("id", "payload")
    val strict = Multimodal.audioQuality(df, "id", "payload",
      silenceThresh = 0, clipMargin = 0).collect()(0)
    assert(strict.getAs[Double]("clip_ratio_r") == 0.0)
    assert(strict.getAs[Double]("silence_ratio_r") == 0.25)
    val loose = Multimodal.audioQuality(df, "id", "payload",
      silenceThresh = 0, clipMargin = 1000).collect()(0)
    assert(loose.getAs[Double]("clip_ratio_r") == 0.5)
  }
}
