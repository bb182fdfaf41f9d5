package graft.ops

import graft.SparkTestBase

/** Byte-accurate audio header parsing — hand-crafted WAV/RIFF and
  * AIFF/FORM containers (including a LIST chunk before fmt, word-aligned
  * odd-size chunks, and the AIFF 80-bit extended-float sample rate),
  * plus the garbage-tolerance contract. */
class AudioHeaderSpec extends SparkTestBase {
  import spark.implicits._

  private def le16(v: Int) = Array(v & 0xff, (v >> 8) & 0xff)
  private def le32(v: Int) =
    Array(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)
  private def be16(v: Int) = Array((v >> 8) & 0xff, v & 0xff)
  private def be32(v: Int) = Array((v >> 24) & 0xff, (v >> 16) & 0xff,
    (v >> 8) & 0xff, v & 0xff)
  private def ascii(s: String) = s.getBytes("US-ASCII").map(_ & 0xff)

  /** Minimal canonical WAV: fmt (PCM) + data; `extraPre` chunks are laid
    * down before fmt the way real encoders emit LIST/INFO metadata. */
  private def wav(channels: Int, rate: Int, bits: Int, dataBytes: Int,
      extraPre: Array[Int] = Array.empty): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val fmt = ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(rate) ++ le32(rate * blockAlign) ++ le16(blockAlign) ++
      le16(bits)
    val data = ascii("data") ++ le32(dataBytes) ++
      Array.fill(dataBytes)(0)
    val body = ascii("WAVE") ++ extraPre ++ fmt ++ data
    (ascii("RIFF") ++ le32(body.length) ++ body).map(_.toByte)
  }

  /** 80-bit extended float for sane integer sample rates: value =
    * mantissaHigh32 · 2^(exp − 16383 − 31). */
  private def extended(rate: Int): Array[Int] = {
    var exp = 0; var m = rate.toLong
    while (m < 0x80000000L) { m <<= 1; exp += 1 }
    be16(16383 + 31 - exp) ++ be32(m.toInt) ++ be32(0)
  }

  private def aiff(channels: Int, frames: Int, bits: Int,
      rate: Int): Array[Byte] = {
    val comm = ascii("COMM") ++ be32(18) ++ be16(channels) ++
      be32(frames) ++ be16(bits) ++ extended(rate)
    val body = ascii("AIFF") ++ comm
    (ascii("FORM") ++ be32(body.length) ++ body).map(_.toByte)
  }

  test("WAV: PCM geometry parses; n_frames = data size / block align") {
    // 1s of 44.1kHz 16-bit stereo: 44100 * 4 bytes
    assert(Multimodal.parseAudioHeader(wav(2, 44100, 16, 176400)) ==
      ("wav", 2, 44100, 16, 44100L))
    assert(Multimodal.parseAudioHeader(wav(1, 16000, 8, 16000)) ==
      ("wav", 1, 16000, 8, 16000L))
  }

  test("WAV: a LIST chunk before fmt is walked over, and odd-size " +
      "chunks advance word-aligned") {
    val list = ascii("LIST") ++ le32(5) ++ Array(1, 2, 3, 4, 5) ++
      Array(0) // 5-byte payload + pad byte
    assert(Multimodal.parseAudioHeader(
      wav(2, 48000, 24, 48000 * 6, extraPre = list)) ==
      ("wav", 2, 48000, 24, 48000L))
  }

  test("AIFF: COMM parses including the extended-float sample rate") {
    assert(Multimodal.parseAudioHeader(aiff(2, 22050, 16, 44100)) ==
      ("aiff", 2, 44100, 16, 22050L))
    assert(Multimodal.parseAudioHeader(aiff(1, 8000, 24, 96000)) ==
      ("aiff", 1, 96000, 24, 8000L))
  }

  test("garbage tolerance: null, short, wrong magic, truncated fmt — " +
      "all nulls, never a throw") {
    val none = (null, null, null, null, null)
    assert(Multimodal.parseAudioHeader(null) == none)
    assert(Multimodal.parseAudioHeader(Array[Byte](1, 2, 3)) == none)
    assert(Multimodal.parseAudioHeader(
      "not audio at all, just text.".getBytes("US-ASCII")) == none)
    // RIFF/WAVE but the fmt chunk is cut off mid-header
    val truncated = (ascii("RIFF") ++ le32(20) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32(16) ++ le16(1)).map(_.toByte)
    assert(Multimodal.parseAudioHeader(truncated) == none)
    // a size field pointing past the buffer must not loop or throw
    val lying = (ascii("RIFF") ++ le32(1000000) ++ ascii("WAVE") ++
      ascii("JUNK") ++ le32(Int.MaxValue - 3)).map(_.toByte)
    assert(Multimodal.parseAudioHeader(lying) == none)
  }

  test("audioInfo: partition-batched column form over a binary column " +
      "(nulls pass through)") {
    val rows = Seq(
      (1L, wav(2, 44100, 16, 176400)),
      (2L, aiff(1, 8000, 24, 96000)),
      (3L, null.asInstanceOf[Array[Byte]]))
    val got = Multimodal.audioInfo(rows.toDF("media_id", "content"),
        "content")
      .orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getAs[String]("format"),
        r.getAs[Integer]("channels"), r.getAs[Integer]("sample_rate")))
    assert(got.toSeq == Seq(
      (1L, "wav", Integer.valueOf(2), Integer.valueOf(44100)),
      (2L, "aiff", Integer.valueOf(1), Integer.valueOf(96000)),
      (3L, null, null, null)))
  }
}
