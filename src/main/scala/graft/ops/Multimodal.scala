package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (builder north star): media as opaque
  * `binary` columns + typed metadata, with decode/feature-extraction as
  * partition-local batch functions.
  *
  * The Spark-side shape is the real deliverable here — schema, partition
  * batching, null handling — while the actual codec is pluggable: this
  * container has no image/audio libraries, so [[stubDecoder]] is a
  * deterministic fake (clearly marked) with the same signature a real
  * JNI/FFI decoder would have. `mapPartitions` is the Scala analog of
  * `mapInPandas`: one decoder init per partition, batch iteration, no
  * per-row setup cost.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("content_hash", StringType)))

  /** Wrap a text column as a binary media column with metadata — the
    * ingestion step a real pipeline does on image/audio bytes. Pure
    * expressions (codegen'd): encode, length, md5. */
  def ingestAsMedia(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String): DataFrame = df.select(
    col(idCol).cast("long").as("media_id"),
    encode(col(payloadCol), "UTF-8").as("content"),
    lit(mediaType).as("media_type"),
    octet_length(encode(col(payloadCol), "UTF-8")).cast("long").as("n_bytes"),
    md5(encode(col(payloadCol), "UTF-8")).as("content_hash"))

  /** A decoder turns raw bytes into a fixed-size feature vector.
    * STUB: deterministic fake features derived from the bytes (length,
    * byte histogram moments) standing in for a real image/audio decode —
    * the real implementation would link a codec here. */
  type Decoder = Array[Byte] => Array[Float]

  val FeatureDim = 8
  val stubDecoder: Decoder = bytes => {
    if (bytes == null) null
    else {
      var sum = 0L; var sumSq = 0L
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        sum += b; sumSq += b.toLong * b
        i += 1
      }
      val n = math.max(bytes.length, 1)
      Array[Float](
        bytes.length.toFloat,
        sum.toFloat / n,
        sumSq.toFloat / n,
        (if (bytes.isEmpty) 0 else bytes.head & 0xff).toFloat,
        (if (bytes.isEmpty) 0 else bytes.last & 0xff).toFloat,
        (sum % 251).toFloat,
        (sumSq % 509).toFloat,
        n.toFloat % 127)
    }
  }

  /** Partition-batched decode: binary column → feature vector column.
    * Decoder is initialized once per partition (the expensive-codec-setup
    * pattern); rows stream through without materializing the partition. */
  def decodeFeatures(df: DataFrame, binCol: String,
      decoder: Decoder = stubDecoder): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      val d = decoder // per-partition init point for a real codec
      rows.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null
          else r.getAs[Array[Byte]](binIdx)
        Row.fromSeq(r.toSeq :+ (if (bytes == null) null else d(bytes).toSeq))
      }
    }(enc)
  }

  /** STUB resize: stride-downsample the payload bytes by `factor` —
    * standing in for an image resample kernel (no codecs in this
    * container); the partition-batched shape (one codec init per
    * partition, rows streamed) is the real deliverable and is identical
    * for the real kernel. Replaces `binCol` in place; metadata columns
    * are the caller's to recompute (expressions). */
  def resize(df: DataFrame, binCol: String, factor: Int): DataFrame = {
    require(factor >= 1)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(df.schema)
    df.mapPartitions { rows =>
      // per-partition init point for a real resample kernel
      rows.map { r =>
        val bytes =
          if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        val out =
          if (bytes == null) null
          else {
            val n = (bytes.length + factor - 1) / factor
            val o = new Array[Byte](n)
            var i = 0
            while (i < n) { o(i) = bytes(i * factor); i += 1 }
            o
          }
        Row.fromSeq(r.toSeq.updated(binIdx, out))
      }
    }(enc)
  }

  /** Frame sampling as a DECLARATIVE generator: payload → up to
    * `maxFrames` fixed-width frames via sequence + explode + substring —
    * fully codegen'd, no mapPartitions, because slicing is expressible.
    * Frames here are character ranges of the text payload (the sandbox's
    * media stand-in, and what the DuckDB oracle can slice too); a real
    * video pipeline swaps the substring for a byte-range/keyframe slice —
    * the one-to-many plan shape (generate frame indices, slice, hash) is
    * unchanged. */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
      frameWidth: Int, maxFrames: Int): DataFrame = {
    require(frameWidth >= 1 && maxFrames >= 1)
    df.select(col(idCol).cast("long").as("media_id"),
        col(payloadCol).as("_p"))
      // least() SKIPS nulls (both in Spark and DuckDB), so a null payload
      // would otherwise score n_frames = maxFrames and emit phantom rows
      .filter(col("_p").isNotNull)
      .withColumn("n_frames",
        least(ceil(length(col("_p")) / lit(frameWidth.toDouble)).cast("int"),
          lit(maxFrames)))
      .filter(col("n_frames") > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1)))
      .withColumn("frame",
        expr(s"substring(_p, frame_idx * $frameWidth + 1, $frameWidth)"))
      .select(col("media_id"), col("frame_idx"),
        length(col("frame")).as("frame_chars"),
        md5(encode(col("frame"), "UTF-8")).as("frame_hash"))
  }

  /** REAL image-header parsing — no codec library required, just the
    * container formats' own byte layouts: PNG IHDR (big-endian dims at
    * fixed offset), GIF logical screen descriptor (little-endian), BMP
    * info header (little-endian, height may be negative for top-down),
    * JPEG SOF marker scan (variable offsets — the reason this is
    * imperative per-row code, not expressions). Unknown/truncated/corrupt
    * payloads yield nulls, never throw — a 100 TB media crawl always
    * contains garbage.
    *
    * Adds `format` (png/gif/bmp/jpeg or null) + `width`/`height` (null
    * when unparseable). Partition-batched like the other kernels. */
  def imageDimensions(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null
          else r.getAs[Array[Byte]](binIdx)
        val (fmt, w, h) = parseImageHeader(bytes)
        Row.fromSeq(r.toSeq ++ Seq(fmt, w, h))
      }
    }(enc)
  }

  /** (format, width, height) from magic bytes; nulls when unknown. */
  private[ops] def parseImageHeader(
      b: Array[Byte]): (String, Integer, Integer) = {
    def u8(i: Int) = b(i) & 0xff
    def be32(i: Int) =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (b == null || b.length < 2) return (null, null, null)
    // PNG: 8-byte signature, IHDR is always the first chunk → dims at 16
    if (b.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' &&
        u8(3) == 'G' && u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a &&
        u8(7) == 0x0a)
      return ("png", be32(16), be32(20))
    // GIF87a/89a: logical screen descriptor right after the signature
    if (b.length >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' &&
        u8(3) == '8' && (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a')
      return ("gif", le16(6), le16(8))
    // BMP: BITMAPINFOHEADER at offset 14; height < 0 means top-down rows
    if (b.length >= 26 && u8(0) == 'B' && u8(1) == 'M')
      return ("bmp", le32(18), math.abs(le32(22)))
    // JPEG: walk marker segments to the first frame header (SOFn).
    // DHT/DNL/DAC share the SOF pattern but are not frames — skipped.
    if (u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 3 < b.length && u8(i) == 0xff) {
        val marker = u8(i + 1)
        if (marker == 0xff) { i += 1 } // fill bytes before a marker
        else if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          return if (i + 8 < b.length) ("jpeg", be16(i + 7), be16(i + 5))
            else ("jpeg", null, null)
        } else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) {
          i += 2 // standalone marker, no length field
        } else {
          if (i + 3 >= b.length) return ("jpeg", null, null)
          i += 2 + be16(i + 2)
        }
      }
      return ("jpeg", null, null) // truncated before any SOF
    }
    (null, null, null)
  }

  /** REAL audio-header parsing — the audio twin of [[imageDimensions]],
    * again pure container byte layout, no codec: WAV/RIFF chunk walk
    * (little-endian `fmt ` + `data` chunks, word-aligned sizes) and
    * AIFF/FORM (big-endian `COMM` chunk with an 80-bit extended-float
    * sample rate). Unknown/truncated/corrupt payloads yield nulls, never
    * throw. Adds `format` (wav/aiff or null), `channels`, `sample_rate`,
    * `bits_per_sample`, `n_frames` (PCM frames; duration =
    * n_frames / sample_rate at the caller's precision). */
  def audioInfo(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("format", StringType),
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("bits_per_sample", IntegerType),
      StructField("n_frames", LongType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null
          else r.getAs[Array[Byte]](binIdx)
        val (fmt, ch, sr, bits, nf) = parseAudioHeader(bytes)
        Row.fromSeq(r.toSeq ++ Seq(fmt, ch, sr, bits, nf))
      }
    }(enc)
  }

  /** (format, channels, sample_rate, bits_per_sample, n_frames) from the
    * container header; nulls when unknown/corrupt. */
  private[ops] def parseAudioHeader(b: Array[Byte])
      : (String, Integer, Integer, Integer, java.lang.Long) = {
    val none = (null: String, null: Integer, null: Integer,
      null: Integer, null: java.lang.Long)
    if (b == null || b.length < 12) return none
    def u8(i: Int) = b(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
        (u8(i + 3).toLong << 24)) & 0xffffffffL
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) |
        u8(i + 3)) & 0xffffffffL
    def tag(i: Int) = new String(b, i, 4, "US-ASCII")
    // WAV: RIFF....WAVE, then word-aligned (id, le32 size, payload)
    // chunks; fmt may be preceded by LIST/JUNK in real files
    if (tag(0) == "RIFF" && tag(8) == "WAVE") {
      var i = 12
      var ch: Integer = null; var sr: Integer = null
      var bits: Integer = null; var blockAlign = 0
      var dataSize = -1L
      while (i + 8 <= b.length) {
        val id = tag(i); val size = le32(i + 4)
        if (id == "fmt " && size >= 16 && i + 8 + 16 <= b.length) {
          ch = le16(i + 10); sr = le32(i + 12).toInt
          blockAlign = le16(i + 20); bits = le16(i + 22)
        } else if (id == "data") dataSize = size
        val adv = 8L + size + (size & 1L) // chunks are word-aligned
        if (adv <= 0 || i + adv > Int.MaxValue) i = b.length
        else i += adv.toInt
      }
      if (ch == null) return none
      val nf: java.lang.Long =
        if (dataSize >= 0 && blockAlign > 0) dataSize / blockAlign else null
      return ("wav", ch, sr, bits, nf)
    }
    // AIFF: FORM....AIFF, big-endian chunks; COMM carries the geometry
    if (tag(0) == "FORM" && tag(8) == "AIFF") {
      var i = 12
      while (i + 8 <= b.length) {
        val id = tag(i); val size = be32(i + 4)
        if (id == "COMM" && size >= 18 && i + 8 + 18 <= b.length) {
          val ch = be16(i + 8)
          val nf = be32(i + 10)
          val bits = be16(i + 14)
          // sample rate: 80-bit IEEE 754 extended float at i+16 —
          // value = mantissaHigh32 · 2^(exp − 16383 − 31) (sane audio
          // rates never need the low mantissa word)
          val exp = ((u8(i + 16) & 0x7f) << 8 | u8(i + 17)) - 16383
          val mantHi = be32(i + 18).toDouble
          val rate = mantHi * math.pow(2.0, (exp - 31).toDouble)
          val sr: Integer =
            if (rate.isNaN || rate <= 0 || rate > Int.MaxValue) null
            else math.round(rate).toInt
          return ("aiff", ch, sr, bits, nf.toLong)
        }
        val adv = 8L + size + (size & 1L)
        if (adv <= 0 || i + adv > Int.MaxValue) i = b.length
        else i += adv.toInt
      }
      return ("aiff", null, null, null, null)
    }
    none
  }

  /** Per-frame RMS energy over PCM16 mono WAV payloads: split the
    * sample stream into frames of `frameSamples` and emit each frame's
    * root-mean-square amplitude — the voice-activity / silence-trim /
    * loudness-bucketing primitive an audio curation pipeline gates on
    * before any expensive model touches the clip. Non-WAV,
    * non-16-bit or multi-channel payloads yield NO rows (decode
    * eligibility is [[audioInfo]]'s job); a short final frame is
    * emitted with its true `n_samples`.
    *
    * Determinism: Σs² per frame is exact integer arithmetic; one
    * double sqrt per frame, 6-dp rounded. Shape: `mapPartitions` at
    * the codec boundary (the [[decodeFeatures]] convention) with
    * bounded per-row output (samples/frameSamples rows); no shuffle —
    * downstream aggs partition as usual. */
  def audioEnergy(df: DataFrame, idCol: String, binCol: String,
      frameSamples: Int): DataFrame = {
    require(frameSamples >= 1)
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_idx", IntegerType),
      StructField("n_samples", IntegerType),
      StructField("rms_r", DoubleType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(binIdx)) null
          else r.getAs[Array[Byte]](binIdx)
        pcm16MonoData(bytes) match {
          case None => Iterator.empty
          case Some((off, nSamples)) =>
            val id = r.get(idIdx)
            (0 until nSamples by frameSamples).iterator.map { s0 =>
              val n = math.min(frameSamples, nSamples - s0)
              var i = 0; var ss = 0L
              while (i < n) {
                val p = off + 2 * (s0 + i)
                val v = ((bytes(p) & 0xff) |
                  (bytes(p + 1) << 8)).toShort.toInt
                ss += v.toLong * v
                i += 1
              }
              val rms = math.sqrt(ss.toDouble / n)
              Row(id, s0 / frameSamples, n,
                math.rint(rms * 1e6) / 1e6)
            }
        }
      }
    }(enc)
  }

  /** Audio-corpus quality audit over PCM16 mono WAV payloads: per
    * clip, the CLIPPING ratio (samples at or within `clipMargin` of
    * full scale — the unrecoverable distortion a loudness-war corpus
    * is full of), the SILENCE ratio (|s| ≤ `silenceThresh` — dead air
    * that wastes training tokens), the integer peak |s|, and the DC
    * offset (mean sample — a miswired recording chain shows here
    * first). The triage pass an audio-training pipeline runs before
    * spending decode/transcription budget on a clip.
    *
    * Determinism: counts and Σs are exact integers in one pass over
    * the samples; the two ratios and the mean are single 6-dp-rounded
    * double divisions. Shape: `mapPartitions` at the codec boundary
    * (the [[audioEnergy]] convention), ONE output row per decodable
    * clip; non-PCM16-mono payloads yield no row. */
  def audioQuality(df: DataFrame, idCol: String, binCol: String,
      silenceThresh: Int = 327, clipMargin: Int = 0): DataFrame = {
    require(silenceThresh >= 0 && clipMargin >= 0)
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("n_samples", IntegerType),
      StructField("peak_abs", IntegerType),
      StructField("clip_ratio_r", DoubleType),
      StructField("silence_ratio_r", DoubleType),
      StructField("dc_offset_r", DoubleType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val clipLo = -32768 + clipMargin
    val clipHi = 32767 - clipMargin
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(binIdx)) null
          else r.getAs[Array[Byte]](binIdx)
        pcm16MonoData(bytes) match {
          case None => Iterator.empty
          case Some((off, nSamples)) if nSamples > 0 =>
            var i = 0; var clip = 0L; var silent = 0L
            var peak = 0; var sum = 0L
            while (i < nSamples) {
              val p = off + 2 * i
              val v = ((bytes(p) & 0xff) |
                (bytes(p + 1) << 8)).toShort.toInt
              if (v <= clipLo || v >= clipHi) clip += 1
              val a = math.abs(v)
              if (a <= silenceThresh) silent += 1
              if (a > peak) peak = a
              sum += v
              i += 1
            }
            def r6(x: Double) = math.rint(x * 1e6) / 1e6
            Iterator.single(Row(r.get(idIdx), nSamples, peak,
              r6(clip.toDouble / nSamples),
              r6(silent.toDouble / nSamples),
              r6(sum.toDouble / nSamples)))
          case _ => Iterator.empty
        }
      }
    }(enc)
  }

  /** (data offset, sample count) of a PCM16 MONO WAV payload; None for
    * anything else (other formats, truncated data chunk, corrupt). */
  private[ops] def pcm16MonoData(b: Array[Byte]): Option[(Int, Int)] = {
    if (b == null || b.length < 12) return None
    def u8(i: Int) = b(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
        (u8(i + 3).toLong << 24)) & 0xffffffffL
    def tag(i: Int) = new String(b, i, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var ok = false
    var dataOff = -1; var dataLen = -1L
    while (i + 8 <= b.length) {
      val id = tag(i); val size = le32(i + 4)
      if (id == "fmt " && size >= 16 && i + 8 + 16 <= b.length)
        ok = le16(i + 8) == 1 && le16(i + 10) == 1 && le16(i + 22) == 16
      else if (id == "data") { dataOff = i + 8; dataLen = size }
      val adv = 8L + size + (size & 1L)
      if (adv <= 0 || i + adv > Int.MaxValue) i = b.length
      else i += adv.toInt
    }
    if (!ok || dataOff < 0 || dataLen < 2 ||
      dataOff + dataLen > b.length) None
    else Some((dataOff, (dataLen / 2).toInt))
  }

  /** Grayscale luma histogram over UNCOMPRESSED 24-bit BMP payloads:
    * `bins` equi-width buckets of the integer luma
    * (299R + 587G + 114B)/1000 ∈ [0, 255] — the exposure/contrast
    * profile an image curation pass buckets on (all-dark, blown-out,
    * low-contrast screenshots) without any codec dependency. Non-BMP /
    * compressed / non-24bpp payloads yield no rows.
    *
    * Exact integer arithmetic end to end; one (id, bin, n) row per
    * non-empty bucket, accumulated in a local `bins`-cell array per
    * image inside `mapPartitions` — row order never matters. */
  def imageHistogram(df: DataFrame, idCol: String, binCol: String,
      bins: Int): DataFrame = {
    require(bins >= 1 && bins <= 256)
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("bin", IntegerType),
      StructField("n", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(binIdx)) null
          else r.getAs[Array[Byte]](binIdx)
        bmp24Pixels(bytes) match {
          case None => Iterator.empty
          case Some((off, w, h, stride)) =>
            val id = r.get(idIdx)
            val hist = new Array[Long](bins)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = off + y * stride + 3 * x
                val bB = bytes(p) & 0xff
                val g = bytes(p + 1) & 0xff
                val rr = bytes(p + 2) & 0xff
                val luma = (299 * rr + 587 * g + 114 * bB) / 1000
                hist(luma * bins / 256) += 1L
                x += 1
              }
              y += 1
            }
            (0 until bins).iterator.filter(hist(_) > 0)
              .map(bi => Row(id, bi, hist(bi)))
        }
      }
    }(enc)
  }

  /** (pixel offset, width, |height|, row stride) of an uncompressed
    * 24-bpp BITMAPINFOHEADER BMP; None otherwise. Row order (bottom-up
    * vs top-down) is irrelevant to a histogram. */
  private[ops] def bmp24Pixels(b: Array[Byte])
      : Option[(Int, Int, Int, Int)] = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M')
      return None
    def u8(i: Int) = b(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) |
      (u8(i + 3) << 24)
    val off = le32(10)
    val w = le32(18); val h = math.abs(le32(22))
    val bpp = le16(28); val comp = le32(30)
    if (le32(14) < 40 || bpp != 24 || comp != 0 || w <= 0 || h == 0)
      return None
    val stride = ((3 * w + 3) / 4) * 4
    if (off < 54 || off.toLong + stride.toLong * h > b.length) None
    else Some((off, w, h, stride))
  }

  /** 64-bit difference hash (dHash) over UNCOMPRESSED 24-bit BMP
    * payloads — the standard perceptual image fingerprint (Krawetz):
    * luma is block-averaged onto a 9×8 grid (image-space top-down —
    * the BMP height sign decides storage order, and orientation
    * matters to a directional hash), and bit (row·8 + col) is set when
    * the cell right of `col` is brighter than `col`. Robust to
    * re-encodes/resizes/brightness shifts; two near-identical images
    * land within a few bits of Hamming distance — the image-side
    * analogue of SimHash text dedup. Cell means are compared by exact
    * integer cross-multiplication (sumₐ·cnt_b > sum_b·cntₐ) — no
    * division, no floats, bit-reproducible. Images narrower than the
    * grid (w < 9 or h < 8), or non-BMP payloads, yield no row.
    *
    * Shape: one mapPartitions pass at the codec boundary (the
    * audioEnergy convention), emitting (id, dhash) — 8 bytes per
    * image regardless of size. */
  def imageDHash(df: DataFrame, idCol: String,
      binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol), StructField("dhash", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(binIdx)) null
          else r.getAs[Array[Byte]](binIdx)
        bmp24Pixels(bytes) match {
          case Some((off, w, h, stride)) if w >= 9 && h >= 8 =>
            // raw height sign: positive = bottom-up storage
            def u8(i: Int) = bytes(i) & 0xff
            val rawH = u8(22) | (u8(23) << 8) | (u8(24) << 16) |
              (u8(25) << 24)
            val bottomUp = rawH > 0
            val sums = Array.ofDim[Long](8, 9)
            val cnts = Array.ofDim[Long](8, 9)
            var y = 0
            while (y < h) {
              val sy = if (bottomUp) h - 1 - y else y // stored row
              val cy = y * 8 / h
              var x = 0
              while (x < w) {
                val p = off + sy * stride + 3 * x
                val bB = bytes(p) & 0xff
                val g = bytes(p + 1) & 0xff
                val rr = bytes(p + 2) & 0xff
                val luma = (299 * rr + 587 * g + 114 * bB) / 1000
                val cx = x * 9 / w
                sums(cy)(cx) += luma
                cnts(cy)(cx) += 1L
                x += 1
              }
              y += 1
            }
            var hash = 0L
            var cy = 0
            while (cy < 8) {
              var cx = 0
              while (cx < 8) {
                // mean(cx+1) > mean(cx) via integer cross-multiply
                if (sums(cy)(cx + 1) * cnts(cy)(cx) >
                    sums(cy)(cx) * cnts(cy)(cx + 1))
                  hash |= 1L << (cy * 8 + cx)
                cx += 1
              }
              cy += 1
            }
            Iterator.single(Row(r.get(idIdx), hash))
          case _ => Iterator.empty
        }
      }
    }(enc)
  }

  /** Perceptual near-duplicate image pairs from [[imageDHash]] output:
    * pigeonhole the 64-bit hash into four 16-bit bands — any pair
    * within Hamming distance ≤ 3 agrees exactly on at least one band
    * (4 bands, ≤ 3 differing bits), so the candidate join is an
    * EQUI-join on (band index, band bits), never an all-pairs scan —
    * the simhashNearDups posture on the image side. Candidates are
    * verified with `bit_count(xor)` and deduplicated across bands.
    * Requires maxHamming ≤ 3 (the 4-band guarantee). */
  def imageDHashPairs(hashes: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4-band pigeonhole guarantees recall only for maxHamming <= 3")
    val s = hashes.sparkSession
    import s.implicits._
    val bands = (0 until 4).toDF("band")
    val banded = hashes
      .select(col(idCol).as("_id"), col(hashCol).as("_h"))
      .crossJoin(broadcast(bands))
      // arithmetic shift is fine here: the 0xFFFF mask keeps only the
      // low 16 bits of the shifted value, which agree with the logical
      // shift for any sign
      .withColumn("_bits",
        expr("shiftright(_h, band * 16)").bitwiseAND(lit(0xFFFFL)))
    val a = banded.select(col("band"), col("_bits"),
      col("_id").as("id_a"), col("_h").as("_ha"))
    val b = banded.select(col("band").as("_b2"),
      col("_bits").as("_bits2"), col("_id").as("id_b"),
      col("_h").as("_hb"))
    a.join(b, col("band") === col("_b2") &&
        col("_bits") === col("_bits2") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("_ha").bitwiseXOR(col("_hb"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Deterministic fake "image dimensions" from the content hash — the
    * metadata-extraction shape (real pipelines read codec headers). */
  def fakeDimensions(df: DataFrame): DataFrame = df
    .withColumn("width",
      (conv(substring(col("content_hash"), 1, 4), 16, 10).cast("long") % 1920)
        .cast("int"))
    .withColumn("height",
      (conv(substring(col("content_hash"), 5, 4), 16, 10).cast("long") % 1080)
        .cast("int"))
}
