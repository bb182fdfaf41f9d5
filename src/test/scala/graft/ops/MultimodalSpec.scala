package graft.ops

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq((1L, "hello world"), (2L, ""), (3L, "abc"))
    .toDF("doc_id", "text")

  test("ingestAsMedia: binary payload with byte-length + md5 metadata") {
    val m = Multimodal.ingestAsMedia(docs, "doc_id", "text", "text/plain")
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(m(1L).getAs[Long]("n_bytes") == 11L)
    assert(m(1L).getAs[String]("content_hash") ==
      "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
    assert(new String(m(1L).getAs[Array[Byte]]("content"), "UTF-8")
      == "hello world")
    assert(m(2L).getAs[Long]("n_bytes") == 0L)
  }

  test("decodeFeatures: mapPartitions stub decode yields fixed-dim vectors") {
    val media = Multimodal.ingestAsMedia(docs, "doc_id", "text", "text/plain")
    val feat = Multimodal.decodeFeatures(media, "content")
    val rows = feat.collect().map(r => r.getAs[Long]("media_id") ->
      r.getAs[collection.Seq[Float]]("features")).toMap
    assert(rows(1L).length == Multimodal.FeatureDim)
    assert(rows(1L).head == 11.0f) // first feature = byte length
    assert(rows(3L).head == 3.0f)
    // deterministic: same input → same features
    val again = Multimodal.decodeFeatures(media, "content").collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[collection.Seq[Float]]("features"))
      .toMap
    assert(rows == again)
  }

  test("resize: stride-downsample shrinks payload, updates in place") {
    val media = Multimodal.ingestAsMedia(docs, "doc_id", "text", "text/plain")
    val resized = Multimodal.resize(media, "content", 2).collect()
      .map(r => r.getAs[Long]("media_id") ->
        r.getAs[Array[Byte]]("content")).toMap
    assert(new String(resized(1L), "UTF-8") == "hlowrd") // every 2nd byte
    assert(resized(2L).length == 0)
    assert(new String(resized(3L), "UTF-8") == "ac")
    // schema unchanged; other columns intact
    val full = Multimodal.resize(media, "content", 2)
    assert(full.schema == media.schema)
    assert(full.filter("media_id = 1").head.getAs[Long]("n_bytes") == 11L)
  }

  test("sampleFrames: fixed-width frames, capped, hashed; empty docs drop") {
    val long = Seq((1L, "a" * 100), (2L, ""), (3L, "short"))
      .toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(long, "doc_id", "text", 32, 8)
      .collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("frame_idx")) ->
        r.getAs[Int]("frame_chars")).toMap
    // 100 chars / 32 → 4 frames of 32,32,32,4; doc 2 empty → none
    assert(frames.keys.count(_._1 == 1L) == 4)
    assert(frames((1L, 0)) == 32 && frames((1L, 3)) == 4)
    assert(!frames.keys.exists(_._1 == 2L))
    assert(frames((3L, 0)) == 5)
    // cap: maxFrames 2 truncates
    val capped = Multimodal.sampleFrames(long, "doc_id", "text", 32, 2)
      .filter("media_id = 1").count()
    assert(capped == 2)
  }

  test("sampleFrames: null payload emits NO rows (least() skips nulls)") {
    val withNull = Seq((1L, "some text"), (2L, null))
      .toDF("doc_id", "text")
    val ids = Multimodal.sampleFrames(withNull, "doc_id", "text", 4, 8)
      .select("media_id").as[Long].collect().toSet
    assert(ids == Set(1L), "null payload must not produce phantom frames")
  }

  test("fakeDimensions: md5-derived width/height in range") {
    val m = Multimodal.fakeDimensions(
      Multimodal.ingestAsMedia(docs, "doc_id", "text", "text/plain"))
      .collect()
    m.foreach { r =>
      assert(r.getAs[Int]("width") >= 0 && r.getAs[Int]("width") < 1920)
      assert(r.getAs[Int]("height") >= 0 && r.getAs[Int]("height") < 1080)
    }
  }
}
