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
