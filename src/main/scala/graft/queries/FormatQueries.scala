package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SaveMode

import graft.ops.Multimodal
import graft.util.Tables._

/** Source/sink breadth (SURVEY.md §2.2) + multimodal-column metadata.
  * Round-trip queries exercise the CSV/JSON writers+readers end-to-end:
  * write a table out in the format, read it back with an explicit schema,
  * and aggregate — the oracle runs on the original parquet, so a match
  * proves the round-trip is lossless for these types.
  */
object FormatQueries {

  private def tmpDir(d: String, fmt: String): String =
    s"/root/repo/target/fmt/${fmt}_${d.replaceAll("[^A-Za-z0-9.]", "_")}"

  val all: Seq[Q] = Seq(

    // Multimodal ingestion metadata: binary payload + md5-derived fake
    // dimensions (codegen expressions only; the mapPartitions decode path
    // is spec-tested — sketchy to oracle a stub codec).
    Q("q41_multimodal_meta",
      Some("""SELECT doc_id AS media_id, octet_length(text::BLOB) AS n_bytes,
             | md5(text) AS content_hash,
             | CAST(('0x' || substr(md5(text), 1, 4))::BIGINT % 1920 AS INT)
             |   AS width,
             | CAST(('0x' || substr(md5(text), 5, 4))::BIGINT % 1080 AS INT)
             |   AS height
             |FROM documents ORDER BY media_id""".stripMargin),
      (s, d) => Multimodal.fakeDimensions(
        Multimodal.ingestAsMedia(documents(s, d), "doc_id", "text", "text/plain"))
        .select("media_id", "n_bytes", "content_hash", "width", "height")
        .orderBy("media_id")),

    // Frame sampling (the video-pipeline one-to-many): up to 8 32-char
    // frames per payload via sequence+explode+substring — declarative,
    // codegen'd, oracle-sliceable (DuckDB 1.0 can't slice BLOBs, so both
    // engines slice CHARACTER frames and hash their UTF-8 bytes; a real
    // codec swaps the slice kernel, the plan shape is identical).
    Q("q67_frame_sample",
      Some("""WITH f AS (
             |  SELECT doc_id AS media_id, i - 1 AS frame_idx,
             |    substring(text, (i - 1) * 32 + 1, 32) AS frame
             |  FROM documents, unnest(generate_series(1,
             |    least(CAST(ceil(length(text) / 32.0) AS INT), 8))) AS g(i)
             |  WHERE text IS NOT NULL)
             |SELECT media_id, frame_idx, length(frame) AS frame_chars,
             |  md5(frame) AS frame_hash
             |FROM f ORDER BY media_id, frame_idx""".stripMargin),
      (s, d) => Multimodal.sampleFrames(documents(s, d), "doc_id", "text",
          frameWidth = 32, maxFrames = 8)
        .orderBy("media_id", "frame_idx")),

    // CSV sink → CSV scan (explicit schema, header) → agg.
    Q("q42_csv_roundtrip",
      Some("""SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 2)
             |   AS acctbal
             |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin),
      (s, d) => {
        val path = tmpDir(d, "csv")
        val src = supplier(s, d)
        src.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
        s.read.schema(src.schema).option("header", "true").csv(path)
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n"), round(sum(col("s_acctbal")), 2).as("acctbal"))
          .orderBy("s_nationkey")
      }),

    // ORC sink → ORC scan → agg (the columnar alternative; predicate
    // pushdown + column pruning work the same as parquet).
    Q("q77_orc_roundtrip",
      Some("""SELECT p_brand, count(*) AS n,
             | round(sum(p_retailprice), 2) AS retail
             |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin),
      (s, d) => {
        val path = tmpDir(d, "orc")
        val src = part(s, d)
        src.write.mode(SaveMode.Overwrite).orc(path)
        s.read.schema(src.schema).orc(path)
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("p_retailprice")), 2).as("retail"))
          .orderBy("p_brand")
      }),

    // JSON-lines sink → scan → agg (nested-free types round-trip).
    Q("q43_json_roundtrip",
      Some("""SELECT n_regionkey, count(*) AS n_nations
             |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin),
      (s, d) => {
        val path = tmpDir(d, "json")
        val src = nation(s, d)
        src.write.mode(SaveMode.Overwrite).json(path)
        s.read.schema(src.schema).json(path)
          .groupBy(col("n_regionkey")).agg(count(lit(1)).as("n_nations"))
          .orderBy("n_regionkey")
      })
  )
}
