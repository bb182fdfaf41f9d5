package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the LLM-data-pipeline surface
  * (SURVEY.md §2.12 / builder north star): normalization, tokenization,
  * token stats, language-ID heuristic, quality scoring, fingerprinting.
  *
  * All pure `functions._` compositions — codegen'd, shuffle-free per-row
  * work that scales linearly; no UDFs. Hashing is md5-based so the DuckDB
  * oracle can reproduce it bit-for-bit.
  */
object TextOps {

  /** Canonical text form: collapse whitespace, trim, lowercase. */
  def normalize(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Whitespace tokens of a normalized string. */
  def tokens(c: Column): Column = split(c, " ")

  /** 60-bit hash from the md5 hex prefix — reproducible in any engine
    * with md5 (DuckDB: ('0x' || substr(md5(s),1,15))::BIGINT). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Token count + alpha-token count + a BPE-ish size estimate
    * (ceil(chars/4) — the usual ~4 chars/token heuristic). */
  def tokenStats(df: DataFrame, textCol: String): DataFrame = df
    .withColumn("_norm", normalize(col(textCol)))
    .withColumn("n_tokens", size(tokens(col("_norm"))))
    .withColumn("n_alpha_tokens",
      size(regexp_extract_all(col(textCol), lit("[a-zA-Z]+"), lit(0))))
    .withColumn("n_tokens_bpe_est",
      ceil(length(col(textCol)) / lit(4.0)).cast("long"))
    .drop("_norm")

  /** Stopword-profile language ID (n-gram/stopword heuristic). Scores are
    * exact regex-match counts; argmax with a fixed precedence order so the
    * result is deterministic. On real corpora the profiles would be learned;
    * the operator shape (per-row regex counts + argmax) is the same. */
  val langProfiles: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in|is|was)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht)\\b",
    "es" -> "\\b(el|los|las|es|y|que)\\b",
    "fr" -> "\\b(le|les|et|est|une|dans)\\b")

  def langId(df: DataFrame, textCol: String): DataFrame = {
    val scored = langProfiles.foldLeft(df) { case (d, (lang, pat)) =>
      d.withColumn(s"score_$lang",
        size(regexp_extract_all(col(textCol), lit(pat), lit(0))))
    }
    val best = langProfiles.map(_._1).foldRight(lit("und")) {
      case (lang, els) =>
        val c = col(s"score_$lang")
        val others = langProfiles.map(_._1).filter(_ != lang)
          .map(o => c >= col(s"score_$o")).reduce(_ && _)
        when(c > 0 && others, lit(lang)).otherwise(els)
    }
    scored.withColumn("lang_pred", best)
  }

  /** Quality scoring: length/punctuation/stopword ratios combined into a
    * [0,1] score. Formula written in one fixed arithmetic order so any
    * engine computing it over the same doubles agrees bitwise. */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = df
    .withColumn("n_chars_obs", length(col(textCol)))
    .withColumn("n_tokens", size(tokens(normalize(col(textCol)))))
    .withColumn("n_punct",
      size(regexp_extract_all(col(textCol), lit("[.,!?;:]"), lit(0))))
    .withColumn("n_stop",
      size(regexp_extract_all(col(textCol), lit(langProfiles.head._2), lit(0))))
    .withColumn("punct_ratio",
      col("n_punct").cast("double") / col("n_chars_obs"))
    .withColumn("stop_ratio",
      col("n_stop").cast("double") / col("n_tokens"))
    .withColumn("quality",
      least(col("n_tokens").cast("double") / lit(100.0), lit(1.0)) * lit(0.4)
        + (lit(1.0) - col("punct_ratio")) * lit(0.3)
        + least(col("stop_ratio") * lit(5.0), lit(1.0)) * lit(0.3))

  /** Content fingerprints: full-content md5 of the normalized text, plus a
    * winnowing-style min-shingle-hash (robust to local edits). */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sh = Dedup.shingleTable(df, idCol, textCol)
    val minShingle = sh.groupBy(col(idCol))
      .agg(min(col("h")).as("min_shingle_hash"))
    df.select(col(idCol), md5(normalize(col(textCol))).as("content_md5"))
      .join(minShingle, Seq(idCol), "left")
  }
}
