package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Random-hyperplane (sign-bit) LSH over embedding columns — the
  * candidate-generation stage for embedding near-dup detection at scale
  * (the embedding analog of [[Dedup.lshCandidatePairs]]).
  *
  * Each vector gets `Bits` sign bits, bit j = sign(<v, h_j>) where h_j is a
  * deterministic Rademacher (±1) hyperplane derived from md5 — so the DuckDB
  * oracle reproduces the exact same signatures (the dot products are
  * left-associated float64 chains, bit-identical across engines). Bits are
  * grouped into `Bands`; vectors sharing any full band key become candidate
  * pairs via a band-key equi-join (hash join, never a cross product), then
  * candidates are verified with exact cosine similarity.
  *
  * Collision probability per bit is 1 − θ/π (Charikar's SimHash bound), so
  * the band design targets the high-similarity near-dup regime (cos ≥ ~0.9
  * ⇒ per-band hit ≈ 0.29, 8 bands ⇒ recall ≈ 93%). For pairs near the
  * decision boundary of uniformly random data (θ ≈ 60°) recall is
  * intentionally low — that regime is indistinguishable from noise and any
  * sub-quadratic method trades it away; both engines trade it away
  * identically, so results stay oracle-checkable.
  *
  * At 100 TB: signature computation is one map-side pass (Bits·dim flops
  * per row, no shuffle); the band join shuffles (id, band, key) rows only —
  * never the vectors — and its output is proportional to real near-dup
  * density, not n².
  */
object EmbeddingLsh {

  val Bits = 64
  val Bands = 8
  val RowsPerBand = 8
  require(Bands * RowsPerBand == Bits)

  /** Deterministic Rademacher hyperplane entries: sign(j, i) ∈ {+1, −1}
    * from the low bit of md5("graft-rp-j-i"). */
  def sign(j: Int, i: Int): Int = {
    val md = MessageDigest.getInstance("MD5")
      .digest(s"graft-rp-$j-$i".getBytes(StandardCharsets.UTF_8))
    if ((md(0) & 1) == 1) 1 else -1
  }

  /** <v, h_j> as a left-associated SQL sum chain — identical evaluation
    * order in Spark and DuckDB, hence bit-identical float64 results.
    * `oneBased` selects DuckDB's 1-based list indexing. */
  def dotSql(vCol: String, j: Int, dim: Int, oneBased: Boolean): String = {
    val terms = (0 until dim).map { i =>
      val t = s"$vCol[${if (oneBased) i + 1 else i}]"
      if (i == 0) { if (sign(j, i) > 0) t else s"(- $t)" }
      else { if (sign(j, i) > 0) s"+ $t" else s"- $t" }
    }
    terms.mkString(" ")
  }

  /** Band key for band b: the band's bits concatenated as a '0'/'1' string
    * over the dot columns d0..d{Bits-1}. */
  def bandKeySql(b: Int, concatFn: (Seq[String]) => String): String = {
    val bits = (0 until RowsPerBand).map { r =>
      s"CASE WHEN d${b * RowsPerBand + r} >= 0 THEN '1' ELSE '0' END"
    }
    concatFn(bits)
  }

  /** (id, band, bk): LSH band keys per vector — Bands rows per input row.
    * One narrow map-side pass; the heavy embedding column is dropped before
    * the explode.
    *
    * The 64 dot products run through the codegen [[graft.expr.VectorExprs
    * DotProduct]] kernel against constant ±1 float hyperplanes — a tight
    * primitive loop per product, instead of 64 hand-built 64-term SQL sum
    * chains (a 4096-node projection that blows past whole-stage-codegen
    * method limits). Bit-parity with the oracle's explicit chain holds
    * because the kernel accumulates left-to-right from 0.0 (0.0 + t0 ≡ t0)
    * and multiplying by ±1.0 is exact, so each d_j is the identical
    * float64. Band keys are bits packed into an int — only key EQUALITY
    * matters for the candidate join, and bit-pattern equality is the same
    * relation as the oracle's '0'/'1'-string equality. */
  def bandedSignatures(emb: DataFrame, idCol: String, embCol: String,
      dim: Int): DataFrame = {
    import graft.expr.VectorKernels.dot_product
    val dots = (0 until Bits).map { j =>
      val plane = array((0 until dim).map(i => lit(sign(j, i).toFloat)): _*)
      dot_product(col(embCol), plane).as(s"d$j")
    }
    val withDots = emb.select(col(idCol) +: dots: _*)
    val bandStructs = (0 until Bands).map { b =>
      val key = (0 until RowsPerBand).map { r =>
        s"(CASE WHEN d${b * RowsPerBand + r} >= 0 THEN ${1 << r} ELSE 0 END)"
      }.mkString(" + ")
      s"struct($b AS band, $key AS bk)"
    }
    withDots
      .select(col(idCol),
        explode(expr(s"array(${bandStructs.mkString(", ")})")).as("b"))
      .select(col(idCol), col("b.band").as("band"), col("b.bk").as("bk"))
  }

  /** Distinct candidate pairs (a < b) via the shared band-key equi-join
    * ([[Dedup.bandJoin]] — one implementation for both LSH families). */
  def candidatePairs(bands: DataFrame, idCol: String): DataFrame =
    Dedup.bandJoin(bands, idCol, "vec_a", "vec_b")

  /** End-to-end: LSH candidates verified by exact cosine, keeping pairs
    * with rounded cos_sim > `threshold`. Output: (vec_a, vec_b, cos_sim). */
  def nearDupPairs(emb: DataFrame, idCol: String, embCol: String, dim: Int,
      threshold: Double): DataFrame = {
    import graft.expr.VectorKernels.cosine_sim
    val cand = candidatePairs(bandedSignatures(emb, idCol, embCol, dim), idCol)
    val ea = emb.select(col(idCol).as("vec_a"), col(embCol).as("ea"))
    val eb = emb.select(col(idCol).as("vec_b"), col(embCol).as("eb"))
    cand.join(ea, Seq("vec_a")).join(eb, Seq("vec_b"))
      .withColumn("cos_sim", round(cosine_sim(col("ea"), col("eb")), 9))
      .filter(col("cos_sim") > threshold)
      .select("vec_a", "vec_b", "cos_sim")
  }

  /** DuckDB twin of [[nearDupPairs]] up to the verified-pairs selection —
    * generated from the same sign matrix so candidates are identical. */
  def duckdbPairsSql(table: String, idCol: String, embCol: String, dim: Int,
      threshold: Double): String = {
    val dots = (0 until Bits)
      .map(j => s"${dotSql("v", j, dim, oneBased = true)} AS d$j")
      .mkString(",\n    ")
    val bandSelects = (0 until Bands).map { b =>
      val key = bandKeySql(b, bits => bits.mkString(" || "))
      s"SELECT $idCol, $b AS band, $key AS bk FROM dots"
    }.mkString("\n  UNION ALL ")
    s"""WITH vd AS (
       |  SELECT $idCol, $embCol::DOUBLE[] AS v FROM $table),
       |dots AS (
       |  SELECT $idCol,
       |    $dots
       |  FROM vd),
       |bands AS (
       |  $bandSelects),
       |okbands AS (
       |  SELECT $idCol, band, bk FROM (
       |    SELECT $idCol, band, bk,
       |      count(*) OVER (PARTITION BY band, bk) AS n FROM bands) t
       |  WHERE n <= ${Dedup.MaxBucket}),
       |cand AS (
       |  SELECT DISTINCT a.$idCol AS vec_a, b.$idCol AS vec_b
       |  FROM okbands a JOIN okbands b ON a.band = b.band AND a.bk = b.bk
       |    AND a.$idCol < b.$idCol),
       |sims AS (
       |  SELECT vec_a, vec_b,
       |    round(list_cosine_similarity(ea.v, eb.v), 9) AS cos_sim
       |  FROM cand
       |   JOIN vd ea ON ea.$idCol = vec_a
       |   JOIN vd eb ON eb.$idCol = vec_b)
       |SELECT vec_a, vec_b, cos_sim FROM sims WHERE cos_sim > $threshold""".stripMargin
  }
}
