package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.util.Tables

/** Ranks.bandedRank must equal the naive single-task window exactly, and
  * ntileFromRank must be byte-identical to SQL ntile — for every group
  * size / tile count shape, including n < k and heavy ties. */
class RanksSpec extends SparkTestBase {

  test("bandedRank == row_number window on documents, several bandwidths") {
    val docs = Tables.documents(spark, sf())
      .select("doc_id", "lang", "n_chars")
    val w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    val expect = docs
      .withColumn("rnk", (row_number().over(w) - 1).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    for (bw <- Seq(1.0, 7.0, 100.0, 1e9)) {
      val got = Ranks.bandedRank(docs, "lang", "n_chars", "doc_id", bw)
        .collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rnk")).toMap
      assert(got == expect, s"bandWidth=$bw")
    }
  }

  test("bandedRank grp_n equals the group size") {
    val docs = Tables.documents(spark, sf())
      .select("doc_id", "lang", "n_chars")
    val sizes = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Ranks.bandedRank(docs, "lang", "n_chars", "doc_id", 50.0)
      .select("lang", "grp_n").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == sizes)
  }

  test("ntileFromRank == SQL ntile for k in {2,3,7,10}, incl. ties and n<k") {
    import spark.implicits._
    // 3 groups: sizes 17 (with ties), 5, 2 — exercises n<k for k=7,10
    val rows = (0 until 17).map(i => ("a", i.toLong, (i / 3).toLong)) ++
      (0 until 5).map(i => ("b", i.toLong, i.toLong)) ++
      (0 until 2).map(i => ("c", i.toLong, 0L))
    val df = rows.toDF("g", "id", "v")
    for (k <- Seq(2, 3, 7, 10)) {
      val w = Window.partitionBy("g").orderBy("v", "id")
      val expect = df
        .select(col("g"), col("id"), ntile(k).over(w).as("t"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2))
        .toMap
      val got = Ranks.bandedRank(df, "g", "v", "id", 2.0)
        .withColumn("t", Ranks.ntileFromRank(col("rnk"), col("grp_n"), k))
        .select("g", "id", "t")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2))
        .toMap
      assert(got == expect, s"k=$k")
    }
  }

  test("bandedRank plan: no window partitioned by group alone (the " +
      "single-task shape it exists to avoid)") {
    val docs = Tables.documents(spark, sf())
      .select("doc_id", "lang", "n_chars")
    val plan = Ranks.bandedRank(docs, "lang", "n_chars", "doc_id", 100.0)
      .queryExecution.executedPlan.toString
    // the per-row window must key on (lang, _band); only the tiny
    // band-count table may window on lang alone
    val rowWindows = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("row_number"))
      .toSeq
    assert(rowWindows.nonEmpty)
    assert(rowWindows.forall(_.contains("_band")),
      s"row_number window not banded:\n$rowWindows")
  }

  test("bandedRunningSum == the naive running-sum window, several " +
      "bandwidths") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rows = (0L until 300L).map(i =>
      (s"g${i % 2}", i, i % 13)).toDF("grp", "ord", "v")
    val w = Window.partitionBy("grp").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = rows.withColumn("runsum", sum(col("v")).over(w))
      .select("grp", "ord", "runsum").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (bw <- Seq(11.0, 64.0, 500.0)) {
      val got = Ranks.bandedRunningSum(rows, "grp", "ord", "v", bw)
        .select("grp", "ord", "runsum").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == want, s"bandWidth $bw")
    }
  }

  test("bandedRunningMax == the naive running-max window, several " +
      "bandwidths") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rows = (0L until 500L).map(i =>
      (s"g${i % 3}", i, (i * 37 % 101).toDouble)).toDF("grp", "ord", "v")
    val w = Window.partitionBy("grp").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = rows.withColumn("runmax", max(col("v")).over(w))
      .select("grp", "ord", "runmax").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for (bw <- Seq(7.0, 64.0, 1000.0)) {
      val got = Ranks.bandedRunningMax(rows, "grp", "ord", "v", bw)
        .select("grp", "ord", "runmax").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(got == want, s"bandWidth $bw")
    }
  }

  test("exactQuantiles: percentile_cont hand cases — interpolation, " +
      "ties, and the n=1 group") {
    import spark.implicits._
    val d = Seq(("g", 10.0, 1L), ("g", 20.0, 2L), ("g", 20.0, 3L),
      ("g", 40.0, 4L), ("h", 7.0, 5L)).toDF("grp", "v", "id")
    val got = Ranks.exactQuantiles(d, "grp", "v", "id", 10.0,
        Seq(1, 2, 3), 4)
      .orderBy("grp", "q").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    // g sorted: 10,20,20,40; h = (n=3)·0.25 → pos .75 → 10·.25+20·.75
    assert(got.toSeq == Seq(
      ("g", 4L, 0.25, 17.5), ("g", 4L, 0.5, 20.0), ("g", 4L, 0.75, 25.0),
      ("h", 1L, 0.25, 7.0), ("h", 1L, 0.5, 7.0), ("h", 1L, 0.75, 7.0)),
      got.toSeq)
  }

  test("rankSumAuc: perfect separation → 1, reversed → 0, constant " +
      "score → 0.5") {
    import spark.implicits._
    def auc(rows: Seq[(Double, Boolean)]): Double = {
      val d = rows.map { case (s, l) => ("g", s, l) }
        .toDF("grp", "score", "label")
      Ranks.rankSumAuc(d, "grp", "score", "label").head.getDouble(3)
    }
    assert(auc(Seq((1.0, false), (2.0, false), (3.0, true),
      (4.0, true))) == 1.0)
    assert(auc(Seq((1.0, true), (2.0, true), (3.0, false),
      (4.0, false))) == 0.0)
    assert(auc(Seq((5.0, true), (5.0, false), (5.0, true),
      (5.0, false))) == 0.5)
  }

  test("rankSumAuc: midrank tie handling matches the hand-computed " +
      "Mann–Whitney value, and a one-class group yields null") {
    import spark.implicits._
    val d = Seq(("g", 1.0, true), ("g", 2.0, true), ("g", 2.0, false),
      ("g", 3.0, false), ("h", 1.0, true), ("h", 2.0, true))
      .toDF("grp", "score", "label")
    val rows = Ranks.rankSumAuc(d, "grp", "score", "label")
      .orderBy("grp").collect()
    // pairs: (1,2)=0 (1,3)=0 (2,2)=0.5 (2,3)=0 → U=0.5, AUC=0.5/4
    assert(rows(0).getDouble(3) == 0.125, rows(0).toString)
    assert(rows(1).isNullAt(3), "one-class group must yield null auc")
  }

  test("weightedMedian == the weight-exploded plain lower median, " +
      "several bandwidths; unit weights reduce to the lower median") {
    import spark.implicits._
    // deterministic pseudo-random values/weights, two groups
    val rows = (0L until 200L).map { i =>
      (s"g${i % 2}", (i * 37 % 101), 1L + (i * 53 % 7), i)
    }.toDF("grp", "v", "w", "id")
    // oracle: explode each row w times; the lower weighted median is the
    // value at 1-based position ceil(n/2) (first i with 2i ≥ n) of the
    // sorted multiset
    val want = rows.as[(String, Long, Long, Long)].collect()
      .flatMap { case (g, v, w, _) => Seq.fill(w.toInt)((g, v)) }
      .groupBy(_._1).map { case (g, vs) =>
        val sorted = vs.map(_._2).sorted
        g -> sorted((sorted.length + 1) / 2 - 1)
      }
    for (bw <- Seq(7.0, 50.0, 1000.0)) {
      val got = Ranks.weightedMedian(rows, "grp", "v", "w", "id", bw)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(got == want, s"bandWidth $bw: got $got want $want")
    }
    // unit weights: matches the plain lower median
    val unit = rows.withColumn("w", lit(1L))
    val gotU = Ranks.weightedMedian(unit, "grp", "v", "w", "id", 50.0)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val wantU = rows.as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (g, vs) =>
        val sorted = vs.map(_._2).sorted
        g -> sorted((sorted.length + 1) / 2 - 1)
      }
    assert(gotU == wantU)
  }

  test("spearman: perfect monotone = 1, reversed = -1, ties use " +
      "average ranks (hand-checked value), constant column = null") {
    import spark.implicits._
    val mono = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 35L))
      .toDF("grp", "x", "y")
    assert(Ranks.spearman(mono, "grp", "x", "y").collect()
      .head.getDouble(2) == 1.0)
    val rev = Seq(("g", 1L, 30L), ("g", 2L, 20L), ("g", 3L, 10L))
      .toDF("grp", "x", "y")
    assert(Ranks.spearman(rev, "grp", "x", "y").collect()
      .head.getDouble(2) == -1.0)
    // x = (1,2,2,3), y = (1,2,3,4): avg x-ranks (1, 2.5, 2.5, 4).
    // Pearson on ranks = 3/sqrt(10) ≈ 0.948683
    val tied = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 2L, 3L),
      ("g", 3L, 4L)).toDF("grp", "x", "y")
    val r = Ranks.spearman(tied, "grp", "x", "y").collect().head
    assert(r.getLong(1) == 4)
    assert(math.abs(r.getDouble(2) - 3.0 / math.sqrt(10.0)) < 1e-6)
    val const = Seq(("g", 1L, 7L), ("g", 2L, 7L)).toDF("grp", "x", "y")
    assert(Ranks.spearman(const, "grp", "x", "y").collect()
      .head.isNullAt(2), "zero variance → null, not NaN")
  }

  test("liftTable: two buckets, all positives in the top — capture " +
      "100% at bucket 1, lift = 2x base") {
    import spark.implicits._
    // scores 4..1; ids 1..4; positives are the two high scorers
    val df = Seq((1L, 4L, true), (2L, 3L, true), (3L, 2L, false),
      (4L, 1L, false)).toDF("id", "sc", "pos")
    val got = Ranks.liftTable(df, "sc", "id", "pos", buckets = 2,
        bandWidth = 2.0)
      .orderBy("bucket").collect()
    assert(got.length == 2)
    val b1 = got(0); val b2 = got(1)
    assert(b1.getLong(1) == 2 && b1.getLong(2) == 2) // n_rows, n_pos
    assert(b1.getDouble(3) == 1.0)   // rate
    assert(b1.getDouble(4) == 1.0)   // capture after bucket 1
    assert(b1.getDouble(5) == 2.0)   // lift vs base 0.5
    assert(b2.getLong(2) == 0 && b2.getDouble(3) == 0.0
      && b2.getDouble(4) == 1.0 && b2.getDouble(5) == 0.0)
  }

  test("liftTable: bucket sizes follow the ntile law on a non-divisible " +
      "population") {
    import spark.implicits._
    val df = (1L to 7L).map(i => (i, 100L - i, i % 3 == 0))
      .toDF("id", "sc", "pos")
    val sizes = Ranks.liftTable(df, "sc", "id", "pos", 3, 10.0)
      .orderBy("bucket").collect().map(_.getLong(1)).toSeq
    assert(sizes == Seq(3L, 2L, 2L), s"ntile(3) over 7 rows: $sizes")
  }

  test("qiniCurve: hand two-bucket curve and area") {
    import spark.implicits._
    // top bucket: treated converter vs control non-converter (qini 1);
    // bottom bucket: treated non-converter vs control converter —
    // overall uplift 0, so the curve returns to 0 and AUQC = 0.5
    val df = Seq(
      (1L, 4L, true, 1L), (2L, 3L, false, 0L),
      (3L, 2L, true, 0L), (4L, 1L, false, 1L))
      .toDF("id", "sc", "armb", "conv")
    val rows = Ranks.qiniCurve(df, "sc", "id", "armb", "conv",
        buckets = 2, bandWidth = 8.0)
      .orderBy("bucket").collect()
    assert(rows.length == 2)
    val b1 = rows(0); val b2 = rows(1)
    assert(b1.getAs[Long]("nt_cum") == 1 && b1.getAs[Long]("ct_cum") == 1)
    assert(b1.getAs[Double]("qini_r") == 1.0)
    assert(b1.getAs[Double]("rand_r") == 0.0)
    assert(b2.getAs[Double]("qini_r") == 0.0)
    assert(b1.getAs[Double]("qini_auc_r") == 0.5)
    assert(b2.getAs[Double]("qini_auc_r") == 0.5)
  }

  test("qiniCurve: undefined early bucket nulls the area, not shrinks it") {
    import spark.implicits._
    // top bucket is all-treated (nc_cum = 0): its qini point is
    // undefined, so the AUC must be NULL — summing the remaining
    // trapezoids would silently understate the area
    val df = Seq(
      (1L, 4L, true, 1L), (2L, 3L, true, 0L),
      (3L, 2L, false, 1L), (4L, 1L, false, 0L))
      .toDF("id", "sc", "armb", "conv")
    val rows = Ranks.qiniCurve(df, "sc", "id", "armb", "conv",
        buckets = 2, bandWidth = 8.0)
      .orderBy("bucket").collect()
    assert(rows.length == 2)
    assert(rows(0).isNullAt(rows(0).fieldIndex("qini_r")))
    assert(!rows(1).isNullAt(rows(1).fieldIndex("qini_r")))
    for (r <- rows) assert(r.isNullAt(r.fieldIndex("qini_auc_r")))
  }

  test("percentileDisc: value at ceil(q·n), even and odd n") {
    import spark.implicits._
    val even = (1L to 4L).map(i => ("g", i * 10L, i))
      .toDF("grp", "v", "id")
    val gotE = Ranks.percentileDisc(even, "grp", "v", "id", 8.0,
        Seq(1, 2, 3), 4)
      .collect()
      .map(r => r.getAs[Double]("q") -> r.getAs[Long]("q_val")).toMap
    assert(gotE == Map(0.25 -> 10L, 0.5 -> 20L, 0.75 -> 30L))
    val odd = (1L to 5L).map(i => ("g", i, i)).toDF("grp", "v", "id")
    val gotO = Ranks.percentileDisc(odd, "grp", "v", "id", 8.0,
        Seq(2), 4)
      .collect()
      .map(r => r.getAs[Double]("q") -> r.getAs[Long]("q_val")).toMap
    assert(gotO == Map(0.5 -> 3L)) // ceil(0.5·5) = 3rd value
  }
}
