package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CurationSpec extends SparkTestBase {
  import spark.implicits._

  test("hashSplit: deterministic, stable under corpus growth, ~80/10/10") {
    val small = Seq.range(0L, 200L).toDF("id")
    val big = Seq.range(0L, 2000L).toDF("id")
    def splits(df: org.apache.spark.sql.DataFrame) =
      Curation.hashSplit(df, "id").select("id", "split")
        .as[(Long, String)].collect().toMap
    val s1 = splits(small)
    val s2 = splits(big)
    // growth never reassigns an existing row
    assert(s1.forall { case (id, sp) => s2(id) == sp })
    val frac = s2.values.groupBy(identity).view.mapValues(_.size / 2000.0)
    assert(math.abs(frac("train") - 0.8) < 0.05, s"train ${frac("train")}")
    assert(math.abs(frac("val") - 0.1) < 0.03)
    assert(math.abs(frac("test") - 0.1) < 0.03)
    // rerun is identical (no rand() anywhere)
    assert(splits(small) == s1)
  }

  test("capPerKey keeps at most k per key with the given preference") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 30L), ("a", 3L, 20L), ("a", 4L, 30L),
      ("b", 5L, 1L)
    ).toDF("key", "id", "score")
    val kept = Curation.capPerKey(df, "key", 2, col("score").desc, col("id"))
      .select("id").as[Long].collect().toSet
    // a: prefers score 30 (ids 2,4 — tie by id) → {2,4}; b: everything
    assert(kept == Set(2L, 4L, 5L))
  }

  test("stratifiedSample: per-stratum rates honored approximately, " +
      "deterministic, and stable under corpus growth") {
    val rows = (0L until 2000L).map(i =>
      (i, if (i % 2 == 0) "A" else "B")).toDF("id", "stratum")
    def sample(df: org.apache.spark.sql.DataFrame) =
      Curation.stratifiedSample(df, "id", "stratum",
        Map("A" -> 50), 10).select("id").as[Long].collect().toSet
    val s = sample(rows)
    val nA = s.count(_ % 2 == 0); val nB = s.size - nA
    assert(math.abs(nA / 1000.0 - 0.5) < 0.08, s"A rate ${nA / 1000.0}")
    assert(math.abs(nB / 1000.0 - 0.1) < 0.05, s"B rate ${nB / 1000.0}")
    // rerun identical; growth never changes an existing row's fate
    assert(sample(rows) == s)
    val grown = sample((0L until 4000L).map(i =>
      (i, if (i % 2 == 0) "A" else "B")).toDF("id", "stratum"))
    assert(s.subsetOf(grown))
    // no shuffle: a pure filter must plan no Exchange
    val plan = Curation.stratifiedSample(rows, "id", "stratum",
      Map("A" -> 50), 10).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sample must not shuffle:\n$plan")
  }

  test("latestPerKey keeps exactly each key's newest row") {
    val df = Seq(
      ("u1", 1L, 10L), ("u1", 2L, 30L), ("u1", 3L, 30L),
      ("u2", 4L, 5L)
    ).toDF("key", "id", "ts")
    val kept = Curation.latestPerKey(df, "key",
        col("ts").desc, col("id").desc)
      .select("id").as[Long].collect().toSet
    // u1: ts 30 tie → higher id (3); u2: its only row
    assert(kept == Set(3L, 4L))
  }

  test("contaminationOverlap: duplicated eval doc is fully contaminated, " +
      "unique eval doc is clean") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),  // eval (0 % 2 == 0)
      (1L, "alpha beta gamma delta epsilon zeta"),  // train dup of 0
      (2L, "one two three four five six"),          // eval, unique
      (3L, "seven eight nine ten eleven twelve")    // train, unrelated
    ).toDF("doc_id", "text")
    val got = Curation
      .contaminationOverlap(docs, "doc_id", "text", col("doc_id") % 2 === 0)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(0L)._3 == 1.0, "full dup in train => contamination 1.0")
    assert(got(0L)._1 == got(0L)._2)
    assert(got(2L) == ((4L, 0L, 0.0)), "no shared shingles => clean")
  }

  test("contaminationOverlap: short eval doc (no shingles) reports 0.0") {
    val docs = Seq((0L, "xy"), (1L, "some train text here")).toDF("doc_id", "text")
    val got = Curation
      .contaminationOverlap(docs, "doc_id", "text", col("doc_id") === 0)
      .collect()
    assert(got.length == 1)
    assert(got.head.getLong(1) == 0L && got.head.getDouble(3) == 0.0)
  }

  private def mixCorpus = {
    // 1000 a, 500 b, 100 c — c is scarce relative to its weight below
    val rows = (1L to 1000L).map((_, "a")) ++
      (1001L to 1500L).map((_, "b")) ++ (1501L to 1600L).map((_, "c"))
    rows.toDF("id", "dom")
  }

  test("mixtureResample: scarcest-domain feasibility — c kept whole, " +
    "a/b downsampled toward the 50/30/20 target") {
    val w = Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)
    // T = min(1000/0.5, 500/0.3, 100/0.2) = 500 → targets 250/150/100
    val got = Curation.mixtureResample(mixCorpus, "id", "dom", w)
      .groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("c") == 100L, "saturating domain keeps every row")
    // hash-threshold keeps ≈ frac·n_d; ±20% slack at these sizes
    assert(math.abs(got("a") - 250L) < 50, s"a: ${got("a")}")
    assert(math.abs(got("b") - 150L) < 30, s"b: ${got("b")}")
  }

  test("mixtureResample: unweighted domains are dropped; deterministic " +
    "across invocations") {
    val w = Map("a" -> 0.7, "b" -> 0.3)
    val r1 = Curation.mixtureResample(mixCorpus, "id", "dom", w)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val r2 = Curation.mixtureResample(mixCorpus, "id", "dom", w)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(r1 == r2)
    val doms = Curation.mixtureResample(mixCorpus, "id", "dom", w)
      .select("dom").distinct().collect().map(_.getString(0)).toSet
    assert(!doms.contains("c"))
  }

  test("mixtureResample: the corpus itself is never shuffled (only the " +
    "tiny per-domain frame exchanges)") {
    val plan = Curation.mixtureResample(mixCorpus, "id", "dom",
        Map("a" -> 0.6, "b" -> 0.4))
      .queryExecution.executedPlan.toString
    // the only allowed exchanges feed the |domains|-row count/min frames
    // and the broadcast of frac — the big side must join via broadcast
    assert(plan.contains("BroadcastHashJoin"),
      s"corpus join must be broadcast:\n$plan")
  }

  test("weightedSampleTopK matches a Scala A-ES model exactly " +
      "(same md5 uniform, same ln(u)/w key)") {
    val rows = (1L to 60L).map(i => (i, s"s${i % 3}", (i % 7 + 1) * 10L))
    val df = rows.toDF("id", "stratum", "w")
    def u(id: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16).toDouble + 1.0) / math.pow(2, 60)
    }
    val want = rows.groupBy(_._2).flatMap { case (st, rs) =>
      rs.map { case (id, _, w) => (id, math.log(u(id)) / w) }
        .sortBy { case (id, k) => (-k, id) }.take(5).zipWithIndex
        .map { case ((id, _), i) => (st, i + 1, id) }
    }.toSet
    val got = Curation.weightedSampleTopK(df, "id", "w", "stratum", 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == want)
  }

  private def hash60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      .substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("negativeSample matches a Scala model exactly: hash batches, " +
      "pair-hash ranking, no self-pairs, k per anchor") {
    val ids = (1L to 60L).toSeq
    val df = ids.toDF("id")
    val batchSize = 8
    val k = 3
    val nb = math.max(1L, math.ceil(ids.size / batchSize.toDouble).toLong)
    val batchOf = ids.map(i => i -> hash60(i.toString) % nb).toMap
    val want = ids.flatMap { a =>
      ids.filter(b => b != a && batchOf(b) == batchOf(a))
        .map(b => (b, hash60(s"$a#$b")))
        .sortBy { case (b, ph) => (ph, b) }
        .take(k).zipWithIndex
        .map { case ((b, _), i) => (a, i + 1, b) }
    }.toSet
    val got = Curation.negativeSample(df, "id", k, batchSize)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.forall { case (a, _, b) => a != b })
  }

  test("negativeSample: determinism across invocations; every anchor " +
      "with a non-singleton batch appears") {
    val df = (1L to 40L).toDF("id")
    val r1 = Curation.negativeSample(df, "id", 2, 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val r2 = Curation.negativeSample(df, "id", 2, 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(r1 == r2 && r1.nonEmpty)
  }

  test("weightedSampleTopK: non-positive weights are excluded; k >= n " +
      "keeps every positive-weight row") {
    val df = Seq((1L, "s", 5L), (2L, "s", 0L), (3L, "s", -2L),
      (4L, "s", 1L)).toDF("id", "stratum", "w")
    val got = Curation.weightedSampleTopK(df, "id", "w", "stratum", 10)
      .collect()
    assert(got.map(_.getLong(2)).sorted.toSeq == Seq(1L, 4L))
    assert(got.map(_.getInt(1)).sorted.toSeq == Seq(1, 2))
  }

  test("goldenRecord: canonical = longest text (tie -> lowest id); " +
      "modal lang/source with smallest-value tie-break; one row per " +
      "cluster keyed by the component label") {
    val docs = Seq(
      // cluster A (label 1): 3 members; 20 is longest; lang mode en(2);
      // source tie web/crawl 1-1 within... make web 2
      (1L, "short", "en", "web"),
      (20L, "the longest text here", "fr", "web"),
      (7L, "mid length", "en", "crawl"),
      // cluster B (label 2): TWO members with EQUAL max length -> the
      // lower id (2) wins; lang tie de/es -> 'de' (smallest)
      (2L, "same len A", "de", "s1"),
      (9L, "same len B", "es", "s1"),
      // unclustered doc: must not appear
      (100L, "alone", "xx", "zz")
    ).toDF("doc_id", "text", "lang", "source")
    val comps = Seq((1L, 1L), (20L, 1L), (7L, 1L), (2L, 2L), (9L, 2L))
      .toDF("node", "label")
    val got = Curation.goldenRecord(docs, comps, "doc_id", "text",
        Seq("lang", "source"))
      .collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        ((r.getAs[Long]("n_members"), r.getAs[Long]("canonical_id"),
          r.getAs[Long]("canonical_len"), r.getAs[String]("lang"),
          r.getAs[String]("source")))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((3L, 20L, 21L, "en", "web")))
    assert(got(2L) == ((2L, 2L, 10L, "de", "s1")))
  }

  /** The JVM twin of the op's md5 bucket (and DuckDB's): 60-bit md5
    * prefix mod `buckets`. */
  private def mdBucket(tok: String, buckets: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
    val hex = md.map(b => f"$b%02x").mkString.substring(0, 15)
    (BigInt(hex, 16) % buckets).toLong
  }

  test("importanceWeights: equals the hand-computed add-half LLR model") {
    val B = 1 << 20
    // target doc: x x y; raw doc: y z z — x is target-only (positive
    // evidence), z raw-only (negative), y neutral-ish
    val docs = Seq((0L, true, "x x y"), (1L, false, "y z z"))
      .toDF("doc_id", "is_tgt", "text")
    val bx = mdBucket("x", B); val by = mdBucket("y", B)
    val bz = mdBucket("z", B)
    assert(Set(bx, by, bz).size == 3, "hand model assumes no collision")
    val (tt, tr) = (3.0, 6.0)
    def lw(ct: Double, cr: Double): Double =
      math.log((ct + 0.5) / (tt + 0.5 * B)) -
        math.log((cr + 0.5) / (tr + 0.5 * B))
    val want = Map(
      0L -> (2 * lw(2, 2) + lw(1, 2)) / 3.0,
      1L -> (lw(1, 2) + 2 * lw(0, 2)) / 3.0)
    val got = Curation.importanceWeights(docs, "doc_id", "text",
        "is_tgt", B)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("logw_r"))
      .toMap
    want.foreach { case (id, w) =>
      assert(math.abs(got(id) - w) <= 1e-6, s"doc $id: ${got(id)} vs $w")
    }
    assert(got(0L) > got(1L),
      "target-only evidence must outscore raw-only evidence")
  }

  test("importanceWeights: an all-target corpus scores exactly 0 " +
      "everywhere (target distribution == raw distribution)") {
    val docs = Seq((0L, true, "a b c"), (1L, true, "c d"))
      .toDF("doc_id", "is_tgt", "text")
    val got = Curation.importanceWeights(docs, "doc_id", "text",
        "is_tgt", 1024)
      .collect().map(_.getAs[Double]("logw_r"))
    assert(got.nonEmpty && got.forall(_ == 0.0), got.toSeq.toString)
  }

  private def wfRows(rows: Seq[(String, Long)], frac: Double) =
    Curation.waterFillAlloc(rows.toDF("k", "w"), "k", "w", frac)
      .orderBy("k").collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("alloc_r"), r.getAs[Boolean]("saturated")))
      .toSeq

  test("waterFillAlloc: hand-derived levels — mixed regime, " +
      "nobody-saturates regime, everybody-saturates regime") {
    // n = [1, 2, 10], budget 6/13 of 13 = 6 → level 3: a,b keep all,
    // c capped at 3 (1 + 2 + 3 = 6)
    assert(wfRows(Seq("a" -> 1L, "b" -> 2L, "c" -> 10L), 6.0 / 13.0) ==
      Seq(("a", 1L, 1.0, true), ("b", 2L, 2.0, true),
        ("c", 10L, 3.0, false)))
    // n = [5, 6, 7], budget 6/18 of 18 = 6 → no candidate k, level =
    // budget/S = 2, all capped
    assert(wfRows(Seq("a" -> 5L, "b" -> 6L, "c" -> 7L), 6.0 / 18.0) ==
      Seq(("a", 5L, 2.0, false), ("b", 6L, 2.0, false),
        ("c", 7L, 2.0, false)))
    // budget ≥ total → everyone keeps everything, no special-casing
    assert(wfRows(Seq("a" -> 3L, "b" -> 9L), 2.0) ==
      Seq(("a", 3L, 3.0, true), ("b", 9L, 9.0, true)))
  }

  test("waterFillAlloc: allocations sum to the budget when capped " +
      "(the defining water-filling property)") {
    val rows = Seq("a" -> 13L, "b" -> 2L, "c" -> 40L, "d" -> 7L,
      "e" -> 25L)
    val frac = 0.5
    val got = wfRows(rows, frac)
    val total = rows.map(_._2).sum.toDouble
    val sum = got.map(_._3).sum
    assert(math.abs(sum - frac * total) < 1e-6,
      s"allocs $got sum $sum != ${frac * total}")
  }

  test("temperatureResample: α = 0.5 fully keeps the tail domain while " +
      "subsampling the head; two runs identical; target ≥ corpus keeps " +
      "everything") {
    val docs = ((0 until 100).map(i => (i.toLong, "big")) ++
      (100 until 104).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    // w = [10, 2]; frac_small = 52·2/12/4 > 1 → clamp 1 (all 4 kept);
    // frac_big = 52·10/12/100 ≈ 0.433
    val kept = Curation.temperatureResample(docs, "doc_id", "source",
      0.5, 52L)
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("small") == 4L, s"tail domain must be fully kept: $bySrc")
    assert(bySrc("big") < 100L && bySrc("big") > 0L, bySrc.toString)
    assert(kept.orderBy("doc_id").collect().toSeq ==
      Curation.temperatureResample(docs, "doc_id", "source", 0.5, 52L)
        .orderBy("doc_id").collect().toSeq)
    assert(Curation.temperatureResample(docs, "doc_id", "source", 0.5,
      1000L).count() == 104L)
  }

  test("privacyProfile: k-anonymity size gate and l-diversity distinct " +
      "gate flag independently") {
    val rows = Seq(
      // group (g1): n=3 < k=3? no, k=3 → n>=3 ok; 2 langs → clear
      ("g1", "en"), ("g1", "de"), ("g1", "en"),
      // group (g2): n=4 ≥ k but ONE distinct lang → l-diversity fails
      ("g2", "en"), ("g2", "en"), ("g2", "en"), ("g2", "en"),
      // group (g3): n=2 < k → k-anonymity fails despite 2 langs
      ("g3", "en"), ("g3", "fr"))
      .toDF("qi", "lang")
    val got = Curation.privacyProfile(rows, Seq("qi"), "lang", 3L, 2L)
      .orderBy("qi").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(got == Seq(("g1", 3L, 2L, false), ("g2", 4L, 1L, true),
      ("g3", 2L, 2L, true)), got.toString)
  }

  test("largestRemainderAlloc: hand-checked Hamilton case — counts " +
      "5/3/2, budget 7 → 4/2/1 (leftover seat to the largest remainder)") {
    val d = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .toDF("k")
    val got = Curation.largestRemainderAlloc(d, "k", 7L).orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 5L, 4L), ("b", 3L, 2L), ("c", 2L, 1L)),
      got.toSeq)
  }

  test("largestRemainderAlloc: Σ alloc == budget exactly, for budgets " +
      "that under- and over-floor") {
    val d = (Seq.fill(7)("a") ++ Seq.fill(5)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(1)("d")).toDF("k")
    for (b <- Seq(0L, 1L, 9L, 16L, 100L)) {
      val alloc = Curation.largestRemainderAlloc(d, "k", b)
        .agg(org.apache.spark.sql.functions.sum("alloc")).head.getLong(0)
      assert(alloc == b, s"budget $b allocated $alloc")
    }
  }

  test("budgetTrim: keeps best-scored docs until the budget, drops the " +
      "rest, never splits a doc") {
    val d = Seq(
      ("s", 1L, 100L, 0.9), ("s", 2L, 200L, 0.8), ("s", 3L, 150L, 0.7),
      ("s", 4L, 100L, 0.6), ("t", 5L, 400L, 0.5), ("t", 6L, 100L, 0.4))
      .toDF("src", "id", "nt", "score")
    val got = Curation.budgetTrim(d, "src", "id", "nt", "score",
        budget = 400L, scoreBandWidth = 0.25)
      .orderBy("src", "cum_tokens").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq
    // s: 0.9(100)→100, 0.8(200)→300, 0.7(150)→450 > 400 dropped, and
    // 0.6 is NOT back-filled (prefix semantics); t: 400 fits, 100 over
    assert(got == Seq(("s", 1L, 100L), ("s", 2L, 300L), ("t", 5L, 400L)),
      got.toString)
  }

  test("strideInterleave: weight 2 vs 1 yields the stride pattern " +
      "x x y x x y y y over 4+4 rows") {
    val d = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "x"),
      (10L, "y"), (11L, "y"), (12L, "y"), (13L, "y")).toDF("id", "src")
    val w = org.apache.spark.sql.functions
      .when(org.apache.spark.sql.functions.col("src") === "x", 2.0)
      .otherwise(1.0)
    val got = Curation.strideInterleave(d, "id", "src", w)
      .orderBy("pos").collect().map(_.getString(1)).toSeq
    // vt: x → .5,1,1.5,2 ; y → 1,2,3,4; ties (vt=1, vt=2) break x first
    assert(got == Seq("x", "x", "y", "x", "x", "y", "y", "y"), got)
  }

  test("strideInterleave: fractional weights (derived vt band width) " +
      "and an explicit vtBandWidth override agree exactly") {
    // weights < 1 stretch vt far beyond the row count — the regime where
    // the old fixed band width 1.0 made the offsets table O(rows/Σw);
    // band width must never change the RESULT, only the band sizing
    val d = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "x"),
      (10L, "y"), (11L, "y")).toDF("id", "src")
    val w = org.apache.spark.sql.functions
      .when(org.apache.spark.sql.functions.col("src") === "x", 0.25)
      .otherwise(0.125)
    val derived = Curation.strideInterleave(d, "id", "src", w)
      .orderBy("pos").collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2))).toSeq
    val overridden = Curation.strideInterleave(d, "id", "src", w,
        vtBandWidth = 7.0)
      .orderBy("pos").collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2))).toSeq
    assert(derived == overridden, s"$derived vs $overridden")
    // vt: x → 4,8,12,16 ; y → 8,16 ; ties at 8 and 16 break x before y
    assert(derived.map(_._2) == Seq("x", "x", "y", "x", "x", "y"), derived)
  }

  test("strideInterleave: equal weights round-robin, positions are a " +
      "1..n permutation") {
    val d = Seq((1L, "x"), (2L, "x"), (10L, "y"), (11L, "y"),
      (20L, "z"), (21L, "z")).toDF("id", "src")
    val rows = Curation.strideInterleave(d, "id", "src",
        org.apache.spark.sql.functions.lit(1.0))
      .orderBy("pos").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 6L), "positions")
    // each stride of 3 holds one row of each source
    val srcs = rows.map(_.getString(1)).grouped(3).toSeq
    assert(srcs.forall(_.toSet == Set("x", "y", "z")), srcs.toString)
  }

  test("htTotalAudit: certainty sampling (pi = 1) reproduces the " +
      "exact total with zero variance; capped pi stays a probability") {
    import spark.implicits._
    val df = Seq((1L, 100L), (2L, 250L), (3L, 400L)).toDF("id", "y")
    // scale <= min(y): every pi capped at 1 -> census
    val r = Curation.htTotalAudit(df, "id", "y", 100.0).collect().head
    assert(r.getAs[Long]("n_pop") == 3)
    assert(r.getAs[Long]("n_sample") == 3)
    assert(r.getAs[Long]("total") == 750)
    assert(r.getAs[Double]("ht_total_r") == 750.0)
    assert(r.getAs[Double]("rel_err_r") == 0.0)
    assert(r.getAs[Double]("ht_se_r") == 0.0)
    // large scale: a real subsample; the HT weights stay finite and
    // the sample is a subset
    val r2 = Curation.htTotalAudit(df, "id", "y", 1e9).collect().head
    assert(r2.getAs[Long]("n_sample") <= 3)
  }
}
