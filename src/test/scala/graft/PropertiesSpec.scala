package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, rng}

import graft.ops.{AsOf, Skew}

/** Property-style tests (SURVEY.md §5.2) with fixed-seed generators:
  * operator outputs are compared against independent brute-force models
  * on randomized inputs.
  */
class PropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val seed = rng.Seed(42L)

  private def sample[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, seed)

  test("asof backward == brute-force max-ts-at-or-before, on random data") {
    val gen = for {
      user <- Gen.choose(1L, 5L)
      t <- Gen.choose(0L, 1000L)
    } yield (user, t)
    val leftRaw = sample(gen, 120).zipWithIndex
      .map { case ((u, t), i) => (i.toLong, u, new Timestamp(t * 1000)) }
    val rightRaw = sample(gen, 80).zipWithIndex
      .map { case ((u, t), i) => (u, new Timestamp(t * 1000), i.toLong, s"v$i") }

    val left = leftRaw.toDF("event_id", "user_id", "ts")
    val right = rightRaw.toDF("user_id", "ts", "sig_id", "tag")
    val got = AsOf.backward(left, right, "user_id", "ts", "sig_id",
      Seq("tag" -> "tag"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("tag"))).toMap

    leftRaw.foreach { case (id, u, ts) =>
      val candidates = rightRaw.filter(r => r._1 == u && !r._2.after(ts))
      val expected = if (candidates.isEmpty) None
        else Some(candidates.maxBy(r => (r._2.getTime, r._3))._4)
      assert(got(id) == expected, s"event $id (user $u, ts $ts)")
    }
  }

  test("salted join == plain join on random skewed data") {
    val bigGen = for {
      key <- Gen.frequency((8, Gen.const(1L)), (2, Gen.choose(2L, 10L)))
      v <- Gen.choose(0, 1000)
    } yield (key, v)
    val big = sample(bigGen, 500).toDF("k", "v")
    val small = (1L to 10L).map(k => (k, s"dim$k")).toDF("k", "name")

    val plain = big.join(small, Seq("k"))
    val salted = Skew.saltedJoin(big, small, "k", 16)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain.select(salted.columns.map(org.apache.spark.sql.functions.col): _*)).isEmpty)
    assert(plain.exceptAll(salted.select(plain.columns.map(org.apache.spark.sql.functions.col): _*)).isEmpty)
  }

  test("sessionize == brute-force gap model, on random event streams") {
    val gen = for {
      user <- Gen.choose(1L, 4L)
      t <- Gen.choose(0L, 2000L)
    } yield (user, t)
    val raw = sample(gen, 200).zipWithIndex
      .map { case ((u, t), i) => (i.toLong, u, new Timestamp(t * 1000)) }
    val gapSec = 120L
    val got = graft.ops.Sessionize
      .sessions(raw.toDF("event_id", "user_id", "ts"),
        "user_id", "ts", "event_id", gapSec)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    // brute force: per user, walk events in (ts, id) order and break on
    // gap > threshold
    val model = raw.groupBy(_._2).flatMap { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._3.getTime, e._1))
      var idx = 0L
      var prev: Option[Long] = None
      val counts = collection.mutable.Map.empty[(Long, Long), Long]
      sorted.foreach { e =>
        val t = e._3.getTime
        if (prev.isEmpty || t - prev.get > gapSec * 1000) idx += 1
        prev = Some(t)
        counts((u, idx)) = counts.getOrElse((u, idx), 0L) + 1
      }
      counts
    }
    assert(got == model.toMap)
    // sessions partition the events: counts sum to the input size
    assert(got.values.sum == raw.size)
  }

  test("hashSplit is a pure function of the id, at any corpus size") {
    val g = Gen.choose(0L, 100000L)
    val ids = sample(g, 400).distinct
    val assigned = graft.ops.Curation
      .hashSplit(ids.toDF("id"), "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    // model: same md5-prefix arithmetic, computed JVM-side
    ids.foreach { id =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val bucket = java.lang.Long.parseLong(
        md.take(4).map("%02x".format(_)).mkString, 16) % 100
      val want = if (bucket < 80) "train" else if (bucket < 90) "val"
        else "test"
      assert(assigned(id) == want, s"id $id bucket $bucket")
    }
  }

  test("upsert laws on random snapshots: identity, key union, updates win") {
    import org.apache.spark.sql.functions.col
    val g = for {
      k <- Gen.choose(0L, 80L)
      v <- Gen.choose(0, 1000)
    } yield (k, v)
    // key-unique snapshots (the documented input invariant)
    val cur = sample(g, 120).groupBy(_._1).map(_._2.head).toList
    val upd = sample(g, 60).groupBy(_._1).map { case (k, vs) =>
      (k, vs.head._2 + 10000) }.toList
    val curDf = cur.toDF("k", "v"); val updDf = upd.toDF("k", "v")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v").as[(Long, Int)].collect().toMap
    // identity: empty updates change nothing
    assert(toMap(graft.ops.Curation.upsert(curDf, curDf.limit(0), "k")) ==
      cur.toMap)
    // merge: updates win on collision, new keys insert, others survive
    val merged = toMap(graft.ops.Curation.upsert(curDf, updDf, "k"))
    assert(merged == cur.toMap ++ upd.toMap)
    // idempotence: re-applying the same updates is a no-op
    val again = toMap(graft.ops.Curation.upsert(
      merged.toList.toDF("k", "v"), updDf, "k"))
    assert(again == merged)
  }

  test("stratifiedSample == JVM-side md5-bucket model, on random strata") {
    val g = for {
      id <- Gen.choose(0L, 100000L)
      s <- Gen.oneOf("en", "de", "fr")
    } yield (id, s)
    val rows = sample(g, 300).distinctBy(_._1)
    val rates = Map("en" -> 30, "de" -> 70)
    val kept = graft.ops.Curation
      .stratifiedSample(rows.toDF("id", "stratum"), "id", "stratum",
        rates, 5)
      .select("id").as[Long].collect().toSet
    rows.foreach { case (id, s) =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      val bucket = java.lang.Long.parseLong(hex, 16) % 100
      val want = bucket < rates.getOrElse(s, 5)
      assert(kept.contains(id) == want, s"id $id stratum $s bucket $bucket")
    }
  }

  test("latestPerKey == brute-force argmax, on random versioned rows") {
    import org.apache.spark.sql.functions.col
    val g = for {
      k <- Gen.choose(1L, 20L)
      ts <- Gen.choose(0L, 50L)
      v <- Gen.choose(0, 1000)
    } yield (k, ts, v)
    val raw = sample(g, 250).zipWithIndex
      .map { case ((k, ts, v), i) => (k, ts, i.toLong, v) }
    val got = graft.ops.Curation
      .latestPerKey(raw.toDF("k", "ts", "id", "v"), "k",
        col("ts").desc, col("id").desc)
      .select("k", "id").as[(Long, Long)].collect().toMap
    val model = raw.groupBy(_._1).map { case (k, rs) =>
      k -> rs.maxBy(r => (r._2, r._3))._3 }
    assert(got == model)
  }

  test("unigramSurprisal == JVM brute force over a random mini-corpus") {
    val tokGen = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val docGen = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, tokGen))
    val docs = sample(docGen, 30).zipWithIndex
      .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
    val got = graft.ops.TextOps
      .unigramSurprisal(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_surprisal"))).toMap
    val all = docs.flatMap(_._2.split(" "))
    val cf = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = all.size.toDouble
    docs.foreach { case (id, text) =>
      val toks = text.split(" ")
      val want = toks.map(t => -math.log(cf(t) / n)).sum / toks.length
      assert(got(id)._1 == toks.length)
      assert(math.abs(got(id)._2 - want) < 1e-8,
        s"doc $id: got ${got(id)._2}, want $want")
    }
  }

  test("incremental newKeys == set difference, on random overlapping sets") {
    val g = Gen.choose(0L, 200L)
    val fetched = sample(g, 300)
    val sink = sample(g, 150)
    val got = graft.etl.Incremental.newKeys(
      fetched.toDF("videoId"), sink.toDF("videoId"), "videoId")
      .as[Long].collect().toSet
    assert(got == (fetched.toSet -- sink.toSet))
  }

  test("CDC round-trip law on random snapshots: applyDiff(old, " +
      "snapshotDiff(old, new)) == new") {
    val g = for {
      k <- Gen.choose(0L, 60L)
      v <- Gen.choose(0, 5)          // small domain → frequent collisions
      s <- Gen.oneOf("A", "B")
    } yield (k, v, s)
    // key-unique snapshots with overlapping key ranges → all of
    // insert/update/delete/unchanged occur
    val rows = sample(g, 160)
    val oldRows = rows.take(80).groupBy(_._1).map(_._2.head).toList
    val newRows = rows.drop(80).groupBy(_._1).map(_._2.head).toList
    val oldDf = oldRows.toDF("k", "v", "s")
    val newDf = newRows.toDF("k", "v", "s")
    val diff = graft.ops.Cdc.snapshotDiff(oldDf, newDf, "k", Seq("v", "s"))
    // the diff itself is minimal: unchanged keys never appear
    val unchanged = oldRows.toSet.intersect(newRows.toSet).map(_._1)
    val diffKeys = diff.select("k").as[Long].collect().toSet
    assert(diffKeys.intersect(unchanged).isEmpty)
    // round trip
    val applied = graft.ops.Cdc.applyDiff(oldDf, diff, "k", Seq("v", "s"))
      .as[(Long, Int, String)].collect().toSet
    assert(applied == newRows.toSet)
  }

  test("mergeAggState associativity/identity laws on random deltas: " +
      "fold of daily deltas == one-shot aggregate") {
    import org.apache.spark.sql.functions._
    val g = for {
      k <- Gen.oneOf("a", "b", "c", "d")
      v <- Gen.choose(-8, 8)
    } yield (k, v * 0.5) // halves: float sums exact under any grouping
    val rows = sample(g, 240)
    def aggOf(rs: List[(String, Double)]) = rs.toDF("k", "v")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum"))
    val days = rows.grouped(60).toList // 4 "daily" deltas
    val folded = days.tail.map(aggOf)
      .foldLeft(aggOf(days.head))(graft.ops.Cdc.mergeAggState(_, _, "k"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    val oneShot = aggOf(rows).collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2))).toMap
    assert(folded == oneShot)
  }

  test("dupNGramCoverage bounds on random corpora: 0 <= n_covered <= " +
      "n_tokens, and a doc duplicated verbatim is fully covered") {
    val word = Gen.oneOf("w1", "w2", "w3", "w4", "w5", "w6")
    val doc = Gen.choose(4, 12)
      .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val texts = sample(doc, 30)
    // append an exact duplicate pair so full coverage provably occurs
    val rows = (texts :+ texts.head).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val got = graft.ops.Dedup
      .dupNGramCoverage(rows.toDF("doc_id", "text"), "doc_id", "text", 3)
      .collect()
    assert(got.length == rows.size)
    got.foreach { r =>
      val (nt, nc) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_covered"))
      assert(nc >= 0L && nc <= nt)
    }
    val byId = got.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Double]("coverage_r")).toMap
    assert(byId(0L) == 1.0 && byId(rows.size - 1L) == 1.0,
      "verbatim duplicates must be fully covered")
  }

  test("chunkWindows reconstruction law on random docs: the step-prefix " +
      "of each chunk concatenates back to the document") {
    val word = Gen.oneOf("alpha", "b", "ccc", "dd", "eeeee")
    val doc = Gen.choose(1, 40)
      .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val texts = sample(doc, 25)
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val chunkTokens = 7; val overlap = 3; val step = chunkTokens - overlap
    val got = graft.ops.TextOps.chunkWindows(rows.toDF("doc_id", "text"),
        "doc_id", "text", chunkTokens, overlap)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    got.groupBy(_._1).foreach { case (id, chunks) =>
      val toks = texts(id.toInt).split(" ").toSeq
      // start offsets are exactly 0, step, 2·step, … < n
      assert(chunks.map(_._3).toSeq ==
        (0L until toks.size.toLong by step.toLong).toSeq)
      chunks.foreach { case (_, _, start, n, text) =>
        val want = toks.slice(start.toInt, start.toInt + chunkTokens)
        assert(n == want.size && text == want.mkString(" "),
          s"doc $id chunk at $start")
      }
      // dropping each NON-FINAL chunk's overlap tail reconstructs the
      // document (only the final chunk may be shorter than step, and it
      // always reaches the document end)
      val lastStart = chunks.map(_._3).max
      val rebuilt = chunks.flatMap { case (_, _, start, _, text) =>
        val ws = text.split(" ", -1).toSeq
        if (start < lastStart) ws.take(step) else ws
      }
      assert(rebuilt.toSeq == toks, s"doc $id must reconstruct")
    }
  }

  test("lengthBucketBatches conservation laws on random weights: every " +
      "row lands in exactly one batch, batches hold <= batchSize, and " +
      "padding is non-negative") {
    val gen = Gen.choose(1L, 300L)
    val ws = sample(gen, 200)
    val rows = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val got = graft.ops.Pack.lengthBucketBatches(rows.toDF("id", "w"),
        "id", "w", bucketWidth = 50L, batchSize = 7, rangeSize = 16L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.map(_._3).sum == rows.size.toLong, "every row batched once")
    got.foreach { case (b, bi, n, sumW, maxW, pad) =>
      assert(n >= 1 && n <= 7, s"batch ($b,$bi) size $n")
      assert(pad == n * maxW - sumW && pad >= 0)
    }
    // within a bucket, only the LAST batch may be partial
    got.groupBy(_._1).foreach { case (b, bs) =>
      val partial = bs.filter(_._3 < 7).map(_._2)
      assert(partial.size <= 1 &&
        partial.forall(_ == bs.map(_._2).max),
        s"bucket $b: non-final partial batch")
    }
  }
}
