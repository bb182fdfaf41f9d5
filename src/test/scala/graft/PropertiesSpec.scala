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

  test("incremental newKeys == set difference, on random overlapping sets") {
    val g = Gen.choose(0L, 200L)
    val fetched = sample(g, 300)
    val sink = sample(g, 150)
    val got = graft.etl.Incremental.newKeys(
      fetched.toDF("videoId"), sink.toDF("videoId"), "videoId")
      .as[Long].collect().toSet
    assert(got == (fetched.toSet -- sink.toSet))
  }
}
