package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The relational Bloom filter's contract: zero false negatives ever,
  * false positives at roughly the textbook rate, probe ≡ a JVM-side
  * brute-force model of the identical md5 bit arithmetic, and the
  * broadcast-size bound that makes the op a pre-shuffle filter. */
class BloomSpec extends SparkTestBase {
  import spark.implicits._

  private val MBits = 1024
  private val K = 3

  /** The op's exact position arithmetic, recomputed on the JVM. */
  private def positions(key: Long): Seq[Long] = (0 until K).map { j =>
    val h = MessageDigest.getInstance("MD5")
      .digest(s"$key#$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(h, 16) % MBits
  }

  test("no false negatives on random keys; probe == JVM brute-force " +
      "bit model; false-positive rate near (1 - e^(-kn/m))^k") {
    val rnd = new scala.util.Random(11)
    val inserted = Seq.fill(200)(rnd.nextLong().abs % 100000L).distinct
    val others = Seq.fill(400)(rnd.nextLong().abs % 100000L)
      .distinct.filterNot(inserted.contains)
    val bloom = Bloom.build(inserted.toDF("id"), "id", MBits, K)
    val probeKeys = inserted ++ others
    val got = Bloom.mightContain(probeKeys.toDF("id"), "id", bloom,
        MBits, K)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // brute-force model: the union of inserted keys' bits
    val bits = inserted.flatMap(positions).toSet
    probeKeys.foreach { id =>
      val want = positions(id).forall(bits.contains)
      assert(got(id) == want, s"key $id: got ${got(id)} want $want")
    }
    inserted.foreach(id => assert(got(id), s"false negative on $id"))
    val fp = others.count(got(_)).toDouble / others.size
    val expected = math.pow(
      1.0 - math.exp(-K.toDouble * inserted.size / MBits), K)
    assert(fp < 4 * expected + 0.05,
      s"fp rate $fp wildly above textbook $expected")
  }

  test("the filter table is bounded by ceil(m/64) words and the probe " +
      "joins it broadcast") {
    val bloom = Bloom.build((1L to 500L).toDF("id"), "id", MBits, K)
    assert(bloom.count() <= MBits / 64,
      "filter must pack into ceil(m/64) words")
    val plan = Bloom.mightContain((1L to 10L).toDF("id"), "id", bloom,
      MBits, K).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"probe must broadcast the filter:\n$plan")
  }

  test("empty filter rejects everything (all-definite-negative)") {
    val empty = Bloom.build(Seq.empty[Long].toDF("id"), "id", MBits, K)
    val got = Bloom.mightContain(Seq(1L, 2L).toDF("id"), "id", empty,
      MBits, K).collect().map(_.getBoolean(1))
    assert(got.forall(_ == false))
  }
}
