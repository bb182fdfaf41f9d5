package graft.expr

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen

import graft.SparkTestBase
import graft.expr.Iso8601.iso8601_seconds

/** O20 (/root/reference/fetch_youtube_data.py:184-186): the reference's
  * isodate.parse_duration().total_seconds() semantics, totalized — the
  * §5.1 edge cases pinned exactly. */
class Iso8601Spec extends SparkTestBase {

  test("reference examples parse like isodate") {
    assert(Iso8601.parseSeconds("PT1H2M10S") == 3730.0)
    assert(Iso8601.parseSeconds("PT15S") == 15.0)
    assert(Iso8601.parseSeconds("P1DT2H") == 93600.0)
    assert(Iso8601.parseSeconds("PT0S") == 0.0)
    assert(Iso8601.parseSeconds("P2W") == 1209600.0)
    assert(Iso8601.parseSeconds("PT1.5S") == 1.5)
    assert(Iso8601.parseSeconds("-PT30S") == -30.0)
  }

  test("null / garbage / calendar components coerce to null (totality)") {
    assert(Iso8601.parseSeconds(null: String) == null)
    assert(Iso8601.parseSeconds("garbage") == null)
    assert(Iso8601.parseSeconds("") == null)
    assert(Iso8601.parseSeconds("P") == null)   // no components
    assert(Iso8601.parseSeconds("P1Y") == null) // calendar-dependent
    assert(Iso8601.parseSeconds("P1M") == null) // month != minute
    assert(Iso8601.parseSeconds("1H2M") == null)
  }

  test("property: composed H/M/S round-trips to arithmetic total") {
    val gen = for {
      h <- Gen.choose(0, 1000); m <- Gen.choose(0, 59); s <- Gen.choose(0, 59)
    } yield (h, m, s)
    (1 to 300).foreach { _ =>
      gen.sample.foreach { case (h, m, s) =>
        assert(Iso8601.parseSeconds(s"PT${h}H${m}M${s}S") ==
          h * 3600.0 + m * 60.0 + s)
      }
    }
  }

  test("expression evaluates in a DataFrame (codegen path) and via SQL") {
    import spark.implicits._
    val df = Seq("PT1H2M10S", "PT15S", "bogus", null)
      .toDF("dur")
      .select(iso8601_seconds(col("dur")).as("sec"))
    assert(df.collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
      .toSeq == Seq(3730.0, 15.0, null, null))

    Iso8601.register(spark)
    val viaSql = spark.sql("SELECT iso8601_seconds('P1DT2H') AS s").head.getDouble(0)
    assert(viaSql == 93600.0)
  }
}
