package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Sequence
import graft.util.Tables._

/** Round-12 sequence-analysis batch: matrix-profile motif discovery,
  * SAX symbolic distance, lag-1 transfer entropy, the Hoeffding/ADWIN
  * split test, and the Box–Cox transform grid — all on the
  * calendar-bounded day grain, so a 100× corpus changes only the one
  * day-grain hash agg each query starts from.
  */
object SequenceQueries {

  private val MotifW = 7
  private val MotifK = 3
  private val SaxSegLen = 7
  private val HoeffDelta = 0.05
  private val HoeffK = 3

  /** Daily revenue cents on the day index — the shared series. */
  private val gSql =
    """WITH daily AS MATERIALIZED (
      |  SELECT o_orderdate AS day,
      |    sum(round(o_totalprice * 100))::BIGINT AS y
      |  FROM orders GROUP BY 1),
      |mn AS (SELECT min(day) AS d0 FROM daily),
      |g AS MATERIALIZED (
      |  SELECT datediff('day', d0, day)::BIGINT AS t, y
      |  FROM daily, mn)""".stripMargin

  private def dailyIdx(s: SparkSession, dir: String): DataFrame = {
    val daily = orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
    val d0 = daily.agg(min(col("day")).as("_d0"))
    daily.crossJoin(broadcast(d0))
      .select(datediff(col("day"), col("_d0")).cast("long").as("t"),
        col("y"))
  }

  /** Daily per-type event counts on the shared day index. */
  private def typeCounts(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .select(to_date(col("ts")).as("day"), col("event_type"))
    val d0 = ev.agg(min(col("day")).as("_d0"))
    ev.crossJoin(broadcast(d0))
      .groupBy(datediff(col("day"), col("_d0")).cast("long").as("t"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("cx"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("cy"))
  }

  private val typeCountsSql =
    """WITH mn AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
      |cnt AS MATERIALIZED (
      |  SELECT datediff('day', d0, CAST(ts AS DATE))::BIGINT AS t,
      |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      ::BIGINT AS cx,
      |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      ::BIGINT AS cy
      |  FROM events, mn GROUP BY 1)""".stripMargin

  /** The 8-cell lag-1 transfer-entropy computation in SQL over the
    * binarized frame bin(t, bx, by): direction a→b reads source
    * column `sx` and target column `sy`. */
  private def teSql(label: String, sx: String, sy: String): String =
    s"""cur_$label AS (SELECT b1.t, b1.$sx AS x, b1.$sy AS y,
       |    b2.$sy AS yn
       |  FROM bin b1 JOIN bin b2 ON b2.t = b1.t + 1),
       |cell_$label AS MATERIALIZED (
       |  SELECT x, y, yn, count(*)::BIGINT AS c
       |  FROM cur_$label GROUP BY 1, 2, 3),
       |te_$label AS (
       |  SELECT '$label' AS direction,
       |    (SELECT sum(c) FROM cell_$label)::BIGINT AS n_transitions,
       |    round(sum(round(
       |      c::DOUBLE / nn::DOUBLE
       |        * ln(c::DOUBLE * cyv::DOUBLE
       |          / (cxy::DOUBLE * cyy::DOUBLE)), 12)
       |      ::DECIMAL(28,12))::DOUBLE, 6) AS te_r
       |  FROM (
       |    SELECT c.*, m1.cxy, m2.cyy, m3.cyv,
       |      (SELECT sum(c) FROM cell_$label)::BIGINT AS nn
       |    FROM cell_$label c
       |    JOIN (SELECT x, y, sum(c)::BIGINT AS cxy FROM cell_$label
       |          GROUP BY 1, 2) m1 USING (x, y)
       |    JOIN (SELECT y, yn, sum(c)::BIGINT AS cyy FROM cell_$label
       |          GROUP BY 1, 2) m2 USING (y, yn)
       |    JOIN (SELECT y, sum(c)::BIGINT AS cyv FROM cell_$label
       |          GROUP BY 1) m3 USING (y)) tt)""".stripMargin

  val all: Seq[Q] = Seq(

    // Matrix-profile motif: the closest pair of non-overlapping
    // z-normalized 7-day revenue windows — "which two weeks looked
    // most alike". Quadratic in DAYS (calendar-bounded), never rows.
    Q("q448_motif_pair",
      Some(s"""$gSql,
              |rws AS (SELECT t - j AS start, j, y
              |  FROM g, (SELECT unnest(generate_series(0,
              |    ${MotifW - 1}))::BIGINT AS j) sp),
              |ws AS (SELECT start, count(*)::BIGINT AS cnt,
              |  sum(y::HUGEINT)::DOUBLE AS s,
              |  sum(y::HUGEINT * y)::DOUBLE AS s2
              |  FROM rws GROUP BY 1),
              |wok AS (SELECT start, s / $MotifW.0 AS m,
              |  sqrt((s2 - s * s / $MotifW.0) / $MotifW.0) AS sd
              |  FROM ws WHERE cnt = $MotifW
              |    AND (s2 - s * s / $MotifW.0) / $MotifW.0 > 0),
              |zp AS MATERIALIZED (
              |  SELECT r.start,
              |    max(CASE WHEN r.j = 0 THEN (r.y::DOUBLE - w.m) / w.sd END)
              |      AS z1,
              |    max(CASE WHEN r.j = 1 THEN (r.y::DOUBLE - w.m) / w.sd END)
              |      AS z2,
              |    max(CASE WHEN r.j = 2 THEN (r.y::DOUBLE - w.m) / w.sd END)
              |      AS z3,
              |    max(CASE WHEN r.j = 3 THEN (r.y::DOUBLE - w.m) / w.sd END)
              |      AS z4,
              |    max(CASE WHEN r.j = 4 THEN (r.y::DOUBLE - w.m) / w.sd END)
              |      AS z5,
              |    max(CASE WHEN r.j = 5 THEN (r.y::DOUBLE - w.m) / w.sd END)
              |      AS z6,
              |    max(CASE WHEN r.j = 6 THEN (r.y::DOUBLE - w.m) / w.sd END)
              |      AS z7
              |  FROM rws r JOIN wok w USING (start) GROUP BY 1),
              |p AS (SELECT a.start AS t1, b.start AS t2,
              |    (a.z1 - b.z1) * (a.z1 - b.z1)
              |    + (a.z2 - b.z2) * (a.z2 - b.z2)
              |    + (a.z3 - b.z3) * (a.z3 - b.z3)
              |    + (a.z4 - b.z4) * (a.z4 - b.z4)
              |    + (a.z5 - b.z5) * (a.z5 - b.z5)
              |    + (a.z6 - b.z6) * (a.z6 - b.z6)
              |    + (a.z7 - b.z7) * (a.z7 - b.z7) AS d2
              |  FROM zp a JOIN zp b ON b.start >= a.start + $MotifW)
              |SELECT * FROM (
              |  SELECT t1, t2, round(sqrt(d2), 6) AS dist_r
              |  FROM p ORDER BY d2, t1, t2 LIMIT $MotifK) x
              |ORDER BY dist_r, t1, t2""".stripMargin),
      (s, d) => Sequence.motifTopK(dailyIdx(s, d), "t", "y", MotifW,
        MotifK)),

    // SAX distance between the click and purchase daily-count series:
    // PAA 7-day segments, 4-symbol Gaussian alphabet, MINDIST symbol
    // gaps — the cheap "do these two streams share a shape" readout.
    Q("q449_sax_distance",
      Some(s"""$typeCountsSql,
              |sega AS (SELECT (t // $SaxSegLen)::BIGINT AS seg,
              |  count(*)::BIGINT AS cnt, sum(cx::HUGEINT)::DOUBLE AS s
              |  FROM cnt GROUP BY 1),
              |woka AS (SELECT seg, s / $SaxSegLen.0 AS paa FROM sega
              |  WHERE cnt = $SaxSegLen),
              |ma AS (SELECT count(*)::DOUBLE AS n,
              |  sum(round(paa, 12)::DECIMAL(28,12))::DOUBLE AS p1,
              |  sum(round(paa * paa, 12)::DECIMAL(28,12))::DOUBLE AS p2
              |  FROM woka),
              |syma AS (SELECT seg, CASE WHEN z < -0.6745 THEN 0
              |    WHEN z < 0.0 THEN 1 WHEN z < 0.6745 THEN 2 ELSE 3
              |    END AS sa
              |  FROM (SELECT seg, (paa - p1 / n)
              |      / nullif(sqrt((p2 - p1 * p1 / n) / n), 0.0) AS z
              |    FROM woka, ma) tz),
              |segb AS (SELECT (t // $SaxSegLen)::BIGINT AS seg,
              |  count(*)::BIGINT AS cnt, sum(cy::HUGEINT)::DOUBLE AS s
              |  FROM cnt GROUP BY 1),
              |wokb AS (SELECT seg, s / $SaxSegLen.0 AS paa FROM segb
              |  WHERE cnt = $SaxSegLen),
              |mb AS (SELECT count(*)::DOUBLE AS n,
              |  sum(round(paa, 12)::DECIMAL(28,12))::DOUBLE AS p1,
              |  sum(round(paa * paa, 12)::DECIMAL(28,12))::DOUBLE AS p2
              |  FROM wokb),
              |symb AS (SELECT seg, CASE WHEN z < -0.6745 THEN 0
              |    WHEN z < 0.0 THEN 1 WHEN z < 0.6745 THEN 2 ELSE 3
              |    END AS sb
              |  FROM (SELECT seg, (paa - p1 / n)
              |      / nullif(sqrt((p2 - p1 * p1 / n) / n), 0.0) AS z
              |    FROM wokb, mb) tz)
              |SELECT count(*)::BIGINT AS n_segments,
              |  sum(CASE WHEN sa = sb THEN 1 ELSE 0 END)::BIGINT
              |    AS n_match,
              |  round(sum(CASE WHEN sa = sb THEN 1 ELSE 0 END)::DOUBLE
              |    / count(*)::DOUBLE, 6) AS match_rate_r,
              |  round(sqrt($SaxSegLen.0 * sum(round(
              |    (CASE WHEN abs(sa - sb) <= 1 THEN 0.0
              |      WHEN abs(sa - sb) = 2 THEN 0.6745
              |      ELSE 1.349 END)
              |    * (CASE WHEN abs(sa - sb) <= 1 THEN 0.0
              |      WHEN abs(sa - sb) = 2 THEN 0.6745
              |      ELSE 1.349 END), 12)::DECIMAL(28,12))::DOUBLE), 6)
              |    AS sax_dist_r
              |FROM syma JOIN symb USING (seg)""".stripMargin),
      (s, d) => {
        val cnt = typeCounts(s, d)
        Sequence.saxDistance(cnt.select(col("t"), col("cx").as("y")),
          cnt.select(col("t"), col("cy").as("y")), "t", "y", SaxSegLen)
      }),

    // Lag-1 transfer entropy between mean-binarized click and
    // purchase activity, both directions: does today's click level
    // carry information about tomorrow's purchase level beyond
    // purchase's own history (and vice versa)?
    Q("q450_transfer_entropy",
      Some(s"""$typeCountsSql,
              |m AS (SELECT count(*)::DOUBLE AS n,
              |  sum(cx::HUGEINT)::DOUBLE AS sx,
              |  sum(cy::HUGEINT)::DOUBLE AS sy FROM cnt),
              |bin AS MATERIALIZED (
              |  SELECT t,
              |    CASE WHEN cx::DOUBLE >= sx / n THEN 1 ELSE 0 END
              |      AS bx,
              |    CASE WHEN cy::DOUBLE >= sy / n THEN 1 ELSE 0 END
              |      AS by
              |  FROM cnt, m),
              |${teSql("click_to_purchase", "bx", "by")},
              |${teSql("purchase_to_click", "by", "bx")}
              |SELECT * FROM (SELECT * FROM te_click_to_purchase
              |  UNION ALL SELECT * FROM te_purchase_to_click)
              |ORDER BY direction""".stripMargin),
      (s, d) => {
        val cnt = typeCounts(s, d)
        val m = cnt.agg(count(lit(1)).cast("double").as("_n"),
          sum(col("cx")).cast("double").as("_sx"),
          sum(col("cy")).cast("double").as("_sy"))
        val bin = cnt.crossJoin(broadcast(m)).select(col("t"),
          when(col("cx").cast("double") >= col("_sx") / col("_n"),
            lit(1)).otherwise(lit(0)).as("bx"),
          when(col("cy").cast("double") >= col("_sy") / col("_n"),
            lit(1)).otherwise(lit(0)).as("by"))
          .localCheckpoint()
        val xy = Sequence.transferEntropy(
            bin.select(col("t"), col("bx")),
            bin.select(col("t"), col("by")), "t", "bx", "by")
          .select(lit("click_to_purchase").as("direction"),
            col("n_transitions"), col("te_r"))
        val yx = Sequence.transferEntropy(
            bin.select(col("t"), col("by")),
            bin.select(col("t"), col("bx")), "t", "by", "bx")
          .select(lit("purchase_to_click").as("direction"),
            col("n_transitions"), col("te_r"))
        xy.unionByName(yx).orderBy("direction")
      }),

    // Hoeffding-bound split scan (the ADWIN cut test) on daily
    // revenue: the top-3 splits whose mean gap exceeds what the
    // bound allows at delta = 0.05 — distribution drift with a
    // finite-sample guarantee, not an eyeballed threshold.
    Q("q451_hoeffding_split",
      Some(s"""$gSql,
              |b AS (SELECT t, y,
              |  row_number() OVER (ORDER BY t) AS i,
              |  sum(y::HUGEINT) OVER (ORDER BY t
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |    AS c
              |  FROM g),
              |tot AS (SELECT max(i)::BIGINT AS n,
              |  max_by(c, i) AS sy, min(y)::BIGINT AS ymin,
              |  max(y)::BIGINT AS ymax FROM b),
              |d AS (SELECT t, i,
              |  c::DOUBLE / i / 1e5 AS m0,
              |  (sy::DOUBLE - c::DOUBLE) / (n::DOUBLE - i) / 1e5 AS m1,
              |  (ymax::DOUBLE - ymin::DOUBLE) / 1e5
              |    * sqrt((1.0 / (2.0 * i) + 1.0
              |      / (2.0 * (n::DOUBLE - i)))
              |      * ln(4.0 * n::DOUBLE / $HoeffDelta)) AS eps
              |  FROM b, tot WHERE i < n)
              |SELECT * FROM (
              |  SELECT t, i::BIGINT AS n_left, round(m0, 6)
              |      AS mean_left_r,
              |    round(m1, 6) AS mean_right_r, round(eps, 6) AS eps_r,
              |    round(abs(m0 - m1) - eps, 6) AS excess_r
              |  FROM d ORDER BY abs(m0 - m1) - eps DESC, t
              |  LIMIT $HoeffK) x
              |ORDER BY excess_r DESC, t""".stripMargin),
      (s, d) => Sequence.hoeffdingSplit(dailyIdx(s, d), "t", "y",
        HoeffDelta, HoeffK)),

    // Box-Cox transform grid on order totals (1e7-cent units): which
    // power transform makes the spend distribution most Gaussian —
    // the feature-engineering readout before any z-score monitor.
    Q("q452_boxcox_grid",
      Some("""WITH g AS (
             |  SELECT round(o_totalprice * 100) / 1e7 AS yv
             |  FROM orders WHERE round(o_totalprice * 100) / 1e7 > 0),
             |a AS (SELECT count(*)::DOUBLE AS n,
             |  sum(round(ln(yv), 12)::DECIMAL(28,12))::DOUBLE AS slny,
             |  sum(round((1.0 / sqrt(yv) - 1.0) / (-0.5), 12)
             |    ::DECIMAL(28,12))::DOUBLE AS sa,
             |  sum(round(((1.0 / sqrt(yv) - 1.0) / (-0.5))
             |    * ((1.0 / sqrt(yv) - 1.0) / (-0.5)), 12)
             |    ::DECIMAL(28,12))::DOUBLE AS qa,
             |  sum(round(ln(yv), 12)::DECIMAL(28,12))::DOUBLE AS sb,
             |  sum(round(ln(yv) * ln(yv), 12)::DECIMAL(28,12))::DOUBLE
             |    AS qb,
             |  sum(round((sqrt(yv) - 1.0) / 0.5, 12)
             |    ::DECIMAL(28,12))::DOUBLE AS sc,
             |  sum(round(((sqrt(yv) - 1.0) / 0.5)
             |    * ((sqrt(yv) - 1.0) / 0.5), 12)::DECIMAL(28,12))
             |    ::DOUBLE AS qc,
             |  sum(round(yv - 1.0, 12)::DECIMAL(28,12))::DOUBLE AS sd,
             |  sum(round((yv - 1.0) * (yv - 1.0), 12)
             |    ::DECIMAL(28,12))::DOUBLE AS qd,
             |  sum(round((yv * yv - 1.0) / 2.0, 12)
             |    ::DECIMAL(28,12))::DOUBLE AS se,
             |  sum(round(((yv * yv - 1.0) / 2.0)
             |    * ((yv * yv - 1.0) / 2.0), 12)::DECIMAL(28,12))
             |    ::DOUBLE AS qe
             |  FROM g),
             |l(lambda, tag) AS (VALUES (-0.5::DOUBLE, 'a'),
             |  (0.0::DOUBLE, 'b'), (0.5::DOUBLE, 'c'),
             |  (1.0::DOUBLE, 'd'), (2.0::DOUBLE, 'e'))
             |SELECT lambda,
             |  round(-0.5 * n * ln(greatest(
             |    ((CASE tag WHEN 'a' THEN qa WHEN 'b' THEN qb
             |       WHEN 'c' THEN qc WHEN 'd' THEN qd ELSE qe END)
             |     - (CASE tag WHEN 'a' THEN sa WHEN 'b' THEN sb
             |        WHEN 'c' THEN sc WHEN 'd' THEN sd ELSE se END)
             |       * (CASE tag WHEN 'a' THEN sa WHEN 'b' THEN sb
             |          WHEN 'c' THEN sc WHEN 'd' THEN sd ELSE se END)
             |       / n) / n, 1e-12))
             |    + (lambda - 1.0) * slny, 6) AS ll_r
             |FROM l, a
             |ORDER BY lambda""".stripMargin),
      (s, d) => Sequence.boxCoxGrid(
        orders(s, d).select((round(col("o_totalprice") * 100)
          / lit(1e7)).as("yv")), "yv")))
}
