package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Ranks, TimeSeries}
import graft.util.Tables._

/** Round-9 OLAP-surface completion: `grouping_id` disambiguation over
  * CUBE (the "which NULL is a rollup NULL" bitmask q17/q18/q58 left
  * implicit), deterministic mode (smallest-value tiebreak, where SQL
  * `mode()` is engine-arbitrary on ties), `percentile_disc` semantics
  * (q72 covered only `_cont`), and the classical additive seasonal
  * decomposition (trend/seasonal/residual — the model-based upgrade of
  * q221's ratio index).
  */
object CompletionQueries {

  val all: Seq[Q] = Seq(

    // CUBE + grouping_id: the bitmask that tells a rollup NULL from a
    // data NULL (first grouping column = highest bit, the SQL
    // standard both engines implement). Nulls-last ordering pinned.
    Q("q324_grouping_id",
      Some("""SELECT l_returnflag, l_linestatus,
             |  GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid,
             |  count(*)::BIGINT AS n,
             |  sum(l_quantity::BIGINT)::BIGINT AS qty
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY gid, l_returnflag NULLS LAST,
             |  l_linestatus NULLS LAST""".stripMargin),
      (s, d) => lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("qty"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_last,
          col("l_linestatus").asc_nulls_last)),

    // Deterministic mode of the weekday per event type: count-desc
    // with smallest-dow tiebreak — reproducible where bare mode() is
    // tie-arbitrary; share says how modal the mode actually is.
    Q("q325_det_mode",
      Some("""WITH c AS (
             |  SELECT event_type, dayofweek(ts::DATE)::BIGINT AS dow,
             |    count(*)::BIGINT AS n
             |  FROM events GROUP BY 1, 2),
             |t AS (SELECT event_type, sum(n)::BIGINT AS total FROM c
             |      GROUP BY 1),
             |r AS (
             |  SELECT event_type, dow, n,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY n DESC, dow ASC) AS rn
             |  FROM c)
             |SELECT r.event_type, dow AS mode_dow, n AS n_mode,
             |  round(n::DOUBLE / total::DOUBLE, 6) AS share_r
             |FROM r JOIN t USING (event_type) WHERE rn = 1
             |ORDER BY event_type""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val c = events(s, d)
          .groupBy(col("event_type"),
            (dayofweek(to_date(col("ts"))) - 1).cast("long").as("dow"))
          .agg(count(lit(1)).as("n"))
        val t = c.groupBy(col("event_type"))
          .agg(sum(col("n")).as("_total"))
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("n").desc, col("dow").asc)
        c.withColumn("_rn", row_number().over(w))
          .where(col("_rn") === 1)
          .join(broadcast(t), Seq("event_type"))
          .select(col("event_type"), col("dow").as("mode_dow"),
            col("n").as("n_mode"),
            round(col("n").cast("double")
              / col("_total").cast("double"), 6).as("share_r"))
          .orderBy("event_type")
      }),

    // percentile_disc quartiles of l_quantity per return flag: the
    // smallest observed value at cumulative fraction ≥ q (an actual
    // data point, where q72's _cont interpolates) — bandedRank
    // two-level shape, no single-task sort.
    Q("q326_percentile_disc",
      Some("""WITH ranked AS (
             |  SELECT l_returnflag, l_quantity AS v,
             |    row_number() OVER (PARTITION BY l_returnflag
             |      ORDER BY l_quantity) AS rn,
             |    count(*) OVER (PARTITION BY l_returnflag) AS n
             |  FROM lineitem),
             |spec AS (SELECT unnest([1, 2, 3]) AS k)
             |SELECT l_returnflag, n::BIGINT AS n, k / 4.0 AS q,
             |  v AS q_val
             |FROM ranked, spec WHERE rn = (n * k + 3) // 4
             |ORDER BY l_returnflag, q""".stripMargin),
      (s, d) => Ranks.percentileDisc(
          lineitem(s, d).select(col("l_returnflag"), col("l_quantity"),
            (col("l_orderkey") * 8 + col("l_linenumber")).as("_id")),
          "l_returnflag", "l_quantity", "_id", bandWidth = 4.0,
          nums = Seq(1, 2, 3), den = 4)
        .orderBy("l_returnflag", "q")),

    // Classical additive decomposition of daily revenue: centered
    // 7-day MA trend on the zero-filled spine, per-weekday seasonal
    // effect (normalized), and the residual sd the model leaves.
    Q("q327_seasonal_decomposition",
      Some("""WITH grain AS (
             |  SELECT o_orderdate::DATE AS day,
             |    sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
             |      AS y
             |  FROM orders GROUP BY 1),
             |bounds AS (SELECT min(day) AS d0, max(day) AS d1
             |           FROM grain),
             |spine AS (
             |  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))
             |    ::DATE AS day FROM bounds),
             |f AS (
             |  SELECT s.day, coalesce(g.y, 0)::BIGINT AS y
             |  FROM spine s LEFT JOIN grain g USING (day)),
             |ma AS (
             |  SELECT day, y, sum(y) OVER w AS s7, count(*) OVER w
             |    AS c7
             |  FROM f WINDOW w AS (ORDER BY day
             |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
             |det AS (
             |  SELECT day, y::DOUBLE - s7::DOUBLE / 7 AS det
             |  FROM ma WHERE c7 = 7),
             |seas AS (
             |  SELECT dayofweek(day)::BIGINT AS dow,
             |    count(*)::BIGINT AS n_days,
             |    sum(round(det, 12)::DECIMAL(28,12))::DOUBLE
             |      / count(*) AS sraw
             |  FROM det GROUP BY 1),
             |m AS (SELECT sum(round(sraw, 12)::DECIMAL(28,12))::DOUBLE
             |      / count(*) AS sm FROM seas),
             |sn AS (SELECT dow, n_days, sraw,
             |       sraw - (SELECT sm FROM m) AS snorm FROM seas),
             |resid AS (
             |  SELECT d.det - sn.snorm AS r
             |  FROM det d JOIN sn ON sn.dow = dayofweek(d.day)::BIGINT),
             |rs AS (
             |  SELECT CASE WHEN count(*) > 0 THEN
             |    sqrt(sum(round(r * r, 6)::DECIMAL(38,6))::DOUBLE
             |      / count(*)::DOUBLE) END AS rsd
             |  FROM resid)
             |SELECT dow, n_days, round(sraw, 6) AS seasonal_raw_r,
             |  round(snorm, 6) AS seasonal_r,
             |  round((SELECT rsd FROM rs), 6) AS resid_sd_r
             |FROM sn ORDER BY dow""".stripMargin),
      (s, d) => TimeSeries.classicalDecomposition(
          orders(s, d)
            .groupBy(to_date(col("o_orderdate")).as("day"))
            .agg(sum(round(col("o_totalprice") * 100).cast("long"))
              .as("y")),
          "day", "y")
        .orderBy("dow")))
}
