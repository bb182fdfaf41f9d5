package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Fit, Nonparam, Profile, Queueing}
import graft.util.Tables._

/** Round-12 capacity/privacy/fit batch: the Erlang-C staffing table
  * and newsvendor stock level from measured demand, the l-diversity
  * audit next to q265's k-anonymity ladder, exact two-sample energy
  * distance, and a zero-inflated Poisson EM fit of the purchase
  * panel.
  */
object CapacityQueries {

  private val Aht = 180
  private val MaxC = 24
  private val ZipIters = 10

  val all: Seq[Q] = Seq(

    // Erlang-C staffing: P(wait), ASA and occupancy per server count
    // for the measured purchase arrival rate at AHT = 180 s.
    Q("q487_erlang_c",
      Some(s"""WITH rates AS (SELECT count(*)::BIGINT AS n,
              |  count(DISTINCT epoch_us(ts) // 3600000000)::BIGINT
              |    AS hours
              |  FROM events WHERE event_type = 'purchase'),
              |par AS (SELECT round(n::DOUBLE * $Aht
              |  / (3600.0 * hours::DOUBLE), 12) AS a FROM rates),
              |par2 AS (SELECT a, round(ln(a), 12) AS lna FROM par),
              |lf(k, lf) AS (VALUES
              |    ${Queueing.lnFactSql(MaxC)}),
              |cgrid(c) AS (VALUES ${(1 to MaxC)
                .map(c => s"($c)").mkString(", ")}),
              |terms AS (SELECT c, a, lna,
              |  sum(round(exp(round(k * lna - lf, 12)), 12)
              |    ::DECIMAL(28,12))::DOUBLE AS s
              |  FROM cgrid, lf, par2 WHERE k < c GROUP BY 1, 2, 3),
              |f AS (SELECT c, a, s,
              |  exp(round(c * lna - lfc.lf, 12)) * c::DOUBLE
              |    / (c::DOUBLE - a) AS b
              |  FROM terms JOIN lf lfc ON lfc.k = c
              |  WHERE c::DOUBLE > a)
              |SELECT c, round(a, 6) AS a_r,
              |  round(round(b / (b + s), 12), 6) AS p_wait_r,
              |  round(round(b / (b + s), 12) * $Aht
              |    / (c::DOUBLE - a), 6) AS asa_s_r,
              |  round(a / c::DOUBLE, 6) AS occupancy_r
              |FROM f ORDER BY c""".stripMargin),
      (s, d) => Queueing.erlangC(events(s, d), "ts",
        col("event_type") === "purchase", Aht, MaxC)),

    // Newsvendor: the 5/7-fractile stock level of daily purchase
    // demand (underage 5 vs overage 2) + realized mean cost.
    Q("q488_newsvendor",
      Some("""WITH daily AS (SELECT ts::DATE AS day,
             |    count(*)::BIGINT AS x
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |per AS (SELECT x, count(*)::BIGINT AS m FROM daily
             |  GROUP BY 1),
             |cum AS (SELECT x, sum(m) OVER (ORDER BY x)::BIGINT AS r
             |  FROM per),
             |tot AS (SELECT sum(m)::BIGINT AS n_days FROM per),
             |q AS (SELECT min(x) AS q_star,
             |  any_value(n_days) AS n_days
             |  FROM cum, tot WHERE 7 * r >= 5 * n_days)
             |SELECT n_days, q_star,
             |  round(5.0 / 7, 6) AS crit_fractile_r,
             |  round(sum(round(2.0 * greatest(q_star - x, 0)
             |    + 5.0 * greatest(x - q_star, 0), 12)
             |    ::DECIMAL(28,12))::DOUBLE / n_days::DOUBLE, 6)
             |    AS mean_cost_r
             |FROM daily, q GROUP BY 1, 2""".stripMargin),
      (s, d) => Queueing.newsvendor(events(s, d), "ts",
        col("event_type") === "purchase", 5L, 2L)),

    // l-diversity of order priority over (nation, segment) QI groups
    // — the sensitive-attribute audit next to q265's k-anonymity.
    Q("q489_l_diversity",
      Some("""WITH j AS (SELECT c_nationkey AS qa, c_mktsegment AS qb,
             |    o_orderpriority AS sv
             |  FROM orders JOIN customer ON o_custkey = c_custkey),
             |cells AS (SELECT qa, qb, sv, count(*)::BIGINT AS c
             |  FROM j GROUP BY 1, 2, 3),
             |tot AS (SELECT qa, qb, sum(c)::BIGINT AS n FROM cells
             |  GROUP BY 1, 2),
             |pg AS (SELECT qa, qb, count(*)::BIGINT AS l,
             |  exp(round(sum(round(-(c::DOUBLE / n::DOUBLE)
             |    * ln(c::DOUBLE / n::DOUBLE), 12)
             |    ::DECIMAL(28,12))::DOUBLE, 12)) AS el
             |  FROM cells JOIN tot USING (qa, qb) GROUP BY 1, 2)
             |SELECT count(*)::BIGINT AS n_groups,
             |  min(l)::BIGINT AS min_distinct_l,
             |  round(min(round(el, 12)), 6) AS min_entropy_l_r,
             |  round(sum(CASE WHEN l >= 3 THEN 1 ELSE 0 END)::DOUBLE
             |    / count(*)::DOUBLE, 6) AS frac_ge3_r
             |FROM pg""".stripMargin),
      (s, d) => Profile.lDiversity(
        orders(s, d).join(customer(s, d),
          col("o_custkey") === col("c_custkey")),
        Seq("c_nationkey", "c_mktsegment"), "o_orderpriority")),

    // Exact two-sample energy distance between view and purchase
    // value distributions (cents grid, no pair join).
    Q("q490_energy_distance",
      Some("""WITH src AS (SELECT event_type AS g,
             |    CAST(round(value * 100) AS BIGINT) AS v FROM events
             |  WHERE event_type IN ('view', 'purchase')),
             |per AS (SELECT v,
             |  sum(CASE WHEN g = 'view' THEN 1 ELSE 0 END)::BIGINT
             |    AS na,
             |  sum(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END)
             |    ::BIGINT AS nb
             |  FROM src GROUP BY 1),
             |pp AS (SELECT v, na, nb, na * v AS sa, nb * v AS sb
             |  FROM per),
             |c AS (SELECT v, na, nb,
             |  coalesce(sum(na) OVER w, 0)::BIGINT AS cna,
             |  coalesce(sum(nb) OVER w, 0)::BIGINT AS cnb,
             |  coalesce(sum(sa) OVER w, 0)::BIGINT AS csa,
             |  coalesce(sum(sb) OVER w, 0)::BIGINT AS csb
             |  FROM pp WINDOW w AS (ORDER BY v
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
             |a AS (SELECT sum(na)::BIGINT AS n_a,
             |  sum(nb)::BIGINT AS n_b,
             |  sum(na * (v * cnb - csb)
             |    + nb * (v * cna - csa))::BIGINT AS dxy,
             |  sum(na * (v * cna - csa))::BIGINT AS dxx2,
             |  sum(nb * (v * cnb - csb))::BIGINT AS dyy2 FROM c)
             |SELECT n_a, n_b,
             |  round(dxy::DOUBLE / (n_a::DOUBLE * n_b::DOUBLE), 6)
             |    AS exy_r,
             |  round(2.0 * dxx2::DOUBLE / (n_a::DOUBLE * n_a::DOUBLE),
             |    6) AS exx_r,
             |  round(2.0 * dyy2::DOUBLE / (n_b::DOUBLE * n_b::DOUBLE),
             |    6) AS eyy_r,
             |  round(2.0 * (dxy::DOUBLE / (n_a::DOUBLE * n_b::DOUBLE))
             |    - 2.0 * dxx2::DOUBLE / (n_a::DOUBLE * n_a::DOUBLE)
             |    - 2.0 * dyy2::DOUBLE / (n_b::DOUBLE * n_b::DOUBLE),
             |    6) AS energy_r
             |FROM a""".stripMargin),
      (s, d) => Nonparam.energyDistance(
        events(s, d).select(col("event_type").as("g"),
          round(col("value") * 100).cast("bigint").as("v")),
        "v", "g", "view", "purchase", 1024.0)),

    // Zero-inflated Poisson EM on the (user × day) purchase panel:
    // structural-zero share π vs active rate λ.
    Q("q491_zip_em",
      Some(s"""WITH days AS (SELECT unnest(generate_series(
              |    min(ts::DATE), max(ts::DATE), INTERVAL 1 DAY))
              |    ::DATE AS day FROM events),
              |users AS (SELECT DISTINCT user_id FROM events),
              |pc AS (SELECT user_id, ts::DATE AS day,
              |  count(*)::BIGINT AS y FROM events
              |  WHERE event_type = 'purchase' GROUP BY 1, 2),
              |panel AS (SELECT coalesce(pc.y, 0)::BIGINT AS y
              |  FROM users u CROSS JOIN days d
              |  LEFT JOIN pc ON pc.user_id = u.user_id
              |    AND pc.day = d.day),
              |base AS (SELECT count(*)::BIGINT AS n,
              |  sum(CASE WHEN y = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
              |  sum(y)::BIGINT AS s FROM panel),
              |e0 AS (SELECT n, n0, s, round(0.25, 12) AS pi,
              |  round(s::DOUBLE / n::DOUBLE / 0.75, 12) AS lam
              |  FROM base),
              |${(1 to ZipIters).map(zipStepSql).mkString(",\n")}
              |SELECT n, n0, s, round(pi, 6) AS pi_r,
              |  round(lam, 6) AS lambda_r
              |FROM e$ZipIters""".stripMargin),
      (s, d) => {
        val ev = events(s, d)
        val days = ev.agg(min(to_date(col("ts"))).as("_d0"),
            max(to_date(col("ts"))).as("_d1"))
          .select(explode(sequence(col("_d0"), col("_d1")))
            .as("_day"))
        val users = ev.select(col("user_id")).distinct()
        val pc = ev.where(col("event_type") === "purchase")
          .groupBy(col("user_id"), to_date(col("ts")).as("_day"))
          .agg(count(lit(1)).as("_y"))
        val panel = users.crossJoin(broadcast(days))
          .join(pc, Seq("user_id", "_day"), "left")
          .select(coalesce(col("_y"), lit(0L)).as("y"))
        Fit.zipEm(panel, "y", ZipIters)
      }))

  /** One EM step as a CTE layer (mirrors Fit.zipEm's loop body). */
  private def zipStepSql(k: Int): String =
    s"""e$k AS (SELECT n, n0, s,
       |  round(n0::DOUBLE * z0 / n::DOUBLE, 12) AS pi,
       |  round(s::DOUBLE / (n::DOUBLE - n0::DOUBLE * z0), 12) AS lam
       |  FROM (SELECT n, n0, s,
       |    round(pi / (pi + (1.0 - pi) * exp(-lam)), 12) AS z0
       |    FROM e${k - 1}))""".stripMargin
}
