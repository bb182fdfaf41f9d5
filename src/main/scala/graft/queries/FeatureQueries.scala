package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Profile, Ranks}
import graft.util.Tables._

/** Robust-statistics & feature-engineering surface: MAD outliers,
  * weighted medians, quantile normalization, WOE/IV predictive binning,
  * and leave-one-out target encoding — the feature-prep reductions an
  * ML data platform runs between the warehouse and the trainer. Heavy
  * lifting lives in [[graft.ops.Profile]] / [[graft.ops.Ranks]]; every
  * statistic follows the integer-sums + shared-parenthesization
  * discipline so the DuckDB twin is bit-identical.
  */
object FeatureQueries {

  val all: Seq[Q] = Seq(

    // Robust outliers: Hampel rule |v − med| > 3·1.4826·MAD per event
    // type, both medians exact via banded ranks (no per-group sort).
    Q("q208_mad_outliers",
      Some("""WITH v AS (
             |  SELECT event_type, event_id,
             |    round(value * 100)::BIGINT AS c
             |  FROM events),
             |med AS (
             |  SELECT event_type, quantile_cont(c, 0.5) AS med
             |  FROM v GROUP BY 1),
             |d AS (
             |  SELECT v.event_type, v.c, abs(v.c - med.med) AS dev,
             |    med.med
             |  FROM v JOIN med USING (event_type)),
             |mad AS (
             |  SELECT event_type, quantile_cont(dev, 0.5) AS mad
             |  FROM d GROUP BY 1)
             |SELECT d.event_type, count(*)::BIGINT AS n,
             |  round(any_value(d.med) / 100.0, 6) AS med_r,
             |  round(any_value(mad.mad) / 100.0, 6) AS mad_r,
             |  sum(CASE WHEN dev > 3.0 * 1.4826 * mad.mad
             |    THEN 1 ELSE 0 END)::BIGINT AS n_outliers
             |FROM d JOIN mad USING (event_type)
             |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin),
      (s, d) => Profile.madOutliers(
          events(s, d).select(col("event_type"), col("event_id"),
            round(col("value") * 100).cast("long").as("c")),
          "event_type", "c", "event_id", bandWidth = 200.0)
        .select(col("event_type"), col("n"),
          round(col("med") / 100.0, 6).as("med_r"),
          round(col("mad") / 100.0, 6).as("mad_r"), col("n_outliers"))
        .orderBy("event_type")),

    // Lower weighted median of extended price weighted by quantity per
    // return flag — integer threshold test, no single-task sort.
    Q("q209_weighted_median",
      Some("""WITH v AS (
             |  SELECT l_returnflag AS flag,
             |    round(l_extendedprice * 100)::BIGINT AS c,
             |    l_quantity::BIGINT AS w,
             |    l_orderkey * 8 + l_linenumber AS id
             |  FROM lineitem),
             |r AS (
             |  SELECT flag, c, w,
             |    sum(w) OVER (PARTITION BY flag ORDER BY c, id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS runw,
             |    sum(w) OVER (PARTITION BY flag) AS totw
             |  FROM v)
             |SELECT flag, max(totw)::BIGINT AS total_w,
             |  round(min(CASE WHEN 2 * runw >= totw THEN c END)
             |    / 100.0, 6) AS wmedian_r
             |FROM r GROUP BY flag ORDER BY flag""".stripMargin),
      (s, d) => Ranks.weightedMedian(
          lineitem(s, d).select(col("l_returnflag").as("flag"),
            round(col("l_extendedprice") * 100).cast("long").as("c"),
            col("l_quantity").cast("long").as("w"),
            (col("l_orderkey") * 8 + col("l_linenumber")).as("id")),
          "flag", "c", "w", "id", bandWidth = 1e6)
        .select(col("flag"), col("total_w"),
          round(col("wmedian") / 100.0, 6).as("wmedian_r"))
        .orderBy("flag")),

    // Quantile normalization: per-source deciles of doc length mapped
    // onto the cross-source decile mean — the batch-effect remover
    // (microarray heritage) for harmonizing per-source score scales.
    Q("q210_quantile_normalize",
      Some("""WITH r AS (
             |  SELECT source, n_chars,
             |    ntile(10) OVER (PARTITION BY source
             |      ORDER BY n_chars, doc_id) AS decile
             |  FROM documents),
             |cell AS (
             |  SELECT source, decile::INT AS decile,
             |    count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS s
             |  FROM r GROUP BY 1, 2),
             |allc AS (
             |  SELECT decile, sum(n)::BIGINT AS tn, sum(s)::BIGINT AS ts
             |  FROM cell GROUP BY 1)
             |SELECT source, cell.decile, n,
             |  round(s / n, 6) AS mean_src_r,
             |  round(ts / tn, 6) AS mean_norm_r
             |FROM cell JOIN allc ON cell.decile = allc.decile
             |ORDER BY source, cell.decile""".stripMargin),
      (s, d) => {
        val ranked = Ranks.bandedRank(
          documents(s, d).select(col("source"), col("n_chars"),
            col("doc_id")),
          "source", "n_chars", "doc_id", bandWidth = 200.0)
        val cell = ranked
          .withColumn("decile",
            Ranks.ntileFromRank(col("rnk"), col("grp_n"), 10))
          .groupBy(col("source"), col("decile"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("_s"))
        val allc = cell.groupBy(col("decile"))
          .agg(sum(col("n")).as("_tn"), sum(col("_s")).as("_ts"))
        cell.join(broadcast(allc), Seq("decile"))
          .select(col("source"), col("decile"), col("n"),
            round(col("_s") / col("n"), 6).as("mean_src_r"),
            round(col("_ts") / col("_tn"), 6).as("mean_norm_r"))
          .orderBy("source", "decile")
      }),

    // WOE / information value of spend deciles against conversion —
    // the credit-scoring binning audit (does the feature separate?).
    // Laplace +0.5 smoothing per bin; IV total summed as DECIMAL(18,6)
    // of rounded terms (order-independent).
    Q("q211_woe_iv",
      Some("""WITH u AS (
             |  SELECT user_id,
             |    sum(round(value * 100)::BIGINT) AS spend,
             |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |      AS y
             |  FROM events GROUP BY user_id),
             |b AS (
             |  SELECT user_id, y, ntile(10) OVER (
             |    ORDER BY spend, user_id) AS bin
             |  FROM u),
             |c AS (
             |  SELECT bin::INT AS bin, count(*)::BIGINT AS n_units,
             |    sum(y)::BIGINT AS n_pos,
             |    (count(*) - sum(y))::BIGINT AS n_neg
             |  FROM b GROUP BY 1),
             |g AS (
             |  SELECT sum(n_pos)::BIGINT AS tp, sum(n_neg)::BIGINT AS tn
             |  FROM c),
             |w AS (
             |  SELECT bin, n_units, n_pos,
             |    ln(((n_pos + 0.5) / (tp + 5.0))
             |      / ((n_neg + 0.5) / (tn + 5.0))) AS woe,
             |    ((n_pos + 0.5) / (tp + 5.0) - (n_neg + 0.5) / (tn + 5.0))
             |      * ln(((n_pos + 0.5) / (tp + 5.0))
             |        / ((n_neg + 0.5) / (tn + 5.0))) AS iv_term
             |  FROM c CROSS JOIN g),
             |t AS (
             |  SELECT sum(round(iv_term, 6)::DECIMAL(18,6))::DOUBLE
             |    AS iv_total FROM w)
             |SELECT bin, n_units, n_pos, round(woe, 6) AS woe_r,
             |  round(iv_term, 6) AS iv_term_r,
             |  round(iv_total, 6) AS iv_total_r
             |FROM w CROSS JOIN t ORDER BY bin""".stripMargin),
      (s, d) => {
        val u = events(s, d).groupBy(col("user_id"))
          .agg(sum(round(col("value") * 100).cast("long")).as("spend"),
            max(when(col("event_type") === "purchase", 1L)
              .otherwise(0L)).as("y"))
        val ranked = Ranks.bandedRank(u.withColumn("_g", lit(0)),
          "_g", "spend", "user_id", bandWidth = 50000.0)
        val c = ranked
          .withColumn("bin",
            Ranks.ntileFromRank(col("rnk"), col("grp_n"), 10))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n_units"), sum(col("y")).as("n_pos"),
            (count(lit(1)) - sum(col("y"))).as("n_neg"))
        val g = c.agg(sum(col("n_pos")).as("_tp"),
          sum(col("n_neg")).as("_tn"))
        val pShare = (col("n_pos") + 0.5) / (col("_tp") + 5.0)
        val nShare = (col("n_neg") + 0.5) / (col("_tn") + 5.0)
        val w = c.crossJoin(broadcast(g))
          .withColumn("woe", log(pShare / nShare))
          .withColumn("iv_term", (pShare - nShare) * log(pShare / nShare))
        val t = w.agg(sum(round(col("iv_term"), 6)
          .cast("decimal(18,6)")).cast("double").as("_iv"))
        w.crossJoin(broadcast(t))
          .select(col("bin"), col("n_units"), col("n_pos"),
            round(col("woe"), 6).as("woe_r"),
            round(col("iv_term"), 6).as("iv_term_r"),
            round(col("_iv"), 6).as("iv_total_r"))
          .orderBy("bin")
      }),

    // Leave-one-out target encoding, category-level closed form: with
    // n and Σy per category the only two possible LOO encodings are
    // (Σy−1)/(n−1) for positive rows and Σy/(n−1) for negative rows —
    // reported per category with the global prior fallback, no
    // row-level materialization.
    Q("q212_target_encode_loo",
      Some("""WITH e AS (
             |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us
             |  FROM events),
             |f AS (
             |  SELECT user_id, event_type,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY us, event_id) AS rn
             |  FROM e),
             |cat AS (
             |  SELECT user_id, event_type AS category FROM f WHERE rn = 1),
             |conv AS (
             |  SELECT user_id,
             |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |      AS y
             |  FROM e GROUP BY user_id),
             |u AS (
             |  SELECT category, y FROM cat JOIN conv USING (user_id)),
             |g AS (
             |  SELECT count(*)::BIGINT AS nn, sum(y)::BIGINT AS ss FROM u),
             |c AS (
             |  SELECT category, count(*)::BIGINT AS n_units,
             |    sum(y)::BIGINT AS n_pos
             |  FROM u GROUP BY category)
             |SELECT category, n_units, n_pos,
             |  CASE WHEN n_units > 1 AND n_pos >= 1
             |    THEN round((n_pos - 1) / (n_units - 1), 6) END
             |    AS loo_pos_r,
             |  CASE WHEN n_units > 1
             |    THEN round(n_pos / (n_units - 1), 6) END AS loo_neg_r,
             |  round(ss / nn, 6) AS prior_r
             |FROM c CROSS JOIN g ORDER BY category""".stripMargin),
      (s, d) => {
        val e = events(s, d).select(col("user_id"), col("event_type"),
          col("event_id"), unix_micros(col("ts")).as("_us"))
        val wu = Window.partitionBy("user_id")
          .orderBy(col("_us"), col("event_id"))
        val cat = e.withColumn("_rn", row_number().over(wu))
          .where(col("_rn") === 1)
          .select(col("user_id"), col("event_type").as("category"))
        val conv2 = e.groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("y"))
        val u = cat.join(conv2, Seq("user_id"))
        val g = u.agg(count(lit(1)).as("_nn"), sum(col("y")).as("_ss"))
        u.groupBy(col("category"))
          .agg(count(lit(1)).as("n_units"), sum(col("y")).as("n_pos"))
          .crossJoin(broadcast(g))
          .select(col("category"), col("n_units"), col("n_pos"),
            when(col("n_units") > 1 && col("n_pos") >= 1,
              round((col("n_pos") - 1) / (col("n_units") - 1), 6))
              .as("loo_pos_r"),
            when(col("n_units") > 1,
              round(col("n_pos") / (col("n_units") - 1), 6))
              .as("loo_neg_r"),
            round(col("_ss") / col("_nn"), 6).as("prior_r"))
          .orderBy("category")
      }))
}
