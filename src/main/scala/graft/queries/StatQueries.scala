package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Ranks, TextOps}
import graft.util.Tables._

/** Corpus-statistics surface: distributed exact ranking and the
  * rank-derived corpus diagnostics of a training-data pipeline —
  * CCNet-style perplexity bucketing, Zipf rank-frequency fit,
  * chi-square term-class association, and event burstiness profiling.
  * Ranking ops live in [[graft.ops.Ranks]].
  */
object StatQueries {

  private val normSql = TextQueries.normSql

  // q165: CCNet buckets head/middle/tail = terciles of LM surprisal
  private val PerplexityTiles = 3

  // q166: fit the Zipf slope on each source's top-200 terms (the
  // rank-frequency law only holds in the head; the tail is noise)
  private val ZipfTopN = 200

  // q167: the 5 most lang-discriminative terms per lang
  private val Chi2TopK = 5

  val all: Seq[Q] = Seq(

    // Distributed exact per-group rank — row_number() semantics WITHOUT a
    // per-group single-task window (Ranks.bandedRank: two-level prefix
    // sum over 100-char length bands; the oracle is the naive window).
    Q("q164_banded_rank",
      Some("""SELECT doc_id, lang, n_chars,
             |  (row_number() OVER (PARTITION BY lang
             |     ORDER BY n_chars, doc_id) - 1)::BIGINT AS rnk
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => Ranks.bandedRank(
          documents(s, d).select("doc_id", "lang", "n_chars"),
          "lang", "n_chars", "doc_id", bandWidth = 100.0)
        .select("doc_id", "lang", "n_chars", "rnk")
        .orderBy("doc_id")),

    // CCNet-style perplexity bucketing: per-lang surprisal terciles
    // (head/middle/tail) → the (lang, bucket) mixture report. Buckets
    // come from Ranks.ntileFromRank over the banded exact rank, not a
    // per-lang window; ntile(3) in the oracle is the semantics contract.
    Q("q165_perplexity_buckets",
      Some(s"""WITH toks AS (
              |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS term
              |  FROM documents),
              |cf AS (SELECT term, count(*) AS cf FROM toks GROUP BY term),
              |nt AS (SELECT count(*) AS n_total FROM toks),
              |sur AS (
              |  SELECT doc_id, round(avg(-ln(cf::DOUBLE / n_total)), 9)
              |    AS avg_surprisal
              |  FROM toks JOIN cf USING (term) CROSS JOIN nt
              |  GROUP BY doc_id),
              |b AS (
              |  SELECT d.lang, avg_surprisal,
              |    ntile($PerplexityTiles) OVER (PARTITION BY d.lang
              |      ORDER BY avg_surprisal, s.doc_id)::INT AS bucket
              |  FROM sur s JOIN documents d USING (doc_id))
              |SELECT lang, bucket, count(*)::BIGINT AS n_docs,
              |  round(avg(avg_surprisal), 6) AS mean_surprisal
              |FROM b GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin),
      (s, d) => {
        val docs = documents(s, d)
        val sur = TextOps.unigramSurprisal(docs, "doc_id", "text")
        val ranked = Ranks.bandedRank(
          sur.join(docs.select("doc_id", "lang"), "doc_id"),
          "lang", "avg_surprisal", "doc_id", bandWidth = 0.25)
        ranked
          .withColumn("bucket",
            Ranks.ntileFromRank(col("rnk"), col("grp_n"), PerplexityTiles))
          .groupBy("lang", "bucket")
          .agg(count(lit(1)).as("n_docs"),
            round(avg(col("avg_surprisal")), 6).as("mean_surprisal"))
          .orderBy("lang", "bucket")
      }),

    // Zipf rank-frequency fit per source: OLS of ln(freq) on ln(rank)
    // over the top-200 terms — slope ≈ −1 is natural text, flat or
    // cliffy slopes flag templated/synthetic corpora. Both engines use
    // the same covar_pop/var_pop estimator so the arithmetic matches.
    Q("q166_zipf_slope",
      Some(s"""WITH toks AS (
              |  SELECT source, unnest(string_split($normSql, ' ')) AS term
              |  FROM documents),
              |tf AS (SELECT source, term, count(*)::DOUBLE AS tf
              |       FROM toks GROUP BY 1, 2),
              |top AS (
              |  SELECT source, tf, row_number() OVER (PARTITION BY source
              |    ORDER BY tf DESC, term) AS r
              |  FROM tf),
              |xy AS (SELECT source, ln(r) AS lx, ln(tf) AS ly
              |       FROM top WHERE r <= $ZipfTopN)
              |SELECT source, count(*)::BIGINT AS n_terms,
              |  round(covar_pop(lx, ly) / var_pop(lx), 6) AS zipf_slope,
              |  round(avg(ly) - covar_pop(lx, ly) / var_pop(lx) * avg(lx), 6)
              |    AS zipf_intercept
              |FROM xy GROUP BY source ORDER BY source""".stripMargin),
      (s, d) => {
        val toks = documents(s, d).select(col("source"),
          explode(TextOps.tokens(TextOps.normalize(col("text")))).as("term"))
        val tf = toks.groupBy("source", "term")
          .agg(count(lit(1)).cast("double").as("tf"))
        val w = Window.partitionBy("source")
          .orderBy(col("tf").desc, col("term"))
        // rank-filter right after row_number → WindowGroupLimit keeps
        // only ~top-N per partition before the sort completes
        val xy = tf.withColumn("r", row_number().over(w))
          .where(col("r") <= ZipfTopN)
          .select(col("source"), log(col("r")).as("lx"), log(col("tf")).as("ly"))
        val slope = covar_pop(col("lx"), col("ly")) / var_pop(col("lx"))
        xy.groupBy("source")
          .agg(count(lit(1)).as("n_terms"),
            round(slope, 6).as("zipf_slope"),
            round(avg(col("ly")) - slope * avg(col("lx")), 6)
              .as("zipf_intercept"))
          .orderBy("source")
      }),

    // Chi-square term-class association: the top-5 most
    // lang-discriminative terms per lang from the (term, lang)
    // contingency tables — the classic feature-selection scorer run as
    // three hash-aggs + broadcast totals. All chi² inputs are exact
    // integer counts cast to double with one shared parenthesization,
    // so both engines produce bit-identical scores; ranking uses the
    // rounded score (ties broken by term) to stay hash-stable.
    Q("q167_chi2_terms",
      Some(s"""WITH toks AS (
              |  SELECT lang, unnest(string_split($normSql, ' ')) AS term
              |  FROM documents),
              |ct AS (SELECT lang, term, count(*)::DOUBLE AS a
              |       FROM toks GROUP BY 1, 2),
              |tl AS (SELECT lang, count(*)::DOUBLE AS cl FROM toks GROUP BY 1),
              |tt AS (SELECT term, count(*)::DOUBLE AS ctot FROM toks GROUP BY 1),
              |nn AS (SELECT count(*)::DOUBLE AS n FROM toks),
              |x AS (
              |  SELECT lang, term,
              |    round(n * (a * (n - cl - ctot + a) - (ctot - a) * (cl - a))
              |      * (a * (n - cl - ctot + a) - (ctot - a) * (cl - a))
              |      / (ctot * (n - ctot) * cl * (n - cl)), 6) AS chi2_r
              |  FROM ct JOIN tl USING (lang) JOIN tt USING (term) CROSS JOIN nn),
              |rk AS (
              |  SELECT lang, term, chi2_r, row_number() OVER (
              |    PARTITION BY lang ORDER BY chi2_r DESC, term)::INT AS r
              |  FROM x)
              |SELECT lang, r, term, chi2_r FROM rk WHERE r <= $Chi2TopK
              |ORDER BY lang, r""".stripMargin),
      (s, d) => {
        val toks = documents(s, d).select(col("lang"),
          explode(TextOps.tokens(TextOps.normalize(col("text")))).as("term"))
        val ct = toks.groupBy("lang", "term")
          .agg(count(lit(1)).cast("double").as("a"))
        val tl = toks.groupBy("lang").agg(count(lit(1)).cast("double").as("cl"))
        val tt = toks.groupBy("term").agg(count(lit(1)).cast("double").as("ctot"))
        val nn = toks.agg(count(lit(1)).cast("double").as("n"))
        val dd = col("n") - col("cl") - col("ctot") + col("a")
        val num = col("a") * dd - (col("ctot") - col("a")) * (col("cl") - col("a"))
        val chi2 = col("n") * num * num /
          (col("ctot") * (col("n") - col("ctot")) * col("cl") * (col("n") - col("cl")))
        val w = Window.partitionBy("lang").orderBy(col("chi2_r").desc, col("term"))
        ct.join(broadcast(tl), "lang").join(tt, "term")
          .crossJoin(broadcast(nn))
          .select(col("lang"), col("term"), round(chi2, 6).as("chi2_r"))
          .withColumn("r", row_number().over(w).cast("int"))
          .where(col("r") <= Chi2TopK)
          .select("lang", "r", "term", "chi2_r")
          .orderBy("lang", "r")
      }),

    // Inter-arrival burstiness per user: CV = σ/µ of the gaps and the
    // Goh–Barabási burstiness B = (σ−µ)/(σ+µ) ∈ [−1, 1] — the
    // bot/spam-traffic signal (B→1 bursty, B→−1 metronome). Gaps via
    // lag over (user, ts, event_id) — per-user window partitions, fine
    // at scale (users are many and small; no low-cardinality skew).
    // Gaps stay in integer MICROS through the aggregate: avg/var_pop on
    // doubles sum in engine-/partition-dependent order, and at sf0.1 one
    // user's mean sat exactly on a round-half boundary (33374.0610425 —
    // the r6 stress-gate catch). Exact long/decimal sums make every
    // derived double a pure function of (Σ, Σ², n), identical in both
    // engines; the sqrt argument is clamped at 0 for the constant-gap
    // cancellation case. The mean is special: s/n lands EXACTLY on a
    // half-microsecond whenever n is even and 2∤(2s mod 2n), i.e. the
    // 6-decimal tie is structural, and double round() tie-breaking
    // differs between engines (HALF_UP vs half-even) — so the mean is
    // rounded to whole µs in INTEGER arithmetic ((2s+n) div 2n, ties
    // up) before the one exact-operand /1e6 division.
    Q("q168_burstiness",
      Some("""WITH g AS (
             |  SELECT user_id,
             |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
             |  FROM events),
             |a AS (
             |  SELECT user_id, count(gap_us)::BIGINT AS n_gaps,
             |    sum(gap_us)::BIGINT AS sl,
             |    sum(gap_us)::DOUBLE AS s,
             |    sum(gap_us::HUGEINT * gap_us)::DOUBLE AS ss
             |  FROM g WHERE gap_us IS NOT NULL GROUP BY user_id)
             |SELECT user_id, n_gaps,
             |  ((2 * sl + n_gaps) // (2 * n_gaps)) / 1e6 AS mean_gap_s,
             |  round(sqrt(greatest(ss / n_gaps
             |    - (s / n_gaps) * (s / n_gaps), 0)) / 1e6, 6) AS sd_gap_s,
             |  round(sqrt(greatest(ss / n_gaps
             |    - (s / n_gaps) * (s / n_gaps), 0)) / (s / n_gaps), 6)
             |    AS cv_r,
             |  round((sqrt(greatest(ss / n_gaps
             |      - (s / n_gaps) * (s / n_gaps), 0)) - s / n_gaps)
             |    / (sqrt(greatest(ss / n_gaps
             |      - (s / n_gaps) * (s / n_gaps), 0)) + s / n_gaps), 6)
             |    AS burstiness_r
             |FROM a ORDER BY user_id""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val g = events(s, d).select(col("user_id"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
            .as("gap_us"))
          .where(col("gap_us").isNotNull)
        val agg = g.groupBy("user_id")
          .agg(count(col("gap_us")).as("n_gaps"),
            sum(col("gap_us")).as("_sl"),
            sum(col("gap_us")).cast("double").as("_s"),
            sum(col("gap_us").cast("decimal(19,0)")
              * col("gap_us").cast("decimal(19,0)"))
              .cast("double").as("_ss"))
        val mu = col("_s") / col("n_gaps")
        val sd = sqrt(greatest(
          col("_ss") / col("n_gaps") - mu * mu, lit(0)))
        agg.select(col("user_id"), col("n_gaps"),
            (expr("(2 * _sl + n_gaps) div (2 * n_gaps)") / lit(1e6))
              .as("mean_gap_s"),
            round(sd / lit(1e6), 6).as("sd_gap_s"),
            round(sd / mu, 6).as("cv_r"),
            round((sd - mu) / (sd + mu), 6).as("burstiness_r"))
          .orderBy("user_id")
      }))
}
