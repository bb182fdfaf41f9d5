package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Ranks, TextOps}
import graft.util.Tables._

/** Round-14 provenance/flow batch: Church–Gale term burstiness and
  * hapax attribution (which slice clumps / which slice contributes
  * unique vocabulary), order-to-ship lead-time quartiles on the
  * banded-rank machinery, and per-source dedup survivorship over the
  * persisted near-dup index (the keep-policy readout q161's pair
  * leakage matrix doesn't give).
  */
object ProvenanceQueries {

  /** Fixed literal term list (contract shared with the oracle). */
  private val BurstTerms = Seq("batch", "data", "join", "merge",
    "scan", "spark", "table", "window")
  private val normSql = TextQueries.normSql

  val all: Seq[Q] = Seq(

    // Church–Gale burstiness + adaptation per literal term: cf/df and
    // P(tf≥2 | tf≥1) — per-term clumping the corpus spectrum hides.
    Q("q537_term_burstiness",
      Some(s"""WITH tok AS MATERIALIZED (
              |  SELECT doc_id, unnest(string_split($normSql, ' '))
              |    AS t FROM documents),
              |dt AS (SELECT doc_id, t, count(*)::BIGINT AS tf
              |  FROM tok
              |  WHERE t IN (${BurstTerms.map(t => s"'$t'")
                  .mkString(", ")})
              |  GROUP BY 1, 2),
              |per AS (SELECT t AS term, count(*)::BIGINT AS df,
              |  sum(tf)::BIGINT AS cf,
              |  sum(CASE WHEN tf >= 2 THEN 1 ELSE 0 END)::BIGINT
              |    AS df_multi
              |  FROM dt GROUP BY 1),
              |tl(term) AS (VALUES ${BurstTerms.map(t => s"('$t')")
                  .mkString(", ")})
              |SELECT tl.term, coalesce(df, 0)::BIGINT AS df,
              |  coalesce(cf, 0)::BIGINT AS cf,
              |  coalesce(df_multi, 0)::BIGINT AS df_multi,
              |  round(CASE WHEN coalesce(df, 0) > 0
              |    THEN cf::DOUBLE / df::DOUBLE END, 6) AS burstiness_r,
              |  round(CASE WHEN coalesce(df, 0) > 0
              |    THEN df_multi::DOUBLE / df::DOUBLE END, 6)
              |    AS adaptation_r
              |FROM tl LEFT JOIN per USING (term)
              |ORDER BY term""".stripMargin),
      (s, d) => TextOps.termBurstiness(documents(s, d), "doc_id",
        "text", BurstTerms)),

    // Hapax attribution: per source, token share vs share of the
    // corpus's global tf=1 vocabulary, and the lift between them.
    Q("q538_hapax_attribution",
      Some(s"""WITH st AS MATERIALIZED (
              |  SELECT source, t, count(*)::BIGINT AS n FROM (
              |    SELECT source, unnest(string_split($normSql, ' '))
              |      AS t FROM documents) x
              |  GROUP BY 1, 2),
              |hapax AS (SELECT t FROM (
              |  SELECT t, sum(n) AS tf FROM st GROUP BY 1) g
              |  WHERE tf = 1),
              |ps AS (SELECT source, sum(n)::BIGINT AS n_tokens
              |  FROM st GROUP BY 1),
              |hs AS (SELECT source, count(*)::BIGINT AS n_hapax
              |  FROM st JOIN hapax USING (t) GROUP BY 1),
              |j AS (SELECT ps.source, ps.n_tokens,
              |  coalesce(hs.n_hapax, 0)::BIGINT AS n_hapax
              |  FROM ps LEFT JOIN hs USING (source)),
              |t AS (SELECT sum(n_tokens)::BIGINT AS tt,
              |  sum(n_hapax)::BIGINT AS th FROM j)
              |SELECT j.source, j.n_tokens, j.n_hapax,
              |  round(j.n_tokens::DOUBLE / t.tt::DOUBLE, 6)
              |    AS token_share_r,
              |  round(CASE WHEN t.th > 0
              |    THEN j.n_hapax::DOUBLE / t.th::DOUBLE END, 6)
              |    AS hapax_share_r,
              |  round(CASE WHEN t.th > 0 THEN
              |    (j.n_hapax::DOUBLE / t.th::DOUBLE)
              |      / (j.n_tokens::DOUBLE / t.tt::DOUBLE) END, 6)
              |    AS lift_r
              |FROM j, t ORDER BY source""".stripMargin),
      (s, d) => TextOps.hapaxAttribution(documents(s, d), "text",
        "source")),

    // Order-to-ship lead time per priority: exact linear-interpolated
    // quartiles down the banded-rank machinery (no single-task sort);
    // days are exact integers so quantile_cont agrees bit-for-bit.
    Q("q539_lead_time",
      Some("""WITH lt AS MATERIALIZED (
             |  SELECT o.o_orderpriority AS priority,
             |    (l.l_shipdate::DATE - o.o_orderdate::DATE)::BIGINT
             |      AS days
             |  FROM lineitem l JOIN orders o
             |    ON o.o_orderkey = l.l_orderkey),
             |w AS (SELECT priority, count(*)::BIGINT AS n,
             |  quantile_cont(days, 0.25) AS q25,
             |  quantile_cont(days, 0.50) AS q50,
             |  quantile_cont(days, 0.75) AS q75
             |  FROM lt GROUP BY 1)
             |SELECT priority, n, q, q_val FROM (
             |  SELECT priority, n, 0.25 AS q, q25 AS q_val FROM w
             |  UNION ALL
             |  SELECT priority, n, 0.5, q50 FROM w
             |  UNION ALL
             |  SELECT priority, n, 0.75, q75 FROM w) u
             |ORDER BY priority, q""".stripMargin),
      (s, d) => {
        val lt = lineitem(s, d)
          .join(orders(s, d),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderpriority").as("priority"),
            datediff(col("l_shipdate"), col("o_orderdate"))
              .cast("long").as("days"),
            (col("l_orderkey") * 10 + col("l_linenumber")).as("lid"))
        Ranks.exactQuantiles(lt, "priority", "days", "lid",
            bandWidth = 8.0, nums = Seq(1, 2, 3), den = 4)
          .orderBy(col("priority"), col("q"))
      }),

    // Dedup survivorship per source over the persisted near-dup index
    // (keep = each cluster's min doc id): the keep-policy mass
    // readout — q161's leakage matrix counts cross-slice PAIRS; this
    // reports which slice actually loses documents.
    Q("q540_dedup_survivorship",
      Some(s"""${TextQueries.neardupReachCte},
              |rem AS (SELECT node AS doc_id FROM (
              |  SELECT node, min(r) AS label FROM reach GROUP BY node)
              |  t WHERE label < node),
              |d AS (SELECT source, doc_id FROM documents),
              |ps AS (SELECT source, count(*)::BIGINT AS n_docs,
              |  sum(CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END)
              |    ::BIGINT AS n_removed
              |  FROM d LEFT JOIN rem r USING (doc_id) GROUP BY 1)
              |SELECT source, n_docs, n_removed,
              |  round((n_docs - n_removed)::DOUBLE / n_docs::DOUBLE,
              |    6) AS survival_r
              |FROM ps ORDER BY source""".stripMargin),
      (s, d) => {
        val removed = Dedup.nearDupRemovalsOnIndex(
          docShingleTable(s, d), docBandTable(s, d), "doc_id", 0.5)
          .localCheckpoint()
        val docs = documents(s, d).select(col("source"), col("doc_id"))
        docs.join(removed.withColumn("_rm", lit(1L)),
            Seq("doc_id"), "left")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            coalesce(sum(col("_rm")), lit(0L)).as("n_removed"))
          .select(col("source"), col("n_docs"), col("n_removed"),
            round((col("n_docs") - col("n_removed")).cast("double")
              / col("n_docs").cast("double"), 6).as("survival_r"))
          .orderBy(col("source"))
      })
  )
}
