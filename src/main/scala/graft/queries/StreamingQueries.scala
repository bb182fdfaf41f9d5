package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.AsOf
import graft.streaming.{StreamingHeavyHitters, Streams}
import graft.util.Tables._

/** Temporal surface: incremental streaming windows (Trigger.AvailableNow —
  * the reference's daily-batch cadence, SURVEY.md §2.10), batch session
  * windows, and the as-of join.
  */
object StreamingQueries {

  val all: Seq[Q] = Seq(

    // Structured Streaming tumbling window ≡ batch time_bucket (1h divides
    // the epoch alignment of both engines).
    Q("q35_stream_tumbling",
      Some("""SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             | event_type, count(*) AS n, round(sum(value), 2) AS total
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, d) => Streams.tumblingAgg(s, d, "1 hour")
        .orderBy("window_start", "event_type")),

    // Sliding windows: every event lands in width/slide buckets. Oracle
    // reproduces via a generate_series of slide starts.
    Q("q36_stream_sliding",
      Some("""WITH slid AS (
             |  SELECT time_bucket(INTERVAL '30 minutes', ts)
             |           - (g.i * INTERVAL '30 minutes') AS window_start,
             |    event_type
             |  FROM events, unnest(generate_series(0, 1)) AS g(i))
             |SELECT window_start, event_type, count(*) AS n
             |FROM slid GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, d) => Streams.slidingAgg(s, d, "1 hour", "30 minutes")
        .orderBy("window_start", "event_type")),

    // Watermark + append mode: only closed windows are emitted — the
    // late-data policy the reference lacks (SURVEY §2.10); oracle filters
    // to windows whose end precedes the final watermark.
    Q("q57_stream_watermark_append",
      Some("""SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             | event_type, count(*) AS n
             |FROM events
             |GROUP BY 1, 2
             |HAVING time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
             |   <= (SELECT max(ts) FROM events) - INTERVAL '2 hours'
             |ORDER BY 1, 2""".stripMargin),
      (s, d) => Streams.tumblingAggAppend(s, d, "1 hour", "2 hours")
        .orderBy("window_start", "event_type")),

    // Streaming dropDuplicates (O4's streaming mirror).
    Q("q37_stream_dedup_counts",
      Some("""SELECT event_type, count(DISTINCT event_id) AS n
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => Streams.streamingDedupCounts(s, d).orderBy("event_type")),

    // Stream-stream inner join with event-time bounds (state bounded by
    // watermarks); equals the batch conditional join over finite input.
    // LEFT OUTER stream-stream join: matched rows emit immediately;
    // null-padded unmatched purchases emit only once the global
    // watermark (min of both sides' max event time, minus the 1-hour
    // delay) proves no signup can still arrive — the oracle applies
    // the same final-watermark gate to its unmatched rows (q57's
    // closed-window discipline applied to join state).
    Q("q272_stream_stream_left",
      Some("""WITH p AS (
             |  SELECT user_id, ts, event_id FROM events
             |  WHERE event_type = 'purchase'),
             |s AS (
             |  SELECT user_id, ts, event_id FROM events
             |  WHERE event_type = 'signup'),
             |wm AS (
             |  SELECT least((SELECT max(ts) FROM p),
             |    (SELECT max(ts) FROM s)) - INTERVAL '1 hour' AS w)
             |SELECT p.event_id AS p_id, s.event_id AS s_id
             |FROM p JOIN s
             |  ON p.user_id = s.user_id
             | AND s.ts <= p.ts AND s.ts >= p.ts - INTERVAL '1 day'
             |UNION ALL
             |SELECT p.event_id, NULL
             |FROM p CROSS JOIN wm
             |WHERE p.ts < wm.w
             |  AND NOT EXISTS (SELECT 1 FROM s
             |    WHERE s.user_id = p.user_id AND s.ts <= p.ts
             |      AND s.ts >= p.ts - INTERVAL '1 day')
             |ORDER BY p_id, s_id""".stripMargin),
      (s, d) => Streams.streamStreamLeftJoin(s, d, "1 DAY")
        .orderBy("p_id", "s_id")),

    // FULL OUTER stream-stream join: q272's null-padded purchases PLUS
    // null-padded unmatched signups — whose no-match proof needs the
    // watermark past s_ts + lookback (a matching purchase may arrive
    // that much later). Nulls-last ordering pinned on both engines.
    Q("q319_stream_stream_full",
      Some("""WITH p AS (
             |  SELECT user_id, ts, event_id FROM events
             |  WHERE event_type = 'purchase'),
             |s AS (
             |  SELECT user_id, ts, event_id FROM events
             |  WHERE event_type = 'signup'),
             |wm AS (
             |  SELECT least((SELECT max(ts) FROM p),
             |    (SELECT max(ts) FROM s)) - INTERVAL '1 hour' AS w)
             |SELECT p_id, s_id FROM (
             |  SELECT p.event_id AS p_id, s.event_id AS s_id
             |  FROM p JOIN s
             |    ON p.user_id = s.user_id
             |   AND s.ts <= p.ts AND s.ts >= p.ts - INTERVAL '1 day'
             |  UNION ALL
             |  SELECT p.event_id, NULL
             |  FROM p CROSS JOIN wm
             |  WHERE p.ts < wm.w
             |    AND NOT EXISTS (SELECT 1 FROM s
             |      WHERE s.user_id = p.user_id AND s.ts <= p.ts
             |        AND s.ts >= p.ts - INTERVAL '1 day')
             |  UNION ALL
             |  SELECT NULL, s.event_id
             |  FROM s CROSS JOIN wm
             |  WHERE s.ts + INTERVAL '1 day' < wm.w
             |    AND NOT EXISTS (SELECT 1 FROM p
             |      WHERE p.user_id = s.user_id AND p.ts >= s.ts
             |        AND p.ts <= s.ts + INTERVAL '1 day'))
             |ORDER BY p_id NULLS LAST, s_id NULLS LAST""".stripMargin),
      (s, d) => Streams.streamStreamFullJoin(s, d, "1 DAY")
        .orderBy(col("p_id").asc_nulls_last, col("s_id").asc_nulls_last)),

    Q("q62_stream_stream_join",
      Some("""SELECT p.event_id AS p_id, s.event_id AS s_id
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |JOIN (SELECT * FROM events WHERE event_type = 'signup') s
             |  ON p.user_id = s.user_id
             | AND s.ts <= p.ts AND s.ts >= p.ts - INTERVAL '1 day'
             |ORDER BY p_id, s_id""".stripMargin),
      (s, d) => Streams.streamStreamJoin(s, d, "1 DAY")
        .orderBy("p_id", "s_id")),

    // Batch session windows (5-minute gap) vs gaps-and-islands oracle.
    Q("q38_session_window",
      Some("""WITH marked AS (
             |  SELECT user_id, ts, event_id,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |         OR ts - lag(ts) OVER w >= INTERVAL '5 minutes'
             |    THEN 1 ELSE 0 END AS brk
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT user_id, ts,
             |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM marked)
             |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
             |FROM sess GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin),
      (s, d) => events(s, d)
        .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"), col("n_events"))
        .orderBy("user_id", "session_start")),

    // CUSTOM streaming state (flatMapGroupsWithState): gap-rule
    // sessionization with a user-code accumulator, emission = closed
    // sessions only (each user's still-open last session stays in state)
    // — deterministic, so the oracle is the batch gaps-and-islands
    // computation minus each user's final session. Gap 1h, exact
    // microseconds, same total order as the batch twin (q68).
    Q("q71_stream_stateful_sessions",
      Some("""WITH e AS (
             |  SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events),
             |g AS (
             |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
             |      OR us - lag(us) OVER w > 3600000000 THEN 1 ELSE 0
             |    END AS news
             |  FROM e WINDOW w AS (PARTITION BY user_id
             |    ORDER BY ts NULLS FIRST, event_id)),
             |s AS (
             |  SELECT *, CAST(sum(news) OVER (PARTITION BY user_id
             |    ORDER BY ts NULLS FIRST, event_id
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
             |  FROM g),
             |sess AS (
             |  SELECT user_id, session_idx, count(*) AS n_events,
             |    min(ts) AS sess_start, max(ts) AS sess_end
             |  FROM s GROUP BY user_id, session_idx)
             |SELECT user_id, session_idx, n_events, sess_start, sess_end
             |FROM (SELECT sess.*, max(session_idx)
             |        OVER (PARTITION BY user_id) AS mx FROM sess) t
             |WHERE session_idx < mx
             |ORDER BY user_id, session_idx""".stripMargin),
      (s, d) => graft.streaming.StatefulSessions
        .closedSessions(s, d, gapSeconds = 3600L)
        .orderBy("user_id", "session_idx")),

    // Stream-static join: the event stream enriched against the customer
    // dimension (broadcast — no stream shuffle, no join state), then a
    // daily tumbling count per segment. Fills the stream-static family:
    // q62 covers stream-stream, this covers the dimension-enrichment
    // topology a fact stream runs against every batch.
    Q("q86_stream_static_join",
      Some("""SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
             | c_mktsegment, count(*) AS n
             |FROM events e JOIN customer c ON e.user_id = c.c_custkey
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, d) => Streams.streamStaticAgg(s, d, customer(s, d),
          "c_custkey", "user_id", "c_mktsegment", "1 day")
        .orderBy("window_start", "c_mktsegment")),

    // As-of join: each purchase sees the latest signup at or before it.
    Q("q39_asof_join",
      Some("""SELECT p.event_id, p.user_id, s.ts AS signup_ts
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
             |  ON p.user_id = s.user_id AND s.ts <= p.ts
             |ORDER BY p.event_id""".stripMargin),
      (s, d) => {
        val ev = events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts"), col("event_id").as("sig_id"),
            col("ts").as("signup_ts"))
        AsOf.backward(purchases, signups, "user_id", "ts", "sig_id",
          Seq("signup_ts" -> "signup_ts"))
          .select("event_id", "user_id", "signup_ts")
          .orderBy("event_id")
      }),

    // Day-over-day event-count deltas (lag over a daily rollup — the
    // analytics any consumer of the reference's tables runs).
    Q("q40_daily_deltas",
      Some("""WITH daily AS (
             |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             |    event_type, count(*) AS n
             |  FROM events GROUP BY 1, 2)
             |SELECT day, event_type, n,
             |  n - lag(n) OVER (PARTITION BY event_type ORDER BY day) AS delta
             |FROM daily ORDER BY event_type, day""".stripMargin),
      (s, d) => {
        val daily = events(s, d)
          .groupBy(to_date(date_trunc("day", col("ts"))).as("day"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        daily.withColumn("delta", col("n") - lag(col("n"), 1).over(w))
          .orderBy("event_type", "day")
      }),

    // Streaming EXACT windowed distinct via the bitmap aggregation —
    // constant state per (window, type) group (32 words = 2048-id
    // domain), vs dropDuplicates state that grows with ids seen. The
    // oracle is the plain batch count(DISTINCT).
    Q("q124_stream_bitmap_distinct",
      Some("""SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             | event_type, count(DISTINCT user_id)::BIGINT AS n_distinct
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, d) => Streams.streamingBitmapDistinct(s, d, "1 hour",
          "user_id", domainWords = 32)
        .orderBy("window_start", "event_type")),

    // Streaming HLL distinct (p = 6 → 64 registers/group, σ ≈ 13%):
    // q124's approximate complement — fixed state with NO id-domain
    // bound. The oracle rebuilds the md5-derived registers per
    // (window, type) cell-for-cell and applies the same α·m²/Z +
    // linear-counting estimate (constants interpolated from the
    // engine's own hllAlpha).
    Q("q148_stream_hll_distinct",
      Some {
        val m = 64
        val width1 = 60 - 6 + 1
        val alphaMM = graft.ops.Sketches.hllAlpha(m) * m * m
        s"""WITH h AS (
           |  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           |    event_type,
           |    ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT
           |      AS h
           |  FROM events),
           |b AS (SELECT window_start, event_type, h % $m AS idx,
           |             h // $m AS w FROM h),
           |regs AS (
           |  SELECT window_start, event_type, idx,
           |    max(CASE WHEN w = 0 THEN $width1
           |        ELSE $width1 - length(bin(w)) END) AS reg
           |  FROM b GROUP BY 1, 2, 3),
           |grid AS (SELECT g AS idx
           |         FROM unnest(generate_series(0, ${m - 1})) AS t(g)),
           |keys AS (SELECT DISTINCT window_start, event_type FROM regs),
           |filled AS (
           |  SELECT k.window_start, k.event_type,
           |    coalesce(r.reg, 0) AS reg
           |  FROM keys k CROSS JOIN grid g
           |  LEFT JOIN regs r ON r.window_start = k.window_start
           |    AND r.event_type = k.event_type AND r.idx = g.idx),
           |agg AS (
           |  SELECT window_start, event_type, sum(pow(2.0, -reg)) AS z,
           |    sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END)::BIGINT
           |      AS v_zero
           |  FROM filled GROUP BY 1, 2)
           |SELECT window_start, event_type,
           |  round(CASE WHEN v_zero > 0 AND $alphaMM / z <= ${2.5 * m}
           |    THEN ${m.toDouble} * ln(${m.toDouble} / v_zero)
           |    ELSE $alphaMM / z END, 6) AS n_est
           |FROM agg ORDER BY 1, 2""".stripMargin
      },
      (s, d) => Streams.streamingHllDistinct(s, d, "1 hour", "user_id",
          p = 6)
        .orderBy("window_start", "event_type")),

    // Streaming Misra–Gries top-10 per event_type: fixed per-group state
    // (≤ capacity counters) regardless of distinct-key growth. Capacity
    // 4096 ≥ every sf's user count, so the summary is exact and the
    // oracle is the true top-k; the approximate regime's N/capacity
    // bounds are property-tested in StreamingHeavyHittersSpec.
    Q("q170_stream_heavy_hitters",
      Some("""WITH c AS (
             |  SELECT event_type, user_id, count(*)::BIGINT AS est_n
             |  FROM events GROUP BY 1, 2),
             |rk AS (
             |  SELECT event_type, user_id, est_n, row_number() OVER (
             |    PARTITION BY event_type ORDER BY est_n DESC, user_id)
             |    ::INT AS r
             |  FROM c)
             |SELECT event_type, r, user_id, est_n FROM rk
             |WHERE r <= 10 ORDER BY event_type, r""".stripMargin),
      (s, d) => StreamingHeavyHitters.heavyHitters(s, d,
          capacity = 4096, k = 10)
        .orderBy("event_type", "r")),

    // Streaming ingest fingerprint — the stream/batch parity check: the
    // commutative Σ hash60(id) mod 2^60 per key is invariant to
    // micro-batch slicing and retries, so the streamed value must equal
    // the batch oracle's fingerprint of the same rows (q182's twin).
    Q("q194_stream_fingerprint",
      Some("""SELECT event_type, count(*)::BIGINT AS n_rows,
             |  (sum(('0x' || substr(md5(event_id::VARCHAR), 1, 15))
             |    ::BIGINT)::HUGEINT % 1152921504606846976)::BIGINT
             |    AS fingerprint
             |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin),
      (s, d) => Streams.streamingFingerprint(s, d,
          "event_type", "event_id")
        .orderBy("event_type"))
  )
}
