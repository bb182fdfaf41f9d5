package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded k-minimum-values buffer: keeps the k smallest DISTINCT hash
  * values per group with map-side combine — the [[TopKByScore]] shape
  * applied to the KMV sketch's state. Buffer is ≤ k longs regardless
  * of group size. */
class KMinValues(k: Int)
    extends Aggregator[Long, List[Long], Seq[Long]] {
  require(k >= 2)
  // Invariant: the buffer is ALWAYS sorted ascending, distinct, ≤ k —
  // zero/reduce/merge all preserve it, so the per-ROW reduce (the hot
  // aggregation path) is a single O(k) walk with an early exit when the
  // buffer is full and the value can't displace the max, instead of the
  // naive O(k log k) distinct+sort rebuild per element.
  private def trim(l: List[Long]): List[Long] = l.distinct.sorted.take(k)
  override def zero: List[Long] = Nil
  override def reduce(b: List[Long], a: Long): List[Long] = {
    val full = b.lengthCompare(k) >= 0
    if (full && a >= b.last) b // can't enter a full buffer
    else {
      val (lo, hi) = b.span(_ < a)
      if (hi.nonEmpty && hi.head == a) b // already present
      else {
        val ins = lo ::: (a :: hi)
        if (full) ins.init else ins // drop the displaced max
      }
    }
  }
  override def merge(x: List[Long], y: List[Long]): List[Long] =
    trim(x ::: y)
  override def finish(b: List[Long]): Seq[Long] = trim(b)
  override def bufferEncoder: Encoder[List[Long]] =
    Encoders.kryo[List[Long]]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** Count-Min sketch (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms
  * 2005) — the fixed-size frequency summary a 100 TB pipeline keeps when
  * the key domain is too large for an exact count table: d×w counters
  * (d ≈ ln 1/δ rows, w ≈ e/ε columns) answer point frequency queries
  * with one-sided error — est ≥ true always, est ≤ true + εN with
  * probability 1−δ. Counters are ADDITIVE, so the sketch is mergeable:
  * the sketch of a union is the cell-wise sum of the parts' sketches,
  * which is exactly what a map-side-combined `groupBy(row, pos).sum`
  * computes — partial aggregation IS the merge, no special-case code.
  *
  * Built relationally, same convention as [[Bloom]]: positions are
  * md5-derived (`hash60(key || '#' || j) mod w`, reproducible in any
  * engine with md5), the sketch is a (row_j, pos, cnt) table of at most
  * d·w rows — broadcastable by construction — and the probe is a
  * broadcast left join + `min` over the d cells (a missing cell means
  * count 0). Complements [[Heavy.heavyHitters]] (exact two-pass
  * Misra-Gries) on the approximate side: CMS answers ANY point query
  * from constant state, not just the >φN survivors.
  */
object Sketches {

  private def cell(key: Column, j: Int, width: Int): Column =
    struct(lit(j).as("row_j"),
      pmod(TextOps.hash60(concat(key.cast("string"), lit("#"), lit(j))),
        lit(width.toLong)).as("pos"))

  /** Build the (row_j, pos, cnt) sketch over `keyCol`: each input ROW
    * increments one counter per sketch row. Output ≤ depth·width rows.
    * Additive counters → safe under AQE retries' re-aggregation and
    * mergeable across partial builds by cell-wise sum. */
  def cmsBuild(df: DataFrame, keyCol: String, depth: Int,
      width: Int): DataFrame = {
    require(depth > 0 && width > 0, "depth and width must be > 0")
    val cells = (0 until depth).map(j => cell(col(keyCol), j, width))
    df.select(explode(array(cells: _*)).as("_c"))
      .groupBy(col("_c.row_j").as("row_j"), col("_c.pos").as("pos"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query every row of `probe`: append `est` = min over the d
    * cells the key hashes to (missing cell → 0). The sketch joins
    * broadcast — the probe side never shuffles. One-sided by
    * construction: every occurrence of the key incremented all d of its
    * cells, so no cell can undercount it. */
  def cmsEstimate(probe: DataFrame, keyCol: String, sketch: DataFrame,
      depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, "depth and width must be > 0")
    val cells = (0 until depth).map(j => cell(col(keyCol), j, width))
    val est = probe
      .select(col(keyCol), explode(array(cells: _*)).as("_c"))
      .select(col(keyCol), col("_c.row_j").as("row_j"),
        col("_c.pos").as("pos"))
      .join(broadcast(sketch), Seq("row_j", "pos"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
    probe.join(est, Seq(keyCol))
  }

  // ---- HyperLogLog (Flajolet, Fusy, Gandouet & Meunier, "HyperLogLog:
  // the analysis of a near-optimal cardinality estimation algorithm",
  // AofA 2007). Unlike Spark's approx_count_distinct (whose HLL++
  // register state is opaque), these registers are md5-derived —
  // reproducible in any engine with md5, so the sketch itself is
  // oracle-checkable cell by cell.

  /** HLL register table over `keyCol`: m = 2^p registers, each the max
    * rank ρ(w) = (60−p) − bits(w) + 1 of the hash suffix w = h >> p
    * (ρ = 60−p+1 when w = 0), bucket idx = h mod m (low p bits of the
    * 60-bit md5 hash). `bits(w) = length(bin(w))` keeps the rank exact
    * integer arithmetic — no float log2 boundary risk. Output ≤ m rows
    * of (idx, reg): a fixed-size, BROADCASTABLE distinct-count summary.
    *
    * Mergeable by elementwise MAX: registers of a union are the
    * per-idx max of the parts' registers — which is exactly what the
    * map-side-combined `groupBy(idx).max` computes, so partial
    * aggregation IS the merge (same shape as [[cmsBuild]]'s sums).
    * Duplicates cannot move any register: dedup-before-sketch is
    * unnecessary, the whole 100 TB stream folds in one pass. */
  def hllRegisters(df: DataFrame, keyCol: String, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, "p must be in [4, 16]")
    val (idx, rho) = hllTerms(col(keyCol), p)
    df.select(idx.as("idx"), rho.as("_rho"))
      .groupBy("idx").agg(max(col("_rho")).cast("long").as("reg"))
  }

  /** Row-level (bucket idx, rank ρ) pair for a key — the one shared
    * builder for the table-form sketch ([[hllRegisters]]) and the
    * aggregate-columns form ([[hllAggState]]), so the two cannot drift. */
  private[graft] def hllTerms(key: Column, p: Int): (Column, Column) = {
    val m = 1L << p
    val width = 60 - p
    val h = TextOps.hash60(key.cast("string"))
    val w = shiftright(h, p)
    (pmod(h, lit(m)),
      when(w === 0, lit(width + 1))
        .otherwise(lit(width + 1) - length(bin(w))))
  }

  /** The sketch as 2^p aggregate COLUMNS (one int of state per
    * register) plus the estimate expression over them — the form a
    * Structured Streaming stateful aggregation needs: per-group state
    * is exactly m ints regardless of how many distinct keys flow
    * through the group, and `max` is idempotent, so retried
    * micro-batches cannot corrupt a register (same argument as the
    * bitmap words in `streaming.Streams`). The estimate (same α·m²/Z +
    * linear-counting branch as [[hllEstimate]], rounded to 6) is
    * applied in a projection AFTER the stateful agg. */
  def hllAggState(idCol: String, p: Int): (Seq[Column], Column) = {
    require(p >= 4 && p <= 10, "p must be in [4, 10] (2^p agg columns)")
    val m = 1 << p
    val (idx, rho) = hllTerms(col(idCol), p)
    val aggs = (0 until m).map(j =>
      max(when(idx === j, rho).otherwise(lit(0))).as(s"_r$j"))
    val z = (0 until m).map(j => pow(lit(2.0), -col(s"_r$j")))
      .reduce(_ + _)
    val v0 = (0 until m).map(j =>
      when(col(s"_r$j") === 0, lit(1L)).otherwise(lit(0L))).reduce(_ + _)
    val alphaMM = hllAlpha(m) * m * m
    val est = round(when(v0 > 0 && lit(alphaMM) / z <= lit(2.5 * m),
      lit(m.toDouble) * log(lit(m.toDouble) / v0))
      .otherwise(lit(alphaMM) / z), 6)
    (aggs, est)
  }

  /** HLL set-algebra overlap: estimate |A|, |B|, |A∪B| and (by
    * inclusion–exclusion) |A∩B| of two key sets from their HLL register
    * tables — the constant-state answer to "how many users/documents do
    * these two slices share" that at 100 TB replaces an exact distinct
    * intersection (a full shuffle of both sides). Union is the one
    * EXACT operation on HLL sketches (register-wise max — Flajolet et
    * al. '07), so the intersection inherits only the three estimates'
    * error; for small intersections of large sets the relative error
    * explodes — that caveat is the documented price (the exact bitmap
    * path, q130, is the audit twin).
    *
    * Shape: two register builds (hash-agg to m rows each), a full-outer
    * m-row merge, three m-row estimate folds. Nothing corpus-sized
    * survives the first agg. */
  def hllOverlap(a: DataFrame, b: DataFrame, keyCol: String,
      p: Int): DataFrame = {
    val ra = hllRegisters(a, keyCol, p)
    val rb = hllRegisters(b, keyCol, p)
    val merged = ra.withColumnRenamed("reg", "_ra")
      .join(rb.withColumnRenamed("reg", "_rb"), Seq("idx"), "full_outer")
      .select(col("idx"), greatest(coalesce(col("_ra"), lit(0L)),
        coalesce(col("_rb"), lit(0L))).as("reg"))
    val ea = hllEstimate(ra, p).select(col("est").as("est_a"))
    val eb = hllEstimate(rb, p).select(col("est").as("est_b"))
    val eu = hllEstimate(merged, p).select(col("est").as("est_union"))
    ea.crossJoin(eb).crossJoin(eu)
      .select(col("est_a"), col("est_b"), col("est_union"),
        round(col("est_a") + col("est_b") - col("est_union"), 6)
          .as("est_intersect"))
  }

  /** AMS second-moment (F₂ = Σ_k f_k², the self-join size) sketch —
    * Alon, Matias & Szegedy, "The space complexity of approximating the
    * frequency moments", STOC'96. Each trial keeps ONE counter: the
    * ±1-signed row sum S_t (sign = a hash bit of (key, trial)); E[S²] =
    * F₂, and the median over `trials` independent estimates
    * concentrates. F₂ is what drives self-join/join-size estimation in
    * a planner, and this sketch computes it in one pass with `trials`
    * longs of state — vs the exact path's |keys|-row aggregate.
    *
    * Emits one row: exact F₂ (computed alongside for the audit), the
    * AMS median estimate, and the relative error. Median over the tiny
    * trials table by exact rank — no percentile interpolation, so the
    * oracle matches bit-for-bit. At 10¹² rows the signed sums outgrow
    * BIGINT squares; the squares run in DECIMAL(38,0) for that reason.
    * `trials` must be odd (exact middle element) and ≤ 60.
    *
    * All trials draw their sign from ONE md5-derived hash per row —
    * trial t uses bit t of hash60(key) — instead of `trials` separate
    * hashes: the scan cost is one md5 per row regardless of trials
    * (measured 9× cheaper at trials = 9), at the price of md5 bit-level
    * rather than per-trial-family independence — empirically fine for
    * a cryptographic hash, and the estimator stays unbiased per trial. */
  def amsF2(df: DataFrame, keyCol: String, trials: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(trials > 0 && trials % 2 == 1 && trials <= 60,
      "trials must be odd and <= 60")
    val h = TextOps.hash60(col(keyCol).cast("string"))
    val sgn = (t: Int) =>
      (shiftright(h, t).bitwiseAND(lit(1L)) * 2 - 1)
    val sums = df.agg(sum(sgn(0)).as("_s0"),
      (1 until trials).map(t => sum(sgn(t)).as(s"_s$t")): _*)
    val ests = sums.select(posexplode(array(
      (0 until trials).map(t => (col(s"_s$t").cast("decimal(19,0)")
        * col(s"_s$t").cast("decimal(19,0)")).cast("decimal(38,0)")): _*))
      .as(Seq("trial", "est")))
    val wMed = Window.orderBy(col("est"), col("trial"))
    val median = ests.withColumn("_rk", row_number().over(wMed))
      .where(col("_rk") === (trials + 1) / 2)
      .select(col("est").as("f2_ams"))
    val exact = df.groupBy(col(keyCol)).agg(count(lit(1)).as("_f"))
      .agg(sum(col("_f").cast("decimal(19,0)") * col("_f")
        .cast("decimal(19,0)")).cast("decimal(38,0)").as("f2_exact"))
    exact.crossJoin(broadcast(median))
      .select(col("f2_exact").cast("long").as("f2_exact"),
        col("f2_ams").cast("long").as("f2_ams"),
        round(abs(col("f2_ams").cast("double")
            - col("f2_exact").cast("double")) / col("f2_exact"), 6)
          .as("rel_err_r"))
  }

  /** α_m bias constant (HLL paper §4's empirical values for small m,
    * the asymptotic formula otherwise). Public so oracle SQL generators
    * interpolate the SAME double literal the engine computes with. */
  def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Cardinality estimate from an [[hllRegisters]] table: raw
    * E = α_m·m² / Σ_j 2^(−M_j) over the FULL m-register grid (absent
    * idx = empty register = 2^0), with the standard small-range linear
    * counting correction E* = m·ln(m/V) when E ≤ 2.5m and V (empty
    * registers) > 0. The 32-bit large-range correction is unnecessary:
    * the hash space is 60-bit, collisions are negligible below ~2^29
    * distinct. α·m² and the 2.5m threshold are Scala-computed literals
    * so an oracle interpolating the same constants cannot drift by
    * association order. One row out: (v_zero, est) — est rounded to 6
    * decimals (Σ 2^(−M_j) is a sum of dyadic terms whose accumulation
    * order differs across engines by ≤ ulps).
    *
    * Typical error 1.04/√m (~6.5% at p = 8); the register grid is tiny
    * (m ≤ 65536 rows) so the whole estimate is driver-scale work after
    * one distributed fold. */
  def hllEstimate(registers: DataFrame, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, "p must be in [4, 16]")
    val m = 1 << p
    val alphaMM = hllAlpha(m) * m * m
    val lcThreshold = 2.5 * m
    val grid = registers.sparkSession.range(m).toDF("idx")
    grid.join(broadcast(registers), Seq("idx"), "left")
      .select(coalesce(col("reg"), lit(0L)).as("reg"))
      .agg(sum(pow(lit(2.0), -col("reg"))).as("_z"),
        sum(when(col("reg") === 0, lit(1L)).otherwise(lit(0L)))
          .as("v_zero"))
      .select(col("v_zero"),
        round(when(col("v_zero") > 0 &&
            lit(alphaMM) / col("_z") <= lit(lcThreshold),
          lit(m.toDouble) * log(lit(m.toDouble) / col("v_zero")))
          .otherwise(lit(alphaMM) / col("_z")), 6).as("est"))
  }

  /** KMV (k-minimum-values / bottom-k) distinct-count sketch per group
    * (Bar-Yossef et al., RANDOM'02): keep the k smallest distinct
    * md5-hash60 values; if the group has ≥ k distinct keys, estimate
    * D̂ = (k−1)·2⁶⁰ / h_(k) (the k-th minimum pins the density of the
    * uniform hash points); below k the sketch IS the exact distinct
    * count. σ ≈ 1/√(k−2) relative error. Unlike [[hllRegisters]], the
    * state is the hash VALUES themselves — so the sketch is exactly
    * engine-reproducible (the oracle recomputes the identical k-th
    * minimum) and mergeable by list-union.
    *
    * Shape: the [[KMinValues]] Aggregator keeps ≤ k longs per group in
    * every partial buffer (map-side combine — shuffle volume is
    * k·groups, never corpus rows, the [[TopKByScore]] argument).
    * Emits per group: `k_used`, the k-th minimum (null below k), and
    * the 6-dp estimate. */
  def kmvDistinct(df: DataFrame, groupCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 2)
    val agg = udaf(new KMinValues(k))
    val dom = 1152921504606846976.0 // 2^60 — hash60's domain
    df.select(col(groupCol),
        graft.ops.TextOps.hash60(col(idCol).cast("string")).as("_h"))
      .groupBy(col(groupCol))
      .agg(agg(col("_h")).as("_mins"))
      .select(col(groupCol),
        size(col("_mins")).cast("long").as("k_used"),
        when(size(col("_mins")) === k, element_at(col("_mins"), k))
          .as("kth_hash"),
        round(when(size(col("_mins")) === k,
          lit((k - 1).toDouble) * lit(dom) /
            element_at(col("_mins"), k).cast("double"))
          .otherwise(size(col("_mins")).cast("double")), 6).as("est_r"))
  }

  /** KMV set algebra: pairwise union/Jaccard/intersection estimates
    * between every two groups' bottom-k sketches (Beyer et al.,
    * SIGMOD'07). The union of two KMV sketches is the bottom-k of
    * their merged hash lists; Ĵ = |bottom-k(U) present in BOTH
    * sketches| / k; D̂_∩ = Ĵ·D̂_U. When the merged list holds fewer
    * than k values, BOTH sets were complete — union, Jaccard and
    * intersection are then EXACT. Like [[kmvDistinct]], the state is
    * hash values, so the oracle reproduces every estimate identically
    * — the audit-friendly complement to [[hllOverlap]]'s
    * register-merge estimates.
    *
    * Shape: one [[KMinValues]] agg to |groups| sketch rows, then a
    * |groups|²/2 self-join whose per-pair work is array ops over ≤ 2k
    * longs — nothing corpus-sized after the first agg. */
  def kmvSetAlgebra(df: DataFrame, groupCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 2)
    val agg = udaf(new KMinValues(k))
    val dom = 1152921504606846976.0
    val sk = df.select(col(groupCol),
        graft.ops.TextOps.hash60(col(idCol).cast("string")).as("_h"))
      .groupBy(col(groupCol))
      .agg(agg(col("_h")).as("_mins"))
    val a = sk.select(col(groupCol).as("group_a"), col("_mins").as("_ma"))
    val b = sk.select(col(groupCol).as("group_b"), col("_mins").as("_mb"))
    val uk = slice(array_sort(array_union(col("_ma"), col("_mb"))),
      1, k)
    val paired = a.join(b, col("group_a") < col("group_b"))
      .withColumn("_uk", uk)
      .withColumn("_ku", size(col("_uk")))
      .withColumn("_nboth", size(filter(col("_uk"),
        x => array_contains(col("_ma"), x) &&
          array_contains(col("_mb"), x))))
    val estU = when(col("_ku") === k,
      lit((k - 1).toDouble) * lit(dom) /
        element_at(col("_uk"), k).cast("double"))
      .otherwise(col("_ku").cast("double"))
    val j = col("_nboth").cast("double") / col("_ku")
    paired.select(col("group_a"), col("group_b"),
      col("_ku").cast("long").as("k_union"),
      col("_nboth").cast("long").as("n_both"),
      round(estU, 6).as("est_union_r"),
      round(j, 6).as("jaccard_r"),
      round(j * estU, 6).as("est_inter_r"))
  }
}
