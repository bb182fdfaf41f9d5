package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** The unpartitioned-window pin (r10 VERDICT item 4).
  *
  * `Window.orderBy(...)` with no `partitionBy` moves EVERY input row
  * into one task — the single shape that cannot survive a corpus-sized
  * frame at 100 TB. Every existing site in `src/main` operates on a
  * frame already reduced to a BOUNDED grain (day spine, key/segment
  * grid, band/bucket table, hypothesis list, scalar), which is the only
  * acceptable reason to keep one.
  *
  * This spec enumerates every non-comment `Window.orderBy` occurrence
  * under `src/main/scala` and pins the per-file count against the
  * reviewed allowlist below. A NEW unpartitioned window site anywhere
  * fails this test until it is either banded (`Ranks.bandedRank` /
  * `bandedRunningSum` — the distributed prefix machinery built for
  * exactly this) or reviewed and added here WITH its bounded-grain
  * argument. A data-shaped window can no longer slip in silently.
  *
  * CONVENTION the scan relies on: unpartitioned window sites must be
  * written with the literal `Window.orderBy` (fully qualified is fine)
  * — an aliased handle (`val w = Window; w.orderBy(...)`) would evade
  * the textual pin (caught once in r11: the first Sn draft). Aliases
  * remain fine for `partitionBy` specs, which the pin ignores.
  *
  * Since r12 this scan is the FAST PRE-CHECK: the authoritative gate is
  * [[WindowPlanSpec]], which walks the executed physical plan of every
  * registered query and pins unpartitioned Window/WindowGroupLimit exec
  * nodes per query — no source spelling can evade it.
  */
class WindowGrainSpec extends AnyFunSuite {

  /** file (repo-relative) → (site count, the bounded-grain argument
    * that justifies each site in that file). */
  private val Allowed: Map[String, (Int, String)] = Map(
    "ops/RankDist.scala" -> (2, "the two leaderboard ranks over the " +
      "bounded item grid (brands/types — corpus already reduced by " +
      "one hash-agg)"),
    "ops/Behavior.scala" -> (11, "scalar lit(1) roll (1 row) + five " +
      "calendar-bounded day-grain cumulative scans (CUSUM/records) + " +
      "the two Aalen-Johansen and three RMST prefix/lead windows on " +
      "the bounded time grain (the kaplanMeier machinery)"),
    "ops/Infer.scala" -> (10, "two scalar lit(1) rolls, one day-grain " +
      "cumulative, BH-FDR + Holm ranks over the |hypotheses| list " +
      "(deliberate tiny-input global windows), jackknife block index " +
      "over the |blocks| frame, conformal lag pair + calibration rank " +
      "on the calendar-bounded day grain"),
    "ops/Ranks.scala" -> (3, "the banded-rank machinery itself: " +
      "windows run over the |bands| bucket TABLE (tiny), never rows"),
    "ops/TimeSeries.scala" -> (4, "7-day rolling + prefix scans on the " +
      "calendar-bounded day grain (incl. kpss partial sums and the " +
      "pageHinkley cumulative deviation)"),
    "ops/Profile.scala" -> (4, "scalar lit(1) roll, share rank over " +
      "the bounded key grid, HBOS rank over the ≤topK result " +
      "(post-limit), Sn low-median over the bounded grain the caller " +
      "contracts (day spine / key grid — Sn is pairwise by definition)"),
    "ops/Nonparam.scala" -> (2, "lag/rank scans on the " +
      "calendar-bounded day grain"),
    "ops/Curation.scala" -> (3, "quota/water-fill level search over " +
      "the |keys| table (corpus already reduced by one hash-agg); " +
      "Neyman remainder rank over the |strata| grid"),
    "ops/Robust.scala" -> (1, "Cox risk-set suffix sums on the " +
      "bounded event-time grain (the KM/q387 idiom)"),
    "ops/Forecast.scala" -> (2, "Croston demand-event index/lag on " +
      "the day grain; the 7-day centered MA on the calendar spine " +
      "(the q327 idiom)"),
    "queries/ExtremeQueries.scala" -> (2, "record-days prefix scans on " +
      "the day grain"),
    "queries/GraphDepthQueries.scala" -> (1, "cumulative over the " +
      "≤maxHops distance histogram"),
    "ops/Skew.scala" -> (2, "contribution rank over the bounded key " +
      "grid (heavy-hitter keys); Lorenz cumulative over the 10-row " +
      "decile grid"),
    "ops/Sketches.scala" -> (1, "median-of-trials over the fixed " +
      "|trials| repetition frame"),
    "ops/Retrieval.scala" -> (4, "position index over the ≤k reranked " +
      "hit list; PRF final rank over the ≤k second-pass result " +
      "(post-limit); ERR cascade prefix over the ≤k ranked list " +
      "(post-limit); Dirichlet-LM rank over the ≤k post-limit frame"),
    "queries/LexiconQueries.scala" -> (1, "rank index over the ≤k " +
      "BM25 post-limit frame (the q394 idiom, one shared helper)"),
    "ops/Quantize.scala" -> (1, "codeword rank within one centroid's " +
      "≤|codebook| cell"),
    "ops/Pack.scala" -> (1, "the two-level prefix-sum bucket table " +
      "(|buckets| rows) — the documented alternative TO a global " +
      "row window"),
    "ops/Diagnostics.scala" -> (2, "lag windows on the " +
      "calendar-bounded day grain (Granger pairs, ARCH-LM " +
      "squared-residual lag)"),
    "ops/Choice.scala" -> (1, "final strength rank over the bounded " +
      "|items| grain (duel matrix is items², items ≪ rows)"),
    "ops/TextOps.scala" -> (1, "keyword position index over the " +
      "≤topK TextRank result (post-limit)"),
    "ops/Similarity.scala" -> (1, "Mahalanobis outlier rank over the " +
      "≤topK result (post-limit, the hbos idiom)"),
    "ops/CorpusAudit.scala" -> (1, "cumulative over the |shards| " +
      "grid"),
    "queries/AgreementQueries.scala" -> (3, "three judge ranks over " +
      "the ≤25-nation grid (corpus already reduced by the " +
      "orders⋈customer⋈nation group-by)"),
    "ops/Sequence.scala" -> (2, "Hoeffding-split prefix scan + " +
      "permutation-entropy triple leads on the calendar-bounded day " +
      "grain"),
    "ops/Circular.scala" -> (1, "Kuiper ECDF cumulative over the " +
      "≤1440-cell clock-bin grid (corpus already reduced by one " +
      "hash-agg)"),
    "ops/Control.scala" -> (5, "I-MR lag + Western-Electric rolling " +
      "run windows on the calendar-bounded day grain; capability's " +
      "day index + per-segment moving-range lag on the same grain"),
    "ops/Randomness.scala" -> (6, "runs/diff-sign/Cox-Stuart/RVN: " +
      "distinct-value-grid cumulative counts (bounded count grid) " +
      "plus day-grain lag/lead/index scans"),
    "ops/Posthoc.scala" -> (2, "Quade block-range rank over the " +
      "≤|weeks| block grid; Page treatment index over the ≤k " +
      "treatment list"),
    "ops/Forensics.scala" -> (1, "records-test prefix max/min on the " +
      "calendar-bounded day grain"))

  private def scan(): Map[String, Int] = {
    val root = Paths.get("src/main/scala/graft")
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .map { p =>
        val hits = Files.readAllLines(p).asScala
          .map(_.trim)
          .count(l => l.contains("Window.orderBy") &&
            !l.startsWith("//") && !l.startsWith("*"))
        root.relativize(p).toString -> hits
      }
      .filter(_._2 > 0)
      .toMap
  }

  test("every unpartitioned Window.orderBy site is enumerated with a " +
      "bounded-grain argument") {
    val found = scan()
    val expected = Allowed.map { case (f, (n, _)) => f -> n }
    val unexpected = found.filterNot { case (f, n) => expected.get(f).contains(n) }
    val missing = expected.filterNot { case (f, n) => found.get(f).contains(n) }
    assert(unexpected.isEmpty && missing.isEmpty,
      s"""unpartitioned Window.orderBy sites drifted from the reviewed pin.
         |  new/changed: $unexpected
         |  expected-but-absent: $missing
         |Either band the new site (Ranks.bandedRank / bandedRunningSum)
         |or review its input grain and update WindowGrainSpec.Allowed
         |with the bounded-grain argument.""".stripMargin)
  }
}
