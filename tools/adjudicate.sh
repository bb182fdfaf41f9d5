#!/usr/bin/env bash
# Bench-spike adjudication, the BASELINE.md protocol as one command:
# an in-suite spike (driver bench time >1.5x the idle steady state) is
# re-measured ISOLATED — fresh JVM, only the named queries, best-of-3 —
# and the verdict is "contention" (isolated time ~= steady state) or
# "real regression" (isolated time reproduces the spike -> fix the plan).
#
# Usage: tools/adjudicate.sh q84_cdc_snapshot_diff q57_stream_watermark_append ...
#   env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
#        SPARK_GRAFT_CPUS   (default 32)
#        ADJUDICATE_OUT     (default tools/adjudication_<utc-stamp>.json)
#
# Output: the bench JSON line for the named queries, written to
# ADJUDICATE_OUT and echoed; record the numbers in BASELINE.md next to
# the suite times they adjudicate.
set -euo pipefail
cd "$(dirname "$0")/.."

if [ "$#" -lt 1 ]; then
  echo "usage: tools/adjudicate.sh <query_name> [...]" >&2
  exit 2
fi

OUT="${ADJUDICATE_OUT:-tools/adjudication_$(date -u +%Y%m%d_%H%M%S).json}"

# FORK_EVERY=0: the sbt run itself is the one fresh JVM (run/fork := true);
# EXACT=1: names must match exactly, no prefix accidents; RUNS=3: best-of-3.
SPARK_GRAFT_BENCH_FILTER="$(IFS=,; echo "$*")" \
SPARK_GRAFT_BENCH_EXACT=1 \
SPARK_GRAFT_BENCH_RUNS=3 \
SPARK_GRAFT_BENCH_FORK_EVERY=0 \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_BENCH_OUT="$OUT" \
sbt -batch "runMain graft.Bench" 1>&2

echo "[adjudicate] written to $OUT" >&2
cat "$OUT"
