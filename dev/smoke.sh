#!/usr/bin/env bash
# Pre-snapshot gate: NO new contract query ships without one local run.
#
# Usage: dev/smoke.sh q111,q112 [sfDir]
#
# For the named query prefixes this (1) dumps them via graft.Verify at
# sf0.01 and replays the DuckDB oracle compare (dev/check.py — the same
# gate the driver runs), then (2) times them via graft.Bench
# (SPARK_GRAFT_BENCH_ONLY) so an analysis-time failure can never reach
# the end-of-round commit unexecuted. Run this for every query added or
# touched in a round BEFORE committing it to the contract surface.
set -euo pipefail
cd "$(dirname "$0")/.."

only="${1:?usage: dev/smoke.sh <q-prefixes,comma-sep> [sfDir]}"
sf="${2:-/root/testdata/sf0.01}"
out="var/smoke/$(basename "$sf")"
rm -rf "$out"

echo "== smoke: verify [$only] at $sf =="
SPARK_GRAFT_VERIFY_ONLY="$only" sbt -batch "runMain graft.Verify $sf $out"

echo "== smoke: oracle compare =="
python3 dev/check.py "$sf" "$out"

echo "== smoke: bench-only [$only] =="
SPARK_GRAFT_SF_DIR="$sf" SPARK_GRAFT_BENCH_ONLY="$only" \
  SPARK_GRAFT_BENCH_REPS=1 sbt -batch "runMain graft.Bench"

echo "== smoke: PASS =="
