#!/usr/bin/env bash
# End-of-round gate (round-16 verdict item 4): the r16 snapshot commit
# added a main-source file AFTER the last full-suite run and shipped a
# red tree (897/898 — its own lint caught it, but nothing re-ran the
# lint). This script is the rule: run it on the EXACT tree you are
# about to commit as the snapshot; a green exit is the precondition for
# the snapshot commit. It runs, in order:
#   1. full `sbt test` (includes the cache-regime + plan-audit lints),
#   2. Verify at sf0.01 + the DuckDB oracle compare (tools/check.py),
#   3. the stress_diff gate selftest.
# Usage: tools/gate.sh [sf-dir]       (default /root/testdata/sf0.01)
# Logs land in /tmp/graft_gate/ stamped with the tree state so the
# round record can cite "gate ran at <sha/dirty>".
set -u
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=/tmp/graft_gate
VDIR=$OUT/verify
mkdir -p "$OUT"
rm -rf "$VDIR"

SHA=$(git rev-parse --short HEAD)
DIRTY=$(git status --porcelain | wc -l)
STAMP="$SHA dirty_files=$DIRTY $(date -u +%Y-%m-%dT%H:%M:%SZ)"
echo "[gate] tree: $STAMP"

fail=0
step() {
  local name=$1; shift
  echo "[gate] $name: $*"
  if "$@" >"$OUT/$name.log" 2>&1; then
    echo "[gate] $name: OK"
  else
    echo "[gate] $name: FAIL (see $OUT/$name.log, tail:)"
    tail -5 "$OUT/$name.log" | sed 's/^/        /'
    fail=1
  fi
}

step sbt_test sbt -batch test
step verify sbt -batch "runMain graft.Verify $SF $VDIR"
step oracle python3 tools/check.py "$VDIR" "$SF"
step diff_selftest python3 tools/stress_diff_selftest.py

if [ "$fail" -eq 0 ]; then
  echo "[gate] ALL GREEN at $STAMP — snapshot commit may proceed"
else
  echo "[gate] RED at $STAMP — do NOT snapshot this tree"
fi
exit $fail
