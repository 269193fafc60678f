#!/usr/bin/env bash
# Round-start fixture ritual — run this FIRST, before building anything.
#
# The driver CAN regenerate /root/testdata between rounds (it did in round 9:
# events.ts silently moved TIMESTAMP(NANOS) -> TIMESTAMP(MICROS, ntz), which
# cost a debugging session before FixtureSchemaSpec existed). This script
# answers "did the fixtures move under us?" in ~5 minutes:
#
#   1. FixtureSchemaSpec — schema drift guard (seconds)
#   2. full Verify dump at sf0.01 + strict hashcheck — the driver's hash
#      gate, replicated byte-exactly (tools/hashcheck.py)
#
# Green here = build on. Red here = fix the loaders FIRST; nothing else
# this round is trustworthy until the gate is green again.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${1:-/tmp/round_start_verify}

echo "== 0/3 did the previous round actually close? =="
# round_close.sh exists so no round ships without its graded-artifact
# cadence — but a script nobody runs gates nothing (round 16 shipped three
# new graded queries with no retained sf0.1 hashcheck or 10x scale rows,
# judge r16). This assertion catches a skipped close one round later at
# the latest: the driver writes BENCH_r{N}.json at every round boundary,
# so the newest N names the last closed round, and that round's
# HASHCHECK/SUITE_SCALE artifacts must exist at HEAD.
last=$(ls BENCH_r*.json 2>/dev/null | grep -oE '[0-9]+' | sed 's/^0*//' \
  | sort -n | tail -1)
if [[ -n "${last:-}" ]]; then
  missing=0
  for f in "HASHCHECK_SF01_r${last}.txt" "SUITE_SCALE_r${last}.json"; do
    if [[ ! -e "$f" ]]; then
      echo "MISSING: $f — round ${last} shipped without tools/round_close.sh"
      missing=1
    fi
  done
  if (( missing )); then
    echo "run tools/round_close.sh for the CURRENT round before building on"
    echo "top of an unmeasured HEAD (GRAFT_ACK_OPEN_CLOSE=<reason> overrides"
    echo "once the gap is understood and written into STRESS.md)"
    [[ -n "${GRAFT_ACK_OPEN_CLOSE:-}" ]] || exit 1
    echo "override: ${GRAFT_ACK_OPEN_CLOSE}"
  fi
fi

echo "== 1/3 fixture schema drift guard =="
sbt -batch 'testOnly graft.FixtureSchemaSpec' 2>&1 | grep -E '^\[info\] (-|Tests|All)' || {
  echo "FixtureSchemaSpec FAILED — fixture schemas moved; diff the parquet schemas first"; exit 1; }

echo "== 2/3 full query dump at sf0.01 =="
rm -rf "$OUT"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT" > /dev/null 2>&1 || {
  echo "Verify main FAILED — run it without redirection to see which query"; exit 1; }

echo "== 3/3 strict hash gate (driver replica) =="
python3 tools/hashcheck.py /root/testdata/sf0.01 "$OUT" | tail -3
