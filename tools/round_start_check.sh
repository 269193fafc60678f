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

echo "== 1/3 fixture schema drift guard =="
sbt -batch 'testOnly graft.FixtureSchemaSpec' 2>&1 | grep -E '^\[info\] (-|Tests|All)' || {
  echo "FixtureSchemaSpec FAILED — fixture schemas moved; diff the parquet schemas first"; exit 1; }

echo "== 2/3 full query dump at sf0.01 =="
rm -rf "$OUT"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT" > /dev/null 2>&1 || {
  echo "Verify main FAILED — run it without redirection to see which query"; exit 1; }

echo "== 3/3 strict hash gate (driver replica) =="
python3 tools/hashcheck.py /root/testdata/sf0.01 "$OUT" | tail -3
