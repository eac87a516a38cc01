#!/usr/bin/env bash
# Gated bench-ledger update: canary -> full pass -> canary -> regress -> commit.
#
# The committed bench_full.json is the repo's quiet-machine baseline;
# r17/r18 both had load-window passes land in it. This wrapper only
# lets a pass through when the q1 canary reads quiet BOTH before and
# after the full run (load arriving mid-pass fails the post-canary),
# and the per-query regress gate is clean.
#
# Usage: tools/bench_gated.sh [sf_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.1}"
TMP=$(mktemp /tmp/bench_full.XXXX.json)

echo "== pre-canary =="
python3 tools/bench_canary.py bench_full.json 2.0 "$SF"

echo "== full bench pass =="
# sbt logs to a file and its exit status is checked directly — a
# `sbt | grep || true` pipe would swallow a failed bench run and only
# resurface later as a confusing JSONDecodeError on the empty $TMP.
SBTLOG=$(mktemp /tmp/bench_sbt.XXXX.log)
if ! SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_OUT="$TMP" \
    sbt -batch "runMain graft.Bench" >"$SBTLOG" 2>&1; then
  echo "BENCH FAILED: sbt exited non-zero; tail of $SBTLOG:" >&2
  tail -n 30 "$SBTLOG" >&2
  exit 1
fi
grep '"metric"' "$SBTLOG" || true
# $TMP must be parseable JSON with a queries map before the gates read it
python3 -c "import json,sys; d=json.load(open('$TMP')); assert d.get('queries'), 'no queries map'" \
  || { echo "BENCH FAILED: $TMP is not a valid bench detail file" >&2; exit 1; }

echo "== post-canary =="
python3 tools/bench_canary.py bench_full.json 2.0 "$SF"

echo "== regress gate =="
if ! python3 tools/regress.py bench_full.json "$TMP"; then
  # Sub-2s cells jitter 1.5-2x between quiet passes (r19: two
  # back-to-back quiet passes flagged completely disjoint key sets).
  # Adjudicate per the documented protocol: re-time each flagged key
  # in isolation and accept only if no flag reproduces.
  echo "== adjudicating flags (isolated re-timing) =="
  python3 tools/adjudicate.py bench_full.json "$TMP" 1.35 "$SF"
fi

cp "$TMP" bench_full.json
echo "bench_full.json updated from quiet pass ($TMP)"
