#!/bin/bash
# The builder's pre-commit correctness gate: run Verify at sf0.01 and BOTH
# checkers (tolerant + strict). The strict checker is the one that matches
# the driver's value hash — a change is NOT green until this prints 0 MISMATCH.
#
#   tools/gate.sh                      # full run (all queries)
#   tools/gate.sh q08_groupby_expr,q26_minhash_lsh   # subset
set -e
cd "$(dirname "$0")/.."
SF=${SF:-/root/testdata/sf0.01}
OUT=${OUT:-/tmp/verify_out}
ONLY="$1"
if [ -n "$ONLY" ]; then export SPARK_GRAFT_ONLY="$ONLY"; fi
sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | grep -E "\[verify\]|error\]" | grep -v "INFO\|WARN" || true
python3 tools/strict_check.py "$SF" "$OUT" ${ONLY//,/ }
