#!/bin/bash
# Local correctness gate: run Verify at a scale factor, compare vs DuckDB.
set -e
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/graft_verify}"
cd /root/repo
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | grep -E "\[verify\]|error\]" || true
python3 tools/compare.py "$SF" "$OUT"
