#!/usr/bin/env bash
# Regenerate the committed golden outputs for gates whose semantics DuckDB
# cannot recompute (deflate has no DuckDB surface). Run ONLY after a
# deliberate semantic change to the operator — a golden diff without one
# is a regression, not something to ratify.
set -euo pipefail
cd "$(dirname "$0")/.."
GATES="text_compression_ratio text_bpe_tokens dedup_lsh_planned_onepass"
for sf in 0.001 0.01 0.1; do
  out=/tmp/golden_$sf
  rm -rf "$out"
  sbt -batch "runMain graft.Verify /root/testdata/sf$sf $out ${GATES// /,}"
  for gate in $GATES; do
    cp "$out"/$gate/part-*.parquet \
      "tools/golden/${gate}_sf${sf//./_}.parquet"
  done
done
