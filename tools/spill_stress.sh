#!/bin/bash
# Memory-pressure / spill stress (r15 verdict #1): run the sf1 headliners
# through graft.SpillStress in a CONSTRAINED session — 4g heap,
# spark.memory.fraction 0.2 (~740 MB unified memory over 8 task slots),
# 8 shuffle partitions (few and LARGE) — and capture per-query spill
# metrics into SPILL_STRESS.json. The pass criterion is completion (with
# spill welcome); OOM death, driver-side corpus materialization, or
# runaway wall time are the failures this probes for. Findings go into
# SCALE.md's round-16 table.
#
# NOTE: do not run concurrently with any other sbt session (shared
# target/). A JVM death mid-list still leaves the completed queries'
# lines in SPILL_STRESS.json — graft.SpillStress prints each row as it
# finishes.
set -e
SF1="${1:-/tmp/sf1_derived}"
cd /root/repo
if [ ! -f "$SF1/documents.parquet" ]; then
  echo "[spill] deriving 10x corpus into $SF1"
  python3 tools/derive_sf1.py /root/testdata/sf0.1 "$SF1"
fi
SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-4g}" \
  SPARK_GRAFT_SF_DIR="$SF1" \
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  SPARK_GRAFT_MEMORY_FRACTION="${SPARK_GRAFT_MEMORY_FRACTION:-0.2}" \
  SPARK_GRAFT_SHUFFLE="${SPARK_GRAFT_SHUFFLE:-8}" \
  sbt -batch "runMain graft.SpillStress" 2>&1 | tee /tmp/spill_stress.log |
  grep -E '^\[info\] \{"' | sed 's/^\[info\] //' > SPILL_STRESS.json || true
echo "[spill] rows:"
cat SPILL_STRESS.json
