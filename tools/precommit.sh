#!/bin/bash
# Snapshot gate: a commit may not land unless main+test sources compile
# and the flagship entry returns rows on sf0.001. Invoke before every
# `git commit` (or wire as .git/hooks/pre-commit). Exists because round
# 10 shipped a snapshot that had never seen the compiler.
set -e
cd /root/repo
echo "[precommit] sbt Test/compile"
sbt -batch Test/compile > /tmp/precommit_compile.log 2>&1 || {
  tail -30 /tmp/precommit_compile.log
  echo "[precommit] FAIL: compile"
  exit 1
}
echo "[precommit] SparkEntry smoke (sf0.001)"
sbt -batch "runMain graft.tools.EntrySmoke /root/testdata/sf0.001" \
  > /tmp/precommit_smoke.log 2>&1 || {
  tail -30 /tmp/precommit_smoke.log
  echo "[precommit] FAIL: entry smoke"
  exit 1
}
grep -q "ENTRY_SMOKE_OK" /tmp/precommit_smoke.log || {
  tail -30 /tmp/precommit_smoke.log
  echo "[precommit] FAIL: smoke marker missing"
  exit 1
}
echo "[precommit] OK"
