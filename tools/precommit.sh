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
# Targeted specs (round-11 verdict #8): run every spec suite that
# references a main-source class changed since the last commit, so a
# semantics regression can't ship between full-suite runs. Skip with
# GRAFT_PRECOMMIT_NOSPEC=1 (doc-only commits) or when nothing matches.
if [ "${GRAFT_PRECOMMIT_NOSPEC:-0}" != "1" ]; then
  # Union in untracked files: a brand-new main-source class must also get
  # its referencing specs run, not just modified tracked ones.
  CHANGED=$({ git diff --name-only HEAD -- 'src/main/scala';
      git ls-files --others --exclude-standard -- 'src/main/scala'; } |
    grep '\.scala$' | xargs -r -n1 basename | sed 's/\.scala$//' | sort -u)
  SPECS=""
  for c in $CHANGED; do
    SPECS="$SPECS $(grep -rlE "\b$c\b" src/test/scala/graft \
      --include='*.scala' 2>/dev/null | xargs -r -n1 basename |
      sed 's/\.scala$//')"
  done
  SPECS=$(echo "$SPECS" | tr ' ' '\n' | grep -E 'Spec$|Properties$' |
    sort -u | sed 's/^/graft./' | tr '\n' ' ')
  if [ -n "$SPECS" ]; then
    echo "[precommit] targeted specs:$(echo " $SPECS" | sed 's/ graft\./ /g')"
    sbt -batch "testOnly $SPECS" > /tmp/precommit_specs.log 2>&1 || {
      grep -E "\*\*\* FAILED|Tests:" /tmp/precommit_specs.log | tail -20
      echo "[precommit] FAIL: targeted specs"
      exit 1
    }
    grep -E "^\[info\] Tests: " /tmp/precommit_specs.log | tail -1
  else
    echo "[precommit] no spec references changed classes"
  fi
fi
echo "[precommit] OK"
