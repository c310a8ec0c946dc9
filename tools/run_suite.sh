#!/bin/bash
# Full-tier suite runner.
#
# The XLA CPU compiler segfaults after enough in-process compiles (observed
# at 100+ tests when a late test compiles a big program — the fully-fused
# model, the 8-device pjit train step). Two tests already isolate their
# compile in a fresh subprocess (tests/test_fused_model.py,
# tests/test_graft_entry.py); this script bounds the rest by running the
# slow tier one pytest process PER FILE. The fast tier (default -m "not
# slow", < 2 min) runs in one process as usual.
#
# Usage: tools/run_suite.sh [extra pytest args...]
set -u
cd "$(dirname "$0")/.."
fail=0

echo "== fast tier (one process) =="
python -m pytest tests/ -q "$@" || fail=1

for f in tests/test_*.py; do
  python -m pytest "$f" -q -m slow -p no:cacheprovider "$@"
  rc=$?
  if [ $rc -eq 5 ]; then continue; fi            # no slow tests in this file
  if [ $rc -ne 0 ]; then
    echo "FAILED: $f (rc=$rc)"
    fail=1
  fi
done

if [ $fail -eq 0 ]; then echo "SUITE OK"; else echo "SUITE FAILED"; fi
exit $fail
