#!/bin/bash
# Full-suite runner: one pytest process PER TEST FILE.
#
# Why not `pytest tests/` in one process: after ~100 compile-heavy tests in
# a single process, the XLA:CPU compiler segfaulted deterministically while
# compiling the large 2-D ADI program (tests/agreement/test_heston_barrier_pde
# first test; reproduced twice at the same position, 2026-08-20).  Every
# file passes in isolation and in small combinations — the crash needs the
# accumulated in-process XLA state, so the mitigation is process isolation
# per file.  The persistent compilation cache (tests/conftest.py) keeps the
# per-process compile cost low.
#
# Usage: scripts/run_full_suite.sh [extra pytest args...]
# Exit code: 0 iff every file passed.

set -u
cd "$(dirname "$0")/.."
fail=0
for f in tests/unit/test_*.py tests/agreement/test_*.py; do
  start=$(date +%s)
  if python -m pytest "$f" -q "$@" > /tmp/suite_one.out 2>&1; then
    status=OK
  else
    status=FAIL
    fail=1
    tail -20 /tmp/suite_one.out
  fi
  echo "$status  $(( $(date +%s) - start ))s  $f  :: $(tail -2 /tmp/suite_one.out | head -1)"
done
exit $fail
