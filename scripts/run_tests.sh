#!/usr/bin/env bash
# Deterministic full-suite runner (VERDICT r4 item 8).
#
# The CPU-backend XLA `backend_compile` intermittently segfaults under this
# box's memory pressure (observed once in the round-4 judge run: one SIGSEGV
# mid-suite, crashed tail green in isolation, 193/193 overall). pytest dies
# with the interpreter, so --last-failed can't resume. This wrapper runs the
# suite file-by-file in the normal collection order and retries any file
# whose run exits on a signal (exit code >= 128) up to MAX_RETRY times in a
# fresh interpreter; genuine test failures (exit 1) are NOT retried.
#
# Usage: scripts/run_tests.sh [extra pytest args...]
set -uo pipefail
cd "$(dirname "$0")/.."

MAX_RETRY=${MAX_RETRY:-2}
overall=0
declare -a failed_files=()
declare -a flaked_files=()

mapfile -t files < <(ls tests/test_*.py)

for f in "${files[@]}"; do
  attempt=0
  while :; do
    python -m pytest "$f" -q --tb=short "$@"
    rc=$?
    if [ "$rc" -eq 0 ] || [ "$rc" -eq 5 ]; then  # 5 = no tests collected
      break
    elif [ "$rc" -ge 128 ] && [ "$attempt" -lt "$MAX_RETRY" ]; then
      attempt=$((attempt + 1))
      echo "*** $f crashed (exit $rc, signal $((rc - 128))) — retry $attempt/$MAX_RETRY in a fresh interpreter"
      flaked_files+=("$f (exit $rc)")
    else
      overall=1
      failed_files+=("$f (exit $rc)")
      break
    fi
  done
done

echo
if [ "${#flaked_files[@]}" -gt 0 ]; then
  echo "Retried after crash-class exits: ${flaked_files[*]}"
fi
if [ "$overall" -ne 0 ]; then
  echo "FAILED files: ${failed_files[*]}"
else
  echo "ALL TEST FILES GREEN"
fi
exit "$overall"
