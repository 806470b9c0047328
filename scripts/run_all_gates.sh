#!/bin/bash
# Run the correctness gate across every environment variant (the assurance
# matrix in COVERAGE.md). Usage: scripts/run_all_gates.sh [sf_dir]
# Each variant is a fresh process/JVM; ~25-40 min total at sf0.01.
set -u
SF=${1:-/root/testdata/sf0.01}
cd "$(dirname "$0")/.."
fail=0
run() {
  echo "=== $1 ==="
  shift
  env "$@" python scripts/check_correctness.py "$SF" 2>&1 | tail -1
  [ "${PIPESTATUS[0]}" -ne 0 ] && fail=1
}
run "default"            __=
run "odd parallelism"    GATE_MASTER='local[7]' GATE_SHUFFLE=13
run "offset timezone"    GATE_TZ=Asia/Kolkata
run "DST timezone"       GATE_TZ=America/New_York
run "tiny arrow batches" GATE_ARROW_BATCH=37
run "ansi off"           GATE_ANSI=false
if [ "$fail" -ne 0 ]; then echo "GATE VARIANTS FAILED"; exit 1; fi
echo "all gate variants green"
