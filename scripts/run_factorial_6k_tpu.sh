#!/bin/bash
# 6000-iter continuations, the round-4 "does training time resolve
# binding?" replication set (docs/TRAINING_EVIDENCE.md):
#   1. subset s2: 3000 -> 6000 (fresh 3000 first; the original /tmp
#      checkpoints did not survive the host). s1's 6k run reached FULL
#      factorization (coverage 1.0, injective binding); s2 tests
#      whether that reproduces on a second healthy seed.
#   2. ortho s0/s1/s2: resume the committed 3000-iter checkpoints to
#      6000 — does reward-shaped binding + time factorize more
#      reliably than time alone?
# Usage: bash scripts/run_factorial_6k_tpu.sh [OUT_DIR] [ORTHO_DIR]
set -u
OUT=${1:-/tmp/factorial_6k}
ORTHO=${2:-/tmp/factorial_ortho}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$OUT/progress.log"
  "$@" >> "$OUT/progress.log" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$OUT/progress.log"
}

run python scripts/gan_factorial_study.py --variant bit2x2_subset \
    --seed 2 --iterations 3000 -o "$OUT"
run python scripts/gan_factorial_study.py --variant bit2x2_subset \
    --seed 2 --iterations 6000 -o "$OUT"

for s in 0 1 2; do
  run python scripts/gan_factorial_study.py --variant bit2x2_ortho \
      --seed "$s" --iterations 6000 -o "$ORTHO"
done
echo "ALL DONE $(date)" >> "$OUT/progress.log"
