#!/bin/bash
# Reward-shaped binding arms (config.py code_orthogonal_reward): the
# subset baseline with sine-scaled per-dim contrasts, designed after
# both binding PENALTIES measured as collapse accelerants
# (docs/TRAINING_EVIDENCE.md "Binding penalties"). Campaign standard:
# 3000 iters, n_utts 200, 16x8 grids, seeds 0-2.
# Usage: bash scripts/run_factorial_ortho_tpu.sh [OUT_DIR]
set -u
OUT=${1:-/tmp/factorial_ortho}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$OUT/progress.log"
  "$@" >> "$OUT/progress.log" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$OUT/progress.log"
}

for s in 0 1 2; do
  run python scripts/gan_factorial_study.py --variant bit2x2_ortho \
      --seed "$s" --iterations 3000 -o "$OUT"
done
echo "ORTHO DONE $(date)" >> "$OUT/progress.log"
