#!/bin/bash
# Round-4 late factorial FIX arms (after the 13-arm base campaign +
# 6000-iter continuations measured the two failure modes):
#   1. bit2x2_mod seeds 0/1/2 — the modularity triple
#      (code_modularity_weight: per-dim saturating contrast + orthogonal
#      per-dim deltas) against BOTH failures (factor collapse, entangled
#      binding).
#   2. bit2x2_rescue seeds 0/1/2 — the calibrated factor-aware rescue
#      controller (factor_rescue_floor=2.18, per-dim weighted redraw)
#      against factor collapse specifically.
# Same standard as the base campaign (3000 iters, n_utts 200, 16x8
# grids, same corpora/seeds) so rows are directly comparable.
# Training auto-resumes from the newest checkpoint, so re-running this
# script after a tunnel drop continues rather than restarts.
# Usage: bash scripts/run_factorial_fix_arms_tpu.sh [OUT_DIR] [ITERS]
set -u
OUT=${1:-/tmp/factorial_r4}
ITERS=${2:-3000}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$OUT/progress_fix.log"
  "$@" >> "$OUT/progress_fix.log" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$OUT/progress_fix.log"
}

for s in 0 1 2; do
  run python scripts/gan_factorial_study.py --variant bit2x2_mod \
      --seed "$s" --iterations "$ITERS" -o "$OUT"
done
echo "MOD DONE $(date)" >> "$OUT/progress_fix.log"

for s in 0 1 2; do
  run python scripts/gan_factorial_study.py --variant bit2x2_rescue \
      --seed "$s" --iterations "$ITERS" -o "$OUT"
done
echo "ALL DONE $(date)" >> "$OUT/progress_fix.log"
