#!/bin/bash
# Round-4 late factorial arms, batch 2 (after the first fix-arm batch
# measured bit2x2_mod 0/3 and unarmed bit2x2_rescue 1/3-vs-3/3 HARMFUL):
#   1. bit2x2_add seeds 0/1/2 — the additivity (mixed-second-difference)
#      binding penalty, designed after the |cos| surrogate's measured
#      failure.
#   2. bit2x2_rescue seeds 0/1/2 — the warmup-GATED factor rescue
#      (factor_rescue_warmup=2000 default): no-harm check vs the subset
#      baseline (the controller must reproduce the plain subset redraw
#      until armed) + benefit check on the seeds that collapse late.
#   3. RECOVERY: resume the measured collapsed-factor attractor
#      (bit2x2_subset seed 0 at 6000 iters, band A dead) with the armed
#      rescue for 3000 more iterations — the controller's actual design
#      point (post-formation recovery).
# Same standard as the base campaign (3000 iters, n_utts 200, 16x8
# grids). Auto-resumes after a tunnel drop.
# Usage: bash scripts/run_factorial_r4b_tpu.sh [OUT_DIR]
set -u
OUT=${1:-/tmp/factorial_r4b}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$OUT/progress.log"
  "$@" >> "$OUT/progress.log" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$OUT/progress.log"
}

for s in 0 1 2; do
  run python scripts/gan_factorial_study.py --variant bit2x2_add \
      --seed "$s" --iterations 3000 -o "$OUT"
done
echo "ADD DONE $(date)" >> "$OUT/progress.log"

for s in 0 1 2; do
  run python scripts/gan_factorial_study.py --variant bit2x2_rescue \
      --seed "$s" --iterations 3000 -o "$OUT"
done
echo "RESCUE-WARM DONE $(date)" >> "$OUT/progress.log"

# Recovery: seed-0 subset checkpoint (6000 iters, band A collapsed) is
# the measured attractor; continue it under the armed controller.
REC="$OUT/recovery"
mkdir -p "$REC/bit2x2_rescue"
# -r is REQUIRED: the checkpoint is an Orbax OCDBT DIRECTORY, not a
# file. The first run of this script omitted it; the copy silently
# failed (stderr suppressed) and the "recovery" trained from scratch
# (docs/TRAINING_EVIDENCE.md "Trajectory identity").
cp -r /tmp/factorial_r4/bit2x2_subset/iter=6000* "$REC/bit2x2_rescue/" \
    2>/dev/null || true
run python scripts/gan_factorial_study.py --variant bit2x2_rescue \
    --seed 0 --iterations 9000 -o "$REC"
echo "ALL DONE $(date)" >> "$OUT/progress.log"
