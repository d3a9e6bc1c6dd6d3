#!/bin/bash
# Round-4 study batch, chip-sized: every arm runs at the round-3 standard
# (K=1, 3000 iterations) for direct comparability with the round-3
# teacher-forced grid (docs/TRAINING_EVIDENCE.md). Value order (verdict r3),
# so a partial run still yields evidence:
#   1. infogan_sat seeds 0/1/2 — the identification fix (ask #1's
#      done-criterion: chi-square p < 0.01 on >=2 seeds). Three designed
#      predecessors were run and MEASURED to fail: plain infogan (Q-head
#      cold-start saddle, CPU host), infogan_ds (unclamped diversity swamps
#      fidelity, CPU host), infogan_code (ratio-clamped diversity
#      "watermarks" off-manifold, 2 chip seeds). infogan_sat saturates the
#      diversity reward in OUTPUT units at the measured cross-mode distance
#      (gan_mode_study.VARIANTS, config.py diversity_cap).
#   2. Attribution probes after each arm (M=16 x 16 grids).
# The rollout no-identification baselines (ask #2) and the texture study
# (ask #5) run via run_r4_baselines.sh — they do not depend on the fix.
# Training auto-resumes from the newest checkpoint, so re-running this
# script after a tunnel drop continues rather than restarts.
# The CPU-sized variant (run_round4_studies.sh) remains for outage hosts.
# Usage: bash scripts/run_round4_studies_tpu.sh [OUT_DIR] [ITERS]
set -u
OUT=${1:-/tmp/studies_r4_tpu}
ITERS=${2:-3000}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$OUT/progress.log"
  "$@" >> "$OUT/progress.log" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$OUT/progress.log"
}

mode_arm() {  # variant seed
  local v=$1 s=$2 sfx=""
  [ "$s" != 0 ] && sfx="_s$s"
  run python scripts/gan_mode_study.py --variant "$v" --seed "$s" \
      --iterations "$ITERS" -o "$OUT/modestudy"
  run python scripts/mode_attribution.py \
      --run_dir "$OUT/modestudy/$v$sfx" --variant "$v" \
      --iterations "$ITERS" --n_styles 16 --n_dropout 16 --seed "$s"
}

mode_arm infogan_sat 0
mode_arm infogan_sat 1
mode_arm infogan_sat 2

echo "ALL DONE $(date)" >> "$OUT/progress.log"
