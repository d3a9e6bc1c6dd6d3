#!/bin/bash
# Round-4 study batch, value-ordered for a single-core host during the TPU
# outage (~3h per 3000-iter rollout-class run; the full round-3-style grid
# does not fit, so the order implements the verdict's priorities):
#   1. InfoGAN latent-identification, seeds 0 and 1, full 3000 iters +
#      M=16 attribution grids (ask #1 — needs >=2 seeds at chi2 p<0.01).
#   2. Rollout replication arms, full 3000 + M=16 grids (ask #2), as many
#      seeds as the clock allows.
#   3. Texture study nogan/gan (ask #5; nogan has no D steps and is cheap).
#   4. InfoGAN seed 2 / rollout texture, if still running.
# Every training auto-resumes from its newest checkpoint, so re-running this
# script after an interruption continues rather than restarts.
# Usage: bash scripts/run_round4_studies.sh [OUT_DIR] [ITERS]
set -u
OUT=${1:-/tmp/studies_r4}
ITERS=${2:-3000}
mkdir -p "$OUT"
export GANTRON_PLATFORM=cpu
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

mode_arm infogan 0
mode_arm infogan 1
mode_arm rollout 1
mode_arm rollout 2
run python scripts/gan_texture_study.py --variant nogan \
    --iterations "$ITERS" -o "$OUT/texstudy"
run python scripts/gan_texture_study.py --variant gan \
    --iterations "$ITERS" -o "$OUT/texstudy"
mode_arm infogan 2
run python scripts/gan_texture_study.py --variant rollout \
    --iterations "$ITERS" -o "$OUT/texstudy"

echo "ALL DONE $(date)" >> "$OUT/progress.log"
