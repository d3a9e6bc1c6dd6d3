#!/bin/bash
# Round-4 baseline arms — everything that does NOT depend on the
# identification-objective fix: rollout no-identification baselines
# (verdict ask #2, 3 seeds x 3000 iters) and the GAN texture study
# (ask #5). Run these while the diversity objective is being repaired
# (the ratio-form arms measurably watermarked on both chip seeds —
# docs/TRAINING_EVIDENCE.md round 4).
# Usage: bash scripts/run_r4_baselines.sh [OUT_DIR] [ITERS]
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

mode_arm rollout 0
mode_arm rollout 1
mode_arm rollout 2
run python scripts/gan_texture_study.py --variant nogan \
    --iterations "$ITERS" -o "$OUT/texstudy"
run python scripts/gan_texture_study.py --variant gan \
    --iterations "$ITERS" -o "$OUT/texstudy"
run python scripts/gan_texture_study.py --variant rollout \
    --iterations "$ITERS" -o "$OUT/texstudy"

echo "BASELINES DONE $(date)" >> "$OUT/progress.log"
