#!/bin/bash
# Round-4 study batch, chip-sized: the TPU came back, so every arm runs at
# the round-3 standard (K=1, 3000 iterations) for direct comparability with
# the round-3 teacher-forced grid (docs/TRAINING_EVIDENCE.md). Value order
# (verdict r3) so a partial run still yields evidence:
#   1. InfoGAN identification, seeds 0/1 + M=16 attribution grids (ask #1).
#   2. Rollout no-identification baselines, seeds 0/1 (ask #2; also the
#      val-mel comparison arm for ask #1's done-criterion).
#   3. Texture study nogan/gan/rollout (ask #5).
#   4. Third seeds (asks #1/#2 "spread, not one trajectory").
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

mode_arm infogan 0
mode_arm rollout 0
mode_arm infogan 1
mode_arm rollout 1
run python scripts/gan_texture_study.py --variant nogan \
    --iterations "$ITERS" -o "$OUT/texstudy"
run python scripts/gan_texture_study.py --variant gan \
    --iterations "$ITERS" -o "$OUT/texstudy"
run python scripts/gan_texture_study.py --variant rollout \
    --iterations "$ITERS" -o "$OUT/texstudy"
mode_arm infogan 2
mode_arm rollout 2

echo "ALL DONE $(date)" >> "$OUT/progress.log"
