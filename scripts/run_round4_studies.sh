#!/bin/bash
# Round-4 study batch, sized for a single-core host during the TPU outage.
# Measured: a K=1 rollout-class run is ~0.14 it/s => 6 h for 3000 iters —
# the round-3-style grid cannot fit. All round-4 arms therefore run at
# n_frames_per_step=2 (the recommended production setting; ~1.7x faster,
# and this doubles as the K=2 validation run) and 2500 iterations, keeping
# every cross-arm comparison internal to the round. Value order
# (verdict r3):
#   1. InfoGAN identification, seeds 0/1 + M=16 attribution grids (ask #1).
#   2. Rollout no-identification baseline + replication arms (ask #2; also
#      the val-mel comparison arm for ask #1's done-criterion).
#   3. Texture study (ask #5; nogan is cheap — no D steps).
# Training auto-resumes from the newest checkpoint, so re-running this
# script after an interruption continues rather than restarts.
# Usage: bash scripts/run_round4_studies.sh [OUT_DIR] [ITERS]
set -u
OUT=${1:-/tmp/studies_r4}
ITERS=${2:-2500}
HPS="n_frames_per_step=2"
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
      --iterations "$ITERS" --hparams "$HPS" -o "$OUT/modestudy"
  run python scripts/mode_attribution.py \
      --run_dir "$OUT/modestudy/$v$sfx" --variant "$v" \
      --iterations "$ITERS" --hparams "$HPS" \
      --n_styles 16 --n_dropout 16 --seed "$s"
}

mode_arm infogan_sat 0
mode_arm infogan_sat 1
mode_arm rollout 0
mode_arm rollout 1
run python scripts/gan_texture_study.py --variant nogan \
    --iterations "$ITERS" --hparams "$HPS" -o "$OUT/texstudy"
run python scripts/gan_texture_study.py --variant gan \
    --iterations "$ITERS" --hparams "$HPS" -o "$OUT/texstudy"
mode_arm infogan_sat 2
run python scripts/gan_texture_study.py --variant rollout \
    --iterations "$ITERS" --hparams "$HPS" -o "$OUT/texstudy"

echo "ALL DONE $(date)" >> "$OUT/progress.log"
