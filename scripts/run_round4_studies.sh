#!/bin/bash
# Round-4 study batch (sequential: single-core host, one compute job at a
# time). Produces:
#   1. InfoGAN latent-identification arms (seeds 0-2) + M=16 attribution
#      grids — VERDICT r3 ask #1.
#   2. Rollout replication at the teacher-forced arms' standard (seeds 0-2,
#      full iterations, M=16 grids) — ask #2.
#   3. Texture study (nogan/gan/rollout): GAN sharpness where MSE must blur
#      — ask #5.
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

for seed in 0 1 2; do
  sfx=""; [ "$seed" != 0 ] && sfx="_s$seed"
  run python scripts/gan_mode_study.py --variant infogan --seed $seed \
      --iterations $ITERS -o "$OUT/modestudy"
  run python scripts/mode_attribution.py \
      --run_dir "$OUT/modestudy/infogan$sfx" --variant infogan \
      --iterations $ITERS --n_styles 16 --n_dropout 16 --seed $seed
done

for seed in 0 1 2; do
  sfx=""; [ "$seed" != 0 ] && sfx="_s$seed"
  run python scripts/gan_mode_study.py --variant rollout --seed $seed \
      --iterations $ITERS -o "$OUT/modestudy"
  run python scripts/mode_attribution.py \
      --run_dir "$OUT/modestudy/rollout$sfx" --variant rollout \
      --iterations $ITERS --n_styles 16 --n_dropout 16 --seed $seed
done

for variant in nogan gan rollout; do
  run python scripts/gan_texture_study.py --variant $variant \
      --iterations $ITERS -o "$OUT/texstudy"
done

echo "ALL DONE $(date)" >> "$OUT/progress.log"
