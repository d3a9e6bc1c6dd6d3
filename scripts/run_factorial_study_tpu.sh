#!/bin/bash
# Factorial identification-scaling campaign, chip-sized (round 4, late).
# Every arm at the round-3 standard (K=1, 3000 iterations, n_utts 200,
# 16x8 attribution grid) on data.toy.build_factorial_corpus (TWO
# independent hidden bits -> 4 joint modes). Value order, so a partial
# run still yields evidence:
#   1. bit2x2 seeds 0/1/2 — the DISENTANGLEMENT question (can a 2-dim
#      2-level code factorize the product space, each dim binding one
#      bit?). The most novel claim; nothing in the single-bit campaign
#      predicts it.
#   2. bit4 seeds 0/1/2 — COVERAGE of the flat 4-level categorical
#      (the product space as one code dim).
#   3. bit1 seeds 0/1/2 — the underparameterized probe (1 bit of code
#      facing 2 hidden bits: which factor does identification latch
#      onto, and is the other abandoned to dropout?).
#   4. nogan seed 0 — the MSE floor.
# Training auto-resumes from the newest checkpoint, so re-running this
# script after a tunnel drop continues rather than restarts.
# Usage: bash scripts/run_factorial_study_tpu.sh [OUT_DIR] [ITERS]
set -u
OUT=${1:-/tmp/factorial_r4}
ITERS=${2:-3000}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$OUT/progress.log"
  "$@" >> "$OUT/progress.log" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$OUT/progress.log"
}

for s in 0 1 2; do
  run python scripts/gan_factorial_study.py --variant bit2x2 --seed "$s" \
      --iterations "$ITERS" -o "$OUT"
done
for s in 0 1 2; do
  run python scripts/gan_factorial_study.py --variant bit4 --seed "$s" \
      --iterations "$ITERS" -o "$OUT"
done
for s in 0 1 2; do
  run python scripts/gan_factorial_study.py --variant bit1 --seed "$s" \
      --iterations "$ITERS" -o "$OUT"
done
run python scripts/gan_factorial_study.py --variant nogan --seed 0 \
    --iterations "$ITERS" -o "$OUT"

echo "ALL DONE $(date)" >> "$OUT/progress.log"

# Fix arm (run after the base arms measured the failure): subset redraw
# makes single-dim code flips owe the full diversity contrast.
for s in 0 1 2; do
  run python scripts/gan_factorial_study.py --variant bit2x2_subset \
      --seed "$s" --iterations "$ITERS" -o "$OUT"
done

echo "SUBSET DONE $(date)" >> "$OUT/progress.log"
