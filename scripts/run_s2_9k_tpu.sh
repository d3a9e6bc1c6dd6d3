#!/bin/bash
# subset s2: 6000 -> 9000. The 6k replication (bit2x2_subset_s2_6k.json)
# measured every trend of s1's full-factorization trajectory (chi2 128 ->
# 251.7, injective binding, val mel 1.42 -> 0.80) EXCEPT cell coverage
# (stuck at 0.5). This continuation asks whether s2 completes with more
# time or has found a partial-coverage attractor.
# Usage: bash scripts/run_s2_9k_tpu.sh [SIX_DIR]
set -u
SIX=${1:-/tmp/r4_resume/factorial_6k}
cd "$(dirname "$0")/.."
LOG="$SIX/progress_9k.log"

echo "=== $(date +%H:%M:%S) s2 -> 9000" >> "$LOG"
python scripts/gan_factorial_study.py --variant bit2x2_subset \
    --seed 2 --iterations 9000 -o "$SIX" >> "$LOG" 2>&1
echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
echo "S2-9K DONE $(date)" >> "$LOG"
