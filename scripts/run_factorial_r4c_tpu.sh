#!/bin/bash
# Round-4 factorial arms, batch 3 — re-runs on the TRAJECTORY-IDENTITY
# fix (train/step.py: uniform dim_weights take the exact unweighted
# draws). The previous rescue arms measured only draw sensitivity
# (categorical-vs-randint force stream at uniform weights, 3/3 -> 1/3)
# and the recovery arm never resumed (cp without -r on an Orbax
# checkpoint DIRECTORY). See docs/TRAINING_EVIDENCE.md "Trajectory
# identity".
#   1. bit2x2_rescue seeds 0/1/2 — 3000 iters. Unarmed/lockstep phases
#      are now bit-identical to the bit2x2_subset baseline BY
#      CONSTRUCTION; any endpoint difference is attributable to the
#      controller's ASYMMETRIC action alone.
#   2. RECOVERY: resume the measured collapsed-factor attractor
#      (bit2x2_subset seed 0 at 6000 iters, band A dead, band B alive)
#      with the armed rescue for 3000 more iterations — the controller's
#      actual design point. The run MUST print "Auto-resuming"; the
#      script verifies and marks FAILED otherwise.
# Usage: bash scripts/run_factorial_r4c_tpu.sh [OUT_DIR]
set -u
OUT=${1:-/tmp/factorial_r4c}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$OUT/progress.log"
  "$@" >> "$OUT/progress.log" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$OUT/progress.log"
}

for s in 0 1 2; do
  run python scripts/gan_factorial_study.py --variant bit2x2_rescue \
      --seed "$s" --iterations 3000 -o "$OUT"
done
echo "RESCUE-FIXED DONE $(date)" >> "$OUT/progress.log"

REC="$OUT/recovery"
mkdir -p "$REC/bit2x2_rescue"
# -r: Orbax checkpoints are directories (see header).
cp -r /tmp/factorial_r4/bit2x2_subset/iter=6000* "$REC/bit2x2_rescue/"
if ! ls -d "$REC"/bit2x2_rescue/iter=6000*.ckpt >/dev/null 2>&1; then
  echo "RECOVERY SETUP FAILED: checkpoint copy missing" >> "$OUT/progress.log"
else
  marker=$(wc -l < "$OUT/progress.log")
  run python scripts/gan_factorial_study.py --variant bit2x2_rescue \
      --seed 0 --iterations 9000 -o "$REC"
  if tail -n +"$marker" "$OUT/progress.log" | grep -q "Auto-resuming"; then
    echo "RECOVERY RESUME VERIFIED" >> "$OUT/progress.log"
  else
    echo "RECOVERY FAILED: did not auto-resume" >> "$OUT/progress.log"
  fi
fi
echo "ALL DONE $(date)" >> "$OUT/progress.log"
