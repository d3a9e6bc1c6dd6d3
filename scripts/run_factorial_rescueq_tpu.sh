#!/bin/bash
# Recon-actuator rescue arms (config.py factor_rescue_actuator="recon"):
# the fixed-code redraw actuator measured harmful WHENEVER it acted
# asymmetrically (s0: destroyed the identified band in 600 iters; s1:
# chi2 203->157 at +17% val mel; s2: never acted = bit-identical
# baseline). The recon actuator escalates the weak dim's Q-head error
# instead - identification pressure is not zero-sum across dims.
#   1. bit2x2_rescue_q seeds 0/1/2 - 3000 iters, campaign standard.
#   2. RECOVERY-Q: resume the collapsed-factor attractor (subset s0 at
#      6000 iters, band A dead) under the armed recon controller.
#      The attractor checkpoint is REGENERATED here (the original lived
#      in /tmp and did not survive the host): subset s0 runs 3000 then
#      continues to 6000, the same two-stage trajectory the recorded
#      bit2x2_subset_6k.json followed, so the resumed state matches the
#      documented attractor (verify val mel/chi2 against that JSON).
# Usage: bash scripts/run_factorial_rescueq_tpu.sh [OUT_DIR]
set -u
OUT=${1:-/tmp/factorial_rescueq}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$OUT/progress.log"
  "$@" >> "$OUT/progress.log" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$OUT/progress.log"
}

for s in 0 1 2; do
  run python scripts/gan_factorial_study.py --variant bit2x2_rescue_q \
      --seed "$s" --iterations 3000 -o "$OUT"
done
echo "RESCUE-Q DONE $(date)" >> "$OUT/progress.log"

# --- Regenerate the collapsed-factor attractor: subset s0 @ 3000 -> 6000.
ATT="$OUT/attractor"
mkdir -p "$ATT"
run python scripts/gan_factorial_study.py --variant bit2x2_subset \
    --seed 0 --iterations 3000 -o "$ATT"
run python scripts/gan_factorial_study.py --variant bit2x2_subset \
    --seed 0 --iterations 6000 -o "$ATT"

REC="$OUT/recovery"
mkdir -p "$REC/bit2x2_rescue_q"
# -r: Orbax checkpoints are DIRECTORIES.
cp -r "$ATT"/bit2x2_subset/iter=6000* "$REC/bit2x2_rescue_q/"
if ! ls -d "$REC"/bit2x2_rescue_q/iter=6000*.ckpt >/dev/null 2>&1; then
  echo "RECOVERY-Q SETUP FAILED: checkpoint copy missing" >> "$OUT/progress.log"
else
  marker=$(wc -l < "$OUT/progress.log")
  run python scripts/gan_factorial_study.py --variant bit2x2_rescue_q \
      --seed 0 --iterations 9000 -o "$REC"
  if tail -n +"$marker" "$OUT/progress.log" | grep -q "Auto-resuming"; then
    echo "RECOVERY-Q RESUME VERIFIED" >> "$OUT/progress.log"
  else
    echo "RECOVERY-Q FAILED: did not auto-resume" >> "$OUT/progress.log"
  fi
fi
echo "ALL DONE $(date)" >> "$OUT/progress.log"
