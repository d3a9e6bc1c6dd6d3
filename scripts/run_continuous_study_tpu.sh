#!/bin/bash
# Continuous-control campaign + the recovery experiment's missing control.
#   0. UNARMED recovery control: resume the regenerated collapsed-factor
#      attractor (subset s0 @ 6000) to 9000 with the rescue controller
#      DISARMED (plain bit2x2_subset). The armed recon resume measured
#      joint chi2 114.6 -> 0.0; without this arm that collapse cannot be
#      attributed to the controller vs. 3000 more iterations of the
#      attractor's own dynamics.
#   1. Continuous-control arms (scripts/gan_continuous_study.py):
#      cont_warm / rollout / cont_bit4 x seeds 0-2, nogan s0 — does a
#      1-dim CONTINUOUS code become a monotone knob when the hidden
#      factor is itself continuous (topology-matched)?
# Usage: bash scripts/run_continuous_study_tpu.sh [OUT_ROOT] [ATTRACTOR_DIR]
set -u
ROOT=${1:-/tmp/contstudy}
ATT=${2:-/tmp/r4_resume/attractor}
mkdir -p "$ROOT"
cd "$(dirname "$0")/.."
LOG="$ROOT/progress.log"

run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== rc=$rc $(date +%H:%M:%S)" >> "$LOG"
  return $rc
}

# --- 0. Unarmed recovery control ------------------------------------------
CTRL="$ROOT/recovery_ctrl"
mkdir -p "$CTRL/bit2x2_subset"
if ls -d "$ATT"/bit2x2_subset/iter=6000* >/dev/null 2>&1; then
  # -r: Orbax checkpoints are DIRECTORIES.
  cp -r "$ATT"/bit2x2_subset/iter=6000* "$CTRL/bit2x2_subset/"
  marker=$(wc -l < "$LOG" 2>/dev/null || echo 0)
  run python scripts/gan_factorial_study.py --variant bit2x2_subset \
      --seed 0 --iterations 9000 -o "$CTRL"
  if tail -n +"$marker" "$LOG" | grep -q "Auto-resuming"; then
    echo "RECOVERY-CTRL RESUME VERIFIED" >> "$LOG"
  else
    echo "RECOVERY-CTRL FAILED: did not auto-resume" >> "$LOG"
  fi
else
  echo "RECOVERY-CTRL SKIPPED: no attractor at $ATT" >> "$LOG"
fi

# --- 1. Continuous-control arms --------------------------------------------
for s in 0 1 2; do
  for v in cont_warm rollout cont_bit4; do
    run python scripts/gan_continuous_study.py --variant "$v" \
        --seed "$s" --iterations 3000 -o "$ROOT"
  done
done
run python scripts/gan_continuous_study.py --variant nogan \
    --seed 0 --iterations 3000 -o "$ROOT"
echo "ALL DONE $(date)" >> "$LOG"
