#!/bin/bash
# Recovery-q re-run: resume the collapsed-factor attractor (subset s0 @
# 6000, band A dead) under the ARMED recon rescue controller and train to
# 9000. The first attempt (run_factorial_rescueq_tpu.sh) regenerated the
# attractor fine but the recovery run itself died at startup on a
# transient TPU FailedPrecondition; the attractor checkpoint is already
# copied into $REC/bit2x2_rescue_q (iter=6000, val 0.4651). This script
# re-runs ONLY the recovery arm, with one retry for transient backend
# errors, and verifies the auto-resume actually happened.
# Usage: bash scripts/run_recovery_q_tpu.sh [RESCUEQ_OUT_DIR]
set -u
OUT=${1:-/tmp/factorial_rescueq}
REC="$OUT/recovery"
cd "$(dirname "$0")/.."

run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$OUT/progress.log"
  "$@" >> "$OUT/progress.log" 2>&1
  local rc=$?
  echo "=== rc=$rc $(date +%H:%M:%S)" >> "$OUT/progress.log"
  return $rc
}

if ! ls -d "$REC"/bit2x2_rescue_q/iter=6000*.ckpt >/dev/null 2>&1; then
  echo "RECOVERY-Q SETUP MISSING: no attractor ckpt in $REC" >> "$OUT/progress.log"
  exit 1
fi

for attempt in 1 2; do
  marker=$(wc -l < "$OUT/progress.log")
  if run python scripts/gan_factorial_study.py --variant bit2x2_rescue_q \
      --seed 0 --iterations 9000 -o "$REC"; then
    if tail -n +"$marker" "$OUT/progress.log" | grep -q "Auto-resuming"; then
      echo "RECOVERY-Q RESUME VERIFIED (attempt $attempt)" >> "$OUT/progress.log"
    else
      echo "RECOVERY-Q FAILED: ran but did not auto-resume" >> "$OUT/progress.log"
    fi
    break
  fi
  echo "RECOVERY-Q attempt $attempt failed; retrying in 120s" >> "$OUT/progress.log"
  sleep 120
done
echo "RECOVERY-Q RERUN DONE $(date)" >> "$OUT/progress.log"
