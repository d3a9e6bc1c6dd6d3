#!/bin/bash
# Round-4 session-resume queue: ONLY the still-open chip work after the
# host wiped /tmp (the rescue-q 3-seed arms are already committed in
# docs/evidence_r4/factorial/).
#   1. Regenerate the collapsed-factor attractor (subset s0: 3000 ->
#      6000, the exact two-stage trajectory bit2x2_subset_6k.json
#      followed) and run RECOVERY-Q: resume it to 9000 under the armed
#      recon rescue controller.
#   2. subset s2: 3000 -> 6000 (does s1's full factorization at 6k
#      reproduce on a second healthy seed?).
#   3. ortho s0/s1/s2: 3000 -> 6000 (reward-shaped binding + time vs
#      time alone). Two-stage like the subset arms: the 3000-iter /tmp
#      checkpoints are gone, so stage one regenerates them — its stats
#      should reproduce the committed bit2x2_ortho*.json (deterministic
#      seeding), which doubles as a regen sanity check.
# Usage: bash scripts/run_r4_resume_queue_tpu.sh [OUT_ROOT]
set -u
ROOT=${1:-/tmp/r4_resume}
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

# --- 1. Attractor regen + recovery-q -------------------------------------
ATT="$ROOT/attractor"
mkdir -p "$ATT"
run python scripts/gan_factorial_study.py --variant bit2x2_subset \
    --seed 0 --iterations 3000 -o "$ATT"
run python scripts/gan_factorial_study.py --variant bit2x2_subset \
    --seed 0 --iterations 6000 -o "$ATT"

REC="$ROOT/recovery"
mkdir -p "$REC/bit2x2_rescue_q"
# -r: Orbax checkpoints are DIRECTORIES.
cp -r "$ATT"/bit2x2_subset/iter=6000* "$REC/bit2x2_rescue_q/"
if ! ls -d "$REC"/bit2x2_rescue_q/iter=6000* >/dev/null 2>&1; then
  echo "RECOVERY-Q SETUP FAILED: checkpoint copy missing" >> "$LOG"
else
  for attempt in 1 2; do
    marker=$(wc -l < "$LOG")
    if run python scripts/gan_factorial_study.py --variant bit2x2_rescue_q \
        --seed 0 --iterations 9000 -o "$REC"; then
      if tail -n +"$marker" "$LOG" | grep -q "Auto-resuming"; then
        echo "RECOVERY-Q RESUME VERIFIED (attempt $attempt)" >> "$LOG"
      else
        echo "RECOVERY-Q FAILED: ran but did not auto-resume" >> "$LOG"
      fi
      break
    fi
    echo "RECOVERY-Q attempt $attempt failed; retrying in 120s" >> "$LOG"
    sleep 120
  done
fi
echo "RECOVERY-Q DONE $(date)" >> "$LOG"

# --- 2. subset s2: 3000 -> 6000 ------------------------------------------
SIX="$ROOT/factorial_6k"
mkdir -p "$SIX"
run python scripts/gan_factorial_study.py --variant bit2x2_subset \
    --seed 2 --iterations 3000 -o "$SIX"
run python scripts/gan_factorial_study.py --variant bit2x2_subset \
    --seed 2 --iterations 6000 -o "$SIX"

# --- 3. ortho s0/s1/s2: 3000 -> 6000 ---------------------------------------
ORTHO="$ROOT/factorial_ortho"
mkdir -p "$ORTHO"
for s in 0 1 2; do
  run python scripts/gan_factorial_study.py --variant bit2x2_ortho \
      --seed "$s" --iterations 3000 -o "$ORTHO"
  run python scripts/gan_factorial_study.py --variant bit2x2_ortho \
      --seed "$s" --iterations 6000 -o "$ORTHO"
done
echo "ALL DONE $(date)" >> "$LOG"
