#!/bin/bash
# Continuous-control campaign, prioritized for a bounded session:
# headline arm (cont_warm, 3 seeds) first, then the controls
# (rollout, cont_bit4), then nogan, then remaining control seeds.
# A stop-file ($ROOT/STOP) halts the chain between runs so the chip
# can be freed gracefully before the driver's end-of-round bench.
# Usage: bash scripts/run_continuous_chain_tpu.sh [OUT_ROOT]
set -u
ROOT=${1:-/tmp/contstudy}
mkdir -p "$ROOT"
cd "$(dirname "$0")/.."
LOG="$ROOT/progress.log"

run() {
  if [ -f "$ROOT/STOP" ]; then echo "=== STOPPED by stop-file" >> "$LOG"; exit 0; fi
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

# ARMS overrides the default order, e.g. ARMS="cont_warm:1 cont_warm:2"
# (warm-cache seeds of an already-compiled variant run ~4x faster than a
# cold variant, so reordering mid-session is routine).
ARMS=${ARMS:-"cont_warm:0 rollout:0 cont_bit4:0 cont_warm:1 cont_warm:2
              nogan:0 rollout:1 cont_bit4:1 rollout:2 cont_bit4:2"}
for spec in $ARMS; do
  v=${spec%:*}; s=${spec#*:}
  run python scripts/gan_continuous_study.py --variant "$v" \
      --seed "$s" --iterations 3000 -o "$ROOT"
done
echo "ALL DONE $(date)" >> "$LOG"
