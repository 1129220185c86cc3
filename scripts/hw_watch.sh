#!/bin/bash
# Poll the TPU tunnel; the moment a device probe succeeds, run the full
# hardware measurement roundup (scripts/hw_roundup.sh). One-shot: exits
# after the first successful roundup, or after MAX_TRIES failed probes.
# Usage: bash scripts/hw_watch.sh [outdir] [poll_seconds] [max_tries]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/hw_roundup}
POLL=${2:-600}
MAX=${3:-60}
mkdir -p "$OUT"
for i in $(seq 1 "$MAX"); do
  echo "[hw_watch] probe $i/$MAX $(date +%H:%M:%S)"
  if timeout 240 python -c "import jax; print(jax.devices())" > "$OUT/probe.txt" 2>&1; then
    echo "[hw_watch] TPU UP: $(tail -1 "$OUT/probe.txt")"
    bash scripts/hw_roundup.sh "$OUT"
    echo "[hw_watch] roundup complete"
    exit 0
  fi
  sleep "$POLL"
done
echo "[hw_watch] gave up after $MAX probes"
exit 3
