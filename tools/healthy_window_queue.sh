#!/bin/bash
# Healthy-window capture loop: probe the tunnel every ~7 min; when a
# window opens (small AND heavy probes fast — a small probe alone proves
# liveness, not speed: BASELINE.md), run the measurement queue in value
# order: driver-format bench record first, then kernel validation and
# the per-module profile. Sick windows yield honest refusal records and
# the loop retries at the next window. Stop with: kill $(cat "$PID").
#
# Usage: tools/healthy_window_queue.sh [outdir]   (default /tmp/healthy_runs)
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${1:-/tmp/healthy_runs}"
PID="$OUT/loop.pid"
LOG="$OUT/health_log.txt"
mkdir -p "$OUT"
echo $$ > "$PID"
QUEUE_DONE="$OUT/queue_done"

while true; do
  ts=$(date +%H:%M:%S)
  out=$(timeout 240 python "$REPO/tools/tunnel_health_probe.py" 2>/dev/null)
  [ -z "$out" ] && out="TIMEOUT/DEAD"
  echo "$ts $(echo $out)" >> "$LOG"
  small=$(echo "$out" | sed -n 's/^small=\([0-9.]*\).*/\1/p')
  heavy=$(echo "$out" | sed -n 's/^heavy=\([0-9.]*\).*/\1/p')
  if [ -n "$small" ] && [ -n "$heavy" ] && [ ! -f "$QUEUE_DONE" ] && \
     python -c "import sys; sys.exit(0 if float('$small') < 2.0 and float('$heavy') < 20.0 else 1)"; then
    echo "$ts window (small=$small heavy=$heavy) — running queue" >> "$LOG"
    cd "$REPO"
    timeout 4500 python bench.py --e2e > "$OUT/bench.json" 2> "$OUT/bench.err"
    echo "$(date +%H:%M:%S) bench done rc=$?" >> "$LOG"
    if python - "$OUT/bench.json" <<'PY'
import json, sys
try:
    line = [l for l in open(sys.argv[1]) if l.strip()][-1]
    sys.exit(0 if json.loads(line).get('healthy') else 1)
except Exception:
    sys.exit(1)
PY
    then
      echo "$(date +%H:%M:%S) bench HEALTHY — finishing queue" >> "$LOG"
      timeout 600 python "$REPO/tools/mosaic_check.py" > "$OUT/mosaic.txt" 2>&1
      echo "$(date +%H:%M:%S) mosaic done rc=$?" >> "$LOG"
      timeout 1800 python "$REPO/tools/mxu_warp_bench.py" > "$OUT/warp_ab.txt" 2>&1
      echo "$(date +%H:%M:%S) warp A/B done rc=$?" >> "$LOG"
      timeout 3000 python "$REPO/tools/lfn_profile.py" 12 > "$OUT/lfn_profile.json" 2> "$OUT/lfn_profile.err"
      echo "$(date +%H:%M:%S) profile done rc=$?" >> "$LOG"
      touch "$QUEUE_DONE"
      touch "$OUT/HEALTHY_CAPTURED"
    else
      echo "$(date +%H:%M:%S) bench refused — will retry next window" >> "$LOG"
    fi
  fi
  sleep 420
done
