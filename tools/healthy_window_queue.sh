#!/bin/bash
# Healthy-window capture loop: probe the tunnel every ~2.5 min; when a
# TRULY healthy window opens (small < 0.25 s AND heavy < 1.0 s — the
# signature bench.py's own gates demand; a small probe alone proves
# liveness, not speed: BASELINE.md), run the measurement queue in value
# order: driver-format bench record first, then kernel validation and
# the per-module profile.
#
# Calibration (round 3): a looser bar (heavy < 20 s) launched ~55-min
# bench attempts inside the ~3 s-quantized regime; every one was
# correctly refused by bench.py's 2 s chunk gate, and each launch
# blocked the loop long enough to miss any short healthy window. The
# bar here matches what the bench will actually accept.
#
# Fallback: if no healthy window appears, one DEGRADED attempt (fast-fail
# envs: 60 s tunnel wait, 120 s chunk gate, no internal retry — the loop
# is the retry) runs at most every 25 min when the regime is at least
# alive (heavy < 8 s), so the round always has fresh refusal diagnostics
# even if no window ever opens. A degraded attempt rescued by the slope
# fallback marks DEGRADED_CAPTURED (stops further degraded attempts) but
# keeps polling: only the FULL healthy queue sets QUEUE_DONE, because the
# slope record deliberately skips mosaic/warp/profile stages (the regime
# is still sick) and those must still run in a truly healthy window.
#
# Every attempt's record is preserved under $OUT/attempts/ — a later
# attempt must never overwrite the evidence of an earlier one.
# Stop with: kill $(cat "$PID").
#
# Usage: tools/healthy_window_queue.sh [outdir]   (default /tmp/healthy_runs)
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${1:-/tmp/healthy_runs}"
PID="$OUT/loop.pid"
LOG="$OUT/health_log.txt"
mkdir -p "$OUT/attempts"
echo $$ > "$PID"
QUEUE_DONE="$OUT/queue_done"
LAST_DEGRADED=0

run_bench() {  # $1 = tag (healthy|degraded), envs preset by caller
  local tag="$1" stamp rc
  stamp="$(date +%s)"
  local json="$OUT/attempts/bench_${tag}_${stamp}.json"
  cd "$REPO"
  timeout 4500 python bench.py --e2e > "$json" 2> "${json%.json}.err"
  rc=$?
  echo "$(date +%H:%M:%S) bench($tag) done rc=$rc -> $json" >> "$LOG"
  cp -f "$json" "$OUT/bench.json"
  python - "$json" <<'PY'
import json, sys
try:
    line = [l for l in open(sys.argv[1]) if l.strip()][-1]
    sys.exit(0 if json.loads(line).get('healthy') else 1)
except Exception:
    sys.exit(1)
PY
}

while true; do
  ts=$(date +%H:%M:%S)
  out=$(timeout 240 python "$REPO/tools/tunnel_health_probe.py" 2>/dev/null)
  [ -z "$out" ] && out="TIMEOUT/DEAD"
  echo "$ts $(echo $out)" >> "$LOG"
  small=$(echo "$out" | sed -n 's/^small=\([0-9.]*\).*/\1/p')
  heavy=$(echo "$out" | sed -n 's/^heavy=\([0-9.]*\).*/\1/p')
  if [ -n "$small" ] && [ -n "$heavy" ] && [ ! -f "$QUEUE_DONE" ]; then
    if python -c "import sys; sys.exit(0 if float('$small') < 0.25 and float('$heavy') < 1.0 else 1)"; then
      echo "$ts HEALTHY window (small=$small heavy=$heavy) — full queue" >> "$LOG"
      if run_bench healthy; then
        echo "$(date +%H:%M:%S) bench HEALTHY — finishing queue" >> "$LOG"
        timeout 600 python "$REPO/tools/mosaic_check.py" > "$OUT/mosaic.txt" 2>&1
        echo "$(date +%H:%M:%S) mosaic done rc=$?" >> "$LOG"
        timeout 1800 python "$REPO/tools/mxu_warp_bench.py" > "$OUT/warp_ab.txt" 2>&1
        echo "$(date +%H:%M:%S) warp A/B done rc=$?" >> "$LOG"
        timeout 1800 python "$REPO/tools/gather_wall_probe.py" > "$OUT/gather_wall.json" 2> "$OUT/gather_wall.err"
        echo "$(date +%H:%M:%S) gather-wall probe done rc=$?" >> "$LOG"
        # prices the round-5 select_warp/fast_select arms and refreshes
        # preset_slope_ab_latest.json (attached to every bench record)
        timeout 1800 python "$REPO/tools/preset_slope_ab.py" 240 > "$OUT/preset_ab.json" 2> "$OUT/preset_ab.err"
        echo "$(date +%H:%M:%S) preset A/B done rc=$?" >> "$LOG"
        timeout 3000 python "$REPO/tools/lfn_profile.py" 12 > "$OUT/lfn_profile.json" 2> "$OUT/lfn_profile.err"
        echo "$(date +%H:%M:%S) profile done rc=$?" >> "$LOG"
        touch "$QUEUE_DONE"
        touch "$OUT/HEALTHY_CAPTURED"
      else
        echo "$(date +%H:%M:%S) bench refused — regime soured mid-run; back to polling" >> "$LOG"
      fi
    elif [ ! -f "$OUT/DEGRADED_CAPTURED" ] \
         && python -c "import sys; sys.exit(0 if float('$heavy') < 8.0 else 1)" \
         && [ $(( $(date +%s) - LAST_DEGRADED )) -ge 1500 ]; then
      # 25 min between degraded attempts: since the failed-chunk-gate
      # skip, an attempt costs ~5-12 min (gate refusal + slope fallback)
      # instead of 55 — retry often enough to catch a healed window
      LAST_DEGRADED=$(date +%s)
      echo "$ts degraded attempt (small=$small heavy=$heavy) — fast-fail envs + slope fallback" >> "$LOG"
      # bench.py's slope fallback (program-length regression) can extract
      # a genuine device figure from an alive-but-quantized regime, so a
      # degraded attempt is a real capture chance — every 25 min
      if TRANSFLOW_BENCH_TUNNEL_WAIT=60 TRANSFLOW_BENCH_CHUNK_GATE=120 \
         TRANSFLOW_BENCH_RETRY=0 TRANSFLOW_BENCH_TOTAL_DEADLINE=1500 \
         run_bench degraded; then
        # A record was captured (regime recovered mid-attempt, or the
        # slope fallback rescued a quantized window). Do NOT set
        # QUEUE_DONE: the slope path skips mosaic/warp/profile because
        # the regime is still sick — keep polling so a later truly
        # healthy window runs the full queue. This marker only stops
        # further degraded attempts (one rescue is enough evidence).
        touch "$OUT/DEGRADED_CAPTURED"
        touch "$OUT/HEALTHY_CAPTURED"
        # in-regime slope ratios stay valid in a semi-quantized window:
        # price the select_warp arms while the tunnel is at least alive
        timeout 1800 python "$REPO/tools/preset_slope_ab.py" 240 > "$OUT/preset_ab_degraded.json" 2> "$OUT/preset_ab_degraded.err"
        echo "$(date +%H:%M:%S) degraded preset A/B done rc=$?" >> "$LOG"
      fi
    fi
  fi
  sleep 150
done
