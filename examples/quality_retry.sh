#!/bin/bash
# Crash-proof driver for examples/quality_eval.py: re-runs the (self-
# resuming) quality pipeline until it completes, with a progress watchdog
# that checks the LOG TIMESTAMP advances (a mere "is the process alive"
# check misses mid-run TPU-tunnel wedges). Kills by PID, never by pattern.
#
# Usage: bash examples/quality_retry.sh [extra quality_eval.py args...]
set -u
WORKDIR=${WORKDIR:-/tmp/r3dg_quality}
LOG=$WORKDIR/run.log
# Default must exceed a cold-cache first compile of the stage-1 train
# program (~15-25 min on the remote-compile tunnel when ops changes
# invalidate the persistent cache) — a watchdog kill mid-compile loses
# the compile AND the cache entry, looping forever.
STALL_SECS=${STALL_SECS:-2400}
ATTEMPTS=${ATTEMPTS:-12}
mkdir -p "$WORKDIR"
cd "$(dirname "$0")/.."

for attempt in $(seq 1 "$ATTEMPTS"); do
  echo "[retry] attempt $attempt $(date -Is)" >> "$LOG"
  python -u examples/quality_eval.py --workdir "$WORKDIR" "$@" >> "$LOG" 2>&1 &
  PID=$!
  echo "$PID" > "$WORKDIR/run.pid"
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    if [ $((now - mt)) -gt "$STALL_SECS" ]; then
      echo "[retry] stalled ($((now - mt))s quiet) — killing $PID" >> "$LOG"
      kill -9 "$PID" 2>/dev/null
      sleep 15
      break
    fi
  done
  wait "$PID"
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "[retry] SUCCESS after $attempt attempt(s)" >> "$LOG"
    exit 0
  fi
  echo "[retry] exit code $rc — restarting (auto-resume from checkpoints)" \
    >> "$LOG"
  sleep 30
done
echo "[retry] FAILED after $ATTEMPTS attempts" >> "$LOG"
exit 1
