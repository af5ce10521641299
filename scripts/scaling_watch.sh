#!/bin/bash
# Quiet-window watcher for the north-rule scaling evidence.
#
# The sandbox host is a burstable-CPU box (BASELINE.md controls): the
# ≥0.8 two-parallelism criterion is only measurable in post-idle
# windows.  This loop probes the machine ceiling every CHECK_EVERY
# seconds and launches ONE full probe-stamped scaling run
# (scripts/scaling_bench.py) the first time the short probe clears
# PROBE_MIN — then exits.  Every probe is logged either way, so even a
# run-less night leaves a record that no qualifying window existed.
#
# Usage: scripts/scaling_watch.sh [max_hours] [probe_min] [check_every_sec]
set -u
cd "$(dirname "$0")/.."
MAX_HOURS="${1:-5}"
PROBE_MIN="${2:-0.85}"
CHECK_EVERY="${3:-900}"
LOG="scaling_watch.log"
DEADLINE=$(( $(date +%s) + MAX_HOURS * 3600 ))

echo "$(date -u +'%F %T') watcher start (min=$PROBE_MIN every=${CHECK_EVERY}s)" >> "$LOG"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  CEIL=$(python scripts/cpu_ceiling.py 8 32 1 2>/dev/null | python -c \
    'import json,sys;print(json.load(sys.stdin)["machine_ceiling_efficiency"])')
  echo "$(date -u +'%F %T') probe ceiling=$CEIL" >> "$LOG"
  OK=$(python -c "print(1 if float('$CEIL') >= float('$PROBE_MIN') else 0)")
  if [ "$OK" = "1" ]; then
    echo "$(date -u +'%F %T') qualifying window — launching scaling bench" >> "$LOG"
    python scripts/scaling_bench.py 4800000 8 32 2 >> "$LOG" 2>&1
    echo "$(date -u +'%F %T') scaling bench done" >> "$LOG"
    exit 0
  fi
  sleep "$CHECK_EVERY"
done
echo "$(date -u +'%F %T') watcher exit: no qualifying window inside ${MAX_HOURS}h" >> "$LOG"
