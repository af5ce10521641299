#!/bin/bash
# Quiet-window watcher for the north-rule scaling evidence.
#
# The sandbox host is a burstable-CPU box with noisy neighbours
# (BASELINE.md controls): the ≥0.8 two-parallelism criterion is only
# measurable in windows where the box can express it.  Round-3 lesson
# (scaling_watch.log 11:25 UTC): a SHORT cpu probe clearing 0.97 was not
# sufficient — the sustained JVM run still throttled (burst credits) and
# the memory bus was saturated (membw ceiling 0.56), capping the wide
# config regardless of vCPUs.  v2 therefore gates on THREE conditions
# before spending a window on the full bench:
#
#   1. short pure-CPU scaling ceiling (8→32 procs)  >= PROBE_MIN
#   2. memory-bus scaling ceiling (8→32 procs)      >= MEMBW_MIN
#      (shuffle/parquet/Arrow phases are bandwidth-bound)
#   3. the cpu probe REPEATED after a 60 s sustained 8-proc burn still
#      >= PROBE_MIN (sustained capacity, not just burst credits)
#
# Every probe is logged either way, so even a run-less night leaves a
# record that no qualifying window existed.
#
# Usage: scripts/scaling_watch.sh [max_hours] [probe_min] [check_every_sec] [membw_min]
set -u
cd "$(dirname "$0")/.."
MAX_HOURS="${1:-5}"
PROBE_MIN="${2:-0.85}"
CHECK_EVERY="${3:-900}"
MEMBW_MIN="${4:-0.7}"
LOG="scaling_watch.log"
DEADLINE=$(( $(date +%s) + MAX_HOURS * 3600 ))

cpu_probe () {
  python scripts/cpu_ceiling.py 8 32 1 2>/dev/null | python -c \
    'import json,sys;print(json.load(sys.stdin)["machine_ceiling_efficiency"])'
}

echo "$(date -u +'%F %T') watcher v2 start (min=$PROBE_MIN membw_min=$MEMBW_MIN every=${CHECK_EVERY}s)" >> "$LOG"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  CEIL=$(cpu_probe)
  echo "$(date -u +'%F %T') probe ceiling=$CEIL" >> "$LOG"
  OK=$(python -c "print(1 if float('$CEIL') >= float('$PROBE_MIN') else 0)")
  if [ "$OK" = "1" ]; then
    MEMBW=$(python scripts/membw_ceiling.py 8 32 3 2>/dev/null | python -c \
      'import json,sys;print(json.load(sys.stdin)["machine_ceiling_efficiency"])')
    echo "$(date -u +'%F %T') membw ceiling=$MEMBW" >> "$LOG"
    OK2=$(python -c "print(1 if float('$MEMBW') >= float('$MEMBW_MIN') else 0)")
    if [ "$OK2" = "1" ]; then
      # sustained-capacity check: 60 s of 8-proc sha256, then re-probe —
      # burst credits that a sustained JVM would exhaust fail this.
      python - <<'PY'
import sys
sys.path.insert(0, "scripts")
from cpu_ceiling import measure
measure(8, 8 * 60)  # ~60 s of 8-core work
PY
      CEIL2=$(cpu_probe)
      echo "$(date -u +'%F %T') post-burn ceiling=$CEIL2" >> "$LOG"
      OK3=$(python -c "print(1 if float('$CEIL2') >= float('$PROBE_MIN') else 0)")
      if [ "$OK3" = "1" ]; then
        echo "$(date -u +'%F %T') qualifying window — launching scaling bench" >> "$LOG"
        python scripts/scaling_bench.py 4800000 8 32 2 >> "$LOG" 2>&1
        echo "$(date -u +'%F %T') scaling bench done" >> "$LOG"
        exit 0
      fi
    fi
  fi
  sleep "$CHECK_EVERY"
done
echo "$(date -u +'%F %T') watcher exit: no qualifying window inside ${MAX_HOURS}h" >> "$LOG"
