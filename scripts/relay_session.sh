#!/bin/sh
# One relay window, all queued on-chip measurements, priority order.
# Each step is bounded and logged; a wedged compile kills only its step.
# Usage: sh scripts/relay_session.sh [logdir]
set -u
LOG=${1:-/tmp/relay_r3}
mkdir -p "$LOG"

run() {
  name=$1; tmo=$2; shift 2
  echo "== $name ($(date +%H:%M:%S)) =="
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  rc=$?
  tail -5 "$LOG/$name.log"
  echo "-- $name rc=$rc"
}

run bench        1200 python bench.py
run tiledfuse_ab 1800 python scripts/tiledfuse_ab.py
run vort8192     1500 python scripts/vort8192_probe.py
run roll_share   1500 python scripts/roll_share_probe.py
run smallgrid    1200 python scripts/smallgrid_probe.py
run deepburst_ab 1500 python scripts/deepburst_ab.py
run bench_suite  3000 python scripts/bench_suite.py
echo "all done: logs in $LOG"
