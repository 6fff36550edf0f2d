#!/usr/bin/env bash
# chaoskill.sh — background executor killer for the chaos sweep
# (round-11, verdict 7). Every INTERVAL seconds, SIGKILL one standalone
# -cluster executor JVM (CoarseGrainedExecutorBackend) that has been
# alive > MIN_AGE seconds (so a just-respawned executor isn't killed
# before it registers — the r10 lesson: a kill that misses logs
# nothing). Stops when STOPFILE appears. Logs every kill with epoch +
# pid so the driver log's "Lost executor" lines can be joined against
# it.
#
# Usage: chaoskill.sh <logfile> <stopfile> [interval=60] [min_age=20]
set -u
LOG=$1; STOP=$2; INTERVAL=${3:-60}; MIN_AGE=${4:-20}
echo "chaoskill: start $(date +%s) interval=${INTERVAL}s min_age=${MIN_AGE}s" >> "$LOG"
while [ ! -f "$STOP" ]; do
  sleep "$INTERVAL"
  [ -f "$STOP" ] && break
  # oldest eligible executor first (stable choice, easy to join)
  PID=$(ps -eo pid,etimes,cmd | grep '[C]oarseGrainedExecutorBackend' \
        | awk -v a="$MIN_AGE" '$2 > a {print $1, $2}' | sort -k2 -rn \
        | head -1 | awk '{print $1}')
  if [ -n "${PID:-}" ]; then
    kill -9 "$PID" 2>/dev/null && echo "chaoskill: $(date +%s) killed pid=$PID" >> "$LOG"
  else
    echo "chaoskill: $(date +%s) no eligible executor" >> "$LOG"
  fi
done
echo "chaoskill: stop $(date +%s) kills=$(grep -c 'killed pid' "$LOG" || true)" >> "$LOG"
