#!/bin/bash
# Kill-at-rate probe (r12 verdict task 3, proven on 4 round-13 runs):
# StreamRate on a 2-worker standalone cluster; SIGKILL the youngest
# executor once the B<killBatch> marker file lands (mid-run, at rate).
# The STREAMRATE latencies array localizes the recovery: kill-batch
# latency minus steady p50 = state-reload seconds on the surviving
# executor. Exactly-once outcome is checked by the probe itself
# (bounded-state gate + total rows).
#
# Usage: tools/streamrate_kill.sh [mode] [changelog01] [rowsPerBatch] [batches] [killBatch]
#   defaults: dedup 0 1000000 10 4
# Output: /tmp/graft_srkill_<mode>_cl<N>/{submit.log,killer.log}; the
# STREAMRATE line and killer/Lost-executor evidence print to stdout.
set -e
cd "$(dirname "$0")/.."
MODE="${1:-dedup}"; CL="${2:-0}"; RPB="${3:-1000000}"
BATCHES="${4:-10}"; KB="${5:-4}"
BASE="/tmp/graft_srkill_${MODE}_cl$CL"
rm -rf "$BASE"; mkdir -p "$BASE/logs"
sbt -batch package > "$BASE/package.log" 2>&1
JAR=$(ls target/scala-2.13/*.jar | head -1)
export SPARK_HOME=/opt/spark
SPARK_IDENT_STRING=srm SPARK_LOG_DIR="$BASE/logs" \
  /opt/spark/sbin/start-master.sh -p 7077 --webui-port 8090
sleep 5
for w in 1 2; do
  SPARK_IDENT_STRING=srw$w SPARK_LOG_DIR="$BASE/logs" \
    SPARK_LOCAL_DIRS="$BASE/scratch$w" SPARK_WORKER_DIR="$BASE/work$w" \
    /opt/spark/sbin/start-worker.sh spark://127.0.0.1:7077 \
    -c 16 -m 12g --webui-port 809$w
done
sleep 8
stop_cluster() {
  SPARK_IDENT_STRING=srw1 /opt/spark/sbin/stop-worker.sh || true
  SPARK_IDENT_STRING=srw2 /opt/spark/sbin/stop-worker.sh || true
  SPARK_IDENT_STRING=srm /opt/spark/sbin/stop-master.sh || true
}
trap stop_cluster EXIT
# markers land in the run-scoped <ckpt>.markers dir StreamRate clears
# at startup — a stale B<k> from a previous run can't aim the killer
( while [ ! -f "$BASE/ckpt.markers/B$KB" ]; do sleep 1; done
  PID=$(ps -eo pid,etimes,cmd | grep "[C]oarseGrainedExecutorBackend" \
        | sort -k2 -n | head -1 | awk '{print $1}')
  echo "KILLER: pid=$PID at marker B$KB $(date -u +%H:%M:%S)" >> "$BASE/killer.log"
  [ -n "$PID" ] && kill -9 "$PID" ) &
KPID=$!
# capture rc explicitly: under set -e a nonzero spark-submit (including
# StreamRate's intended exit 2 on a gate failure) would abort before the
# diagnostics print and orphan the killer loop
rc=0
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_MASTER=spark://127.0.0.1:7077 \
  SPARK_GRAFT_SR_CHANGELOG="$CL" \
  /opt/spark/bin/spark-submit --master spark://127.0.0.1:7077 \
  --class graft.StreamRate --driver-memory 8g \
  --conf spark.executor.memory=10g \
  "$JAR" "$MODE" "$RPB" "$BATCHES" "$BASE/ckpt" > "$BASE/submit.log" 2>&1 || rc=$?
echo "rc=$rc"
grep STREAMRATE "$BASE/submit.log" || true
cat "$BASE/killer.log" 2>/dev/null || true
echo "Lost-executor lines: $(grep -c 'Lost executor' "$BASE/submit.log" || true)"
kill "$KPID" 2>/dev/null || true
wait "$KPID" 2>/dev/null || true
exit "$rc"
