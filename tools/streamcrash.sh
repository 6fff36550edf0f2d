#!/bin/bash
# Driver-JVM kill/restart recovery probe (r13 verdict task 3):
# graft.StreamCrash control / crash / resume / check, for the dedup and
# session (merging-state) shapes at both RocksDB changelog settings.
# The crash run halt(137)s the driver mid-run at rate; the resume run
# restarts the SAME command from the durable checkpoint; check proves
# control output == crash+resume output (EXCEPT ALL both ways, so a
# lost batch or a replayed duplicate both fail loudly).
#
# Usage: tools/streamcrash.sh [rowsPerBatch] [batches] [crashAfter]
#   defaults: 1000000 10 4
#   SPARK_GRAFT_SC_MODES overrides the mode list (default
#   "dedup session join leftjoin" — join/leftjoin are the round-15
#   stream-stream two-sided-watermark shapes)
# Output: /tmp/graft_streamcrash/<mode>_cl<N>/{ctl,crash}/; one
# STREAMCRASH line per completed run/check prints to stdout.
set -e
cd "$(dirname "$0")/.."
RPB="${1:-1000000}"; BATCHES="${2:-10}"; KB="${3:-4}"
BASE="/tmp/graft_streamcrash"
rm -rf "$BASE"; mkdir -p "$BASE"
sbt -batch package > "$BASE/package.log" 2>&1
JAR=$(ls target/scala-2.13/*.jar | head -1)
export SPARK_HOME=/opt/spark
CPUS="${SPARK_GRAFT_CPUS:-32}"

submit() { # submit <logfile> <extra-env...> -- <args...>
  local log="$1"; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  local rc=0
  env "${envs[@]}" SPARK_GRAFT_CPUS="$CPUS" \
    /opt/spark/bin/spark-submit --master "local[$CPUS]" \
    --class graft.StreamCrash --driver-memory 16g \
    "$JAR" "$@" > "$log" 2>&1 || rc=$?
  grep STREAMCRASH "$log" || true
  return "$rc"
}

overall=0
for MODE in ${SPARK_GRAFT_SC_MODES:-dedup session join leftjoin}; do
  for CL in 0 1; do
    D="$BASE/${MODE}_cl$CL"
    echo "=== $MODE changelog=$CL ==="
    # 1. control: full run, no crash
    submit "$D.ctl.log" SPARK_GRAFT_SR_CHANGELOG="$CL" -- \
      run "$MODE" "$RPB" "$BATCHES" "$D/ctl" \
      || { echo "control run failed"; overall=1; continue; }
    # 2. crash: expect exit 137 (halt mid-run)
    rc=0
    submit "$D.crash.log" SPARK_GRAFT_SR_CHANGELOG="$CL" \
      SPARK_GRAFT_CRASH_AFTER="$KB" -- \
      run "$MODE" "$RPB" "$BATCHES" "$D/crash" || rc=$?
    echo "crash rc=$rc (137 = halted as intended)"
    [ "$rc" -eq 137 ] || { echo "UNEXPECTED crash rc"; overall=1; continue; }
    # 3. resume: same command, durable checkpoint, finishes the input
    submit "$D.resume.log" SPARK_GRAFT_SR_CHANGELOG="$CL" -- \
      run "$MODE" "$RPB" "$BATCHES" "$D/crash" \
      || { echo "resume run failed"; overall=1; continue; }
    # 4. exactly-once gate
    submit "$D.check.log" -- check "$D/ctl" "$D/crash" \
      || { echo "EXACTLY-ONCE CHECK FAILED"; overall=1; }
  done
done
exit "$overall"
