#!/bin/bash
# StreamRate battery: sustained-rate + bounded-state evidence for the
# three stateful streaming shapes (the r12 SCALE.md streaming table's
# recipe, promoted from tmp/). One STREAMRATE JSON line per run.
#
# Usage: tools/measure_streamrate.sh [rowsPerBatch] [batches] [modes] [changelog]
#   defaults: 100000 30 "session dedup tws" 0
#   changelog=1 sets SPARK_GRAFT_SR_CHANGELOG=1 (RocksDB changelog
#   checkpointing) — record both variants when comparing recovery cost.
set -e
cd "$(dirname "$0")/.."
RPB="${1:-100000}"; BATCHES="${2:-30}"; MODES="${3:-session dedup tws}"
CHANGELOG="${4:-0}"
for m in $MODES; do
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SR_CHANGELOG="$CHANGELOG" \
    sbt -batch "runMain graft.StreamRate $m $RPB $BATCHES" 2>&1 \
    | grep -E "STREAMRATE|Exception"
done
