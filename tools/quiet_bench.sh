#!/bin/bash
# Wait for a quiet host window (shared sandbox) then run the scaling bench.
# Usage: tools/quiet_bench.sh [max_wait_minutes] [out_json]
set -u
MAX_WAIT_MIN=${1:-45}
OUT=${2:-/tmp/bench_quiet.json}
THRESH=3.0
deadline=$(( $(date +%s) + MAX_WAIT_MIN * 60 ))
while true; do
  load=$(cut -d' ' -f1 /proc/loadavg)
  ok=$(python3 -c "print(1 if $load < $THRESH else 0)")
  if [ "$ok" = "1" ]; then
    echo "[quiet_bench] load=$load — running bench $(date)"
    break
  fi
  if [ "$(date +%s)" -ge "$deadline" ]; then
    echo "[quiet_bench] timed out waiting for quiet host (load=$load); running anyway"
    break
  fi
  sleep 30
done
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_CONVS=${SPARK_GRAFT_BENCH_CONVS:-150000} \
SPARK_GRAFT_SCALING=${SPARK_GRAFT_SCALING:-2,8} \
SPARK_GRAFT_BENCH_REPS=${SPARK_GRAFT_BENCH_REPS:-3} \
SPARK_GRAFT_SKIP_QUERIES=1 \
SPARK_DRIVER_MEM=32g \
sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' > "$OUT"
echo "[quiet_bench] done:"
cat "$OUT"
