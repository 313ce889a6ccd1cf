#!/bin/bash
# In-round TPU pipeline with a dead-man switch (round 4).
#
# Runs bench.py (outage-proof probe/retry orchestrator) and then the
# on-chip validation queue, while guarding against the one failure mode a
# nohup'd pipeline adds: outliving the interactive session and contending
# with the DRIVER's own end-of-round bench.py for the exclusive TPU chip.
#
# The guard: the supervising session touches $HEARTBEAT every few
# minutes; a watcher kills the whole pipeline process group when the
# heartbeat goes stale (>$STALE_S), so an abandoned pipeline dies on its
# own well before the driver's bench starts.
#
#   touch /tmp/tpu_pipeline_heartbeat   # session, every turn
#   nohup setsid bash tools/tpu_pipeline.sh > /tmp/tpu_pipeline.log 2>&1 &
#   echo $! > /tmp/tpu_pipeline.pid     # kill -- -PID stops everything
set -u
cd "$(dirname "$0")/.."

HEARTBEAT=${HEARTBEAT:-/tmp/tpu_pipeline_heartbeat}
STALE_S=${STALE_S:-2700}
BENCH_DEADLINE_S=${BENCH_DEADLINE_S:-21600}

touch "$HEARTBEAT"

watcher() {
  while sleep 120; do
    local age=$(( $(date +%s) - $(stat -c %Y "$HEARTBEAT" 2>/dev/null || echo 0) ))
    if [ "$age" -gt "$STALE_S" ]; then
      echo "heartbeat stale (${age}s) $(date -u): killing pipeline group"
      kill -- -$$ 2>/dev/null
      exit 0
    fi
  done
}
watcher &

BENCH_DEADLINE_S=$BENCH_DEADLINE_S python bench.py \
  > /tmp/bench_r4b.json 2> /tmp/bench_r4b.err
echo "bench.py rc=$? $(date -u)"

bash tools/tpu_queue.sh > /tmp/tpu_queue_r4.log 2>&1
echo "tpu_queue rc=$? $(date -u)"

kill %1 2>/dev/null
