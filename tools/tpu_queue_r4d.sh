#!/bin/bash
# Session TPU queue (round 4, continuation d — post machine-reboot).
#
# The reboot wiped /tmp (queue r4c never ran) AND the persistent compile
# cache (.jax_cache), so the driver's end-of-round bench.py would be fully
# cold. Priorities, in order:
#
#  1. bench.py — re-warms the compile cache for the driver's official
#     end-of-round run and captures the first on-chip e2e_steady with the
#     pipelined loader stage (DataLoader batch_transform/producers).
#  2. tpu_parity — the 13:19 UTC Aug 19 run returned rc=1 with its log
#     lost to the wipe; re-run with a durable log so a numeric failure vs
#     an infra failure is decidable.
#  3. fusion_kernel_parity stages + fused A/B — best-effort (tunnel
#     compiles run 60-90 min each; likely beyond this session).
#
# Dead-man guard: the session touches $HEARTBEAT every turn; the watcher
# kills the process group when it goes stale so an orphaned queue never
# contends with the driver's end-of-round bench.py.
#
#   touch /tmp/tpu_pipeline_heartbeat
#   nohup setsid bash tools/tpu_queue_r4d.sh > /tmp/tpu_queue_r4d.log 2>&1 &
#   echo $! > /tmp/tpu_queue_r4d.pid
set -u
cd "$(dirname "$0")/.."

HEARTBEAT=${HEARTBEAT:-/tmp/tpu_pipeline_heartbeat}
STALE_S=${STALE_S:-2700}
LOGDIR=${LOGDIR:-/root/repo/.logs}
mkdir -p "$LOGDIR"
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

echo "=== tpu_queue_r4d start $(date -u) ==="

BENCH_DEADLINE_S=${BENCH_DEADLINE_S:-14400} python bench.py \
  > "$LOGDIR/bench_r4d.json" 2> "$LOGDIR/bench_r4d.err"
echo "bench.py rc=$? $(date -u)"

echo "--- tpu_parity $(date -u)"
timeout 5400 python tools/tpu_parity.py > "$LOGDIR/tpu_parity_r4d.log" 2>&1
echo "rc=$? (log $LOGDIR/tpu_parity_r4d.log) $(date -u)"

for STAGE in frame_L65_eval frame_L65_train video_L160_train gaze_L40_train; do
  echo "--- fusion_parity $STAGE $(date -u)"
  timeout 9000 env FUSION_PARITY_STAGES=$STAGE python tools/fusion_kernel_parity.py \
    > "$LOGDIR/fusion_parity_${STAGE}.log" 2>&1
  echo "rc=$? (log $LOGDIR/fusion_parity_${STAGE}.log) $(date -u)"
done

echo "--- bench_fused_ab $(date -u)"
timeout 10800 python tools/bench_fused_ab.py > "$LOGDIR/bench_fused_ab_r4d.log" 2>&1
echo "rc=$? $(date -u)"

echo "=== tpu_queue_r4d done $(date -u) ==="
kill %1 2>/dev/null
