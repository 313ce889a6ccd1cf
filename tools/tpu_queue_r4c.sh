#!/bin/bash
# Session TPU queue (round 4, continuation c): close the two open on-chip
# threads and capture the pipelined-loader e2e_steady.
#
#  1. tpu_parity re-run — the 13:19 UTC run returned rc=1 with its log lost
#     to a /tmp wipe, minutes after a service flap; re-run with the log in
#     a durable path so a numeric failure vs an infra failure is decidable.
#  2. bench_e2e — first on-chip run with the pipelined loader stage
#     (DataLoader batch_transform/producers) wired into the steady phase;
#     the official 95.8 clips/s predates it.
#  3. fusion_kernel_parity, one stage per invocation (tunnel compiles run
#     60-90 min; the persistent cache makes later invocations resume).
#  4. bench_fused_ab — interleaved A/B once the kernel stages compile.
#
# Dead-man guard: same contract as tools/tpu_pipeline.sh — the session
# touches $HEARTBEAT every turn; the watcher kills the process group when
# it goes stale so an orphaned queue never contends with the driver's
# end-of-round bench.py.
#
#   touch /tmp/tpu_pipeline_heartbeat
#   nohup setsid bash tools/tpu_queue_r4c.sh > /tmp/tpu_queue_r4c.log 2>&1 &
#   echo $! > /tmp/tpu_queue_r4c.pid
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

PROBE_TIMEOUT=${PROBE_TIMEOUT:-600}
PROBE_RETRIES=${PROBE_RETRIES:-8}
PROBE_BACKOFF=${PROBE_BACKOFF:-180}

probe() {
  for i in $(seq 1 "$PROBE_RETRIES"); do
    if timeout "$PROBE_TIMEOUT" python -c \
      "import jax; jax.devices(); import jax.numpy as jnp; assert int((jnp.arange(8)*2).sum()) == 56" \
      > /dev/null 2>&1; then
      return 0
    fi
    echo "probe $i/$PROBE_RETRIES failed $(date -u); backoff ${PROBE_BACKOFF}s"
    sleep "$PROBE_BACKOFF"
  done
  return 1
}

run_phase() {
  local label=$1 log=$2 tmo=$3
  shift 3
  if ! probe; then
    echo "SKIP $label: TPU unavailable after $PROBE_RETRIES probes $(date -u)"
    return 1
  fi
  echo "--- $label $(date -u)"
  timeout "$tmo" "$@" > "$log" 2>&1
  echo "rc=$? (log $log) $(date -u)"
}

echo "=== tpu_queue_r4c start $(date -u) ==="

run_phase "tpu_parity" "$LOGDIR/tpu_parity_r4c.log" 5400 \
  python tools/tpu_parity.py

run_phase "bench_e2e (pipelined loader)" "$LOGDIR/bench_e2e_r4c.log" 10800 \
  python tools/bench_e2e.py

for STAGE in frame_L65_eval frame_L65_train video_L160_train gaze_L40_train; do
  run_phase "fusion_parity $STAGE" "$LOGDIR/fusion_parity_${STAGE}.log" 9000 \
    env FUSION_PARITY_STAGES=$STAGE python tools/fusion_kernel_parity.py
done

run_phase "bench_fused_ab" "$LOGDIR/bench_fused_ab_r4c.log" 10800 \
  python tools/bench_fused_ab.py

echo "=== tpu_queue_r4c done $(date -u) ==="
kill %1 2>/dev/null
