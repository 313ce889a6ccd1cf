#!/bin/bash
# On-chip validation queue for when the TPU service returns (round 4).
# Run AFTER bench.py finishes (the chip is exclusive):
#   nohup bash tools/tpu_queue.sh > /tmp/tpu_queue.log 2>&1 &
#
# Each phase is preceded by a probe-with-backoff (the service flaps for
# hours at a time — CLAUDE.md; one cold attempt per phase would burn every
# remaining phase on a blocked backend init). Phases:
#  1. batch-size guard validation: flagship step at batch 4/8/16/32
#     (docs/PERF.md batch-8 fault; the auto-guard must keep every size up)
#  2. 192px training-geometry ablation (cold-step lever)
#  3. Pallas window-kernel parity at flagship shapes (fwd + grads)
set -u
cd "$(dirname "$0")/.."

PROBE_TIMEOUT=${PROBE_TIMEOUT:-600}
PROBE_RETRIES=${PROBE_RETRIES:-6}
PROBE_BACKOFF=${PROBE_BACKOFF:-120}

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
  echo "rc=$? (log $log)"
}

echo "=== tpu_queue start $(date -u) ==="

for B in 4 8 16 32; do
  run_phase "step_at_batch $B" /tmp/step_at_batch_$B.log 5400 \
    env STEP_BATCH=$B python tools/step_at_batch.py
done

run_phase "192-geometry bench_core" /tmp/bench_core_192.log 7200 \
  env ROUTEFORMER_SWIN_GEOMETRY=192 python tools/bench_core.py

run_phase "head-repack(d64) bench_core" /tmp/bench_core_h64.log 7200 \
  env ROUTEFORMER_SWIN_HEADS=64 python tools/bench_core.py

run_phase "tpu_parity" /tmp/tpu_parity_r4.log 5400 \
  python tools/tpu_parity.py

echo "=== tpu_queue done $(date -u) ==="
