#!/bin/bash
# On-chip validation queue for when the TPU service returns (round 4).
# Run AFTER bench.py finishes (the chip is exclusive):
#   nohup bash tools/tpu_queue.sh > /tmp/tpu_queue.log 2>&1 &
#
# Phases (each timeout-bounded, logs under /tmp):
#  1. batch-size guard validation: flagship step at batch 4/8/16/32
#     (docs/PERF.md batch-8 fault; the auto-guard must keep every size up)
#  2. 192px training-geometry ablation (cold-step lever)
#  3. Pallas window-kernel parity at flagship shapes (fwd + grads)
set -u
cd "$(dirname "$0")/.."

echo "=== tpu_queue start $(date -u) ==="

for B in 4 8 16 32; do
  echo "--- step_at_batch $B $(date -u)"
  timeout 5400 env STEP_BATCH=$B python tools/step_at_batch.py \
    > /tmp/step_at_batch_$B.log 2>&1
  echo "rc=$? (log /tmp/step_at_batch_$B.log)"
done

echo "--- 192-geometry bench_core $(date -u)"
timeout 7200 env ROUTEFORMER_SWIN_GEOMETRY=192 python tools/bench_core.py \
  > /tmp/bench_core_192.log 2>&1
echo "rc=$? (log /tmp/bench_core_192.log)"

echo "--- tpu_parity $(date -u)"
timeout 5400 python tools/tpu_parity.py > /tmp/tpu_parity_r4.log 2>&1
echo "rc=$? (log /tmp/tpu_parity_r4.log)"

echo "=== tpu_queue done $(date -u) ==="
