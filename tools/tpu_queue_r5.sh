#!/bin/bash
# Session TPU queue (round 5).
#
# Stage plan (VERDICT round-4 "next round" items, in priority order):
#  1. bench.py — the quiet-host official-artifact rehearsal with the new
#     host-quiescence guard; also re-warms the compile cache for the
#     driver's end-of-round run. THIS is the round's first deliverable.
#  2. (later stages appended by the session as they become ready:
#     fused-stack decision runs, loader A/B, cold-step levers.)
#
# Dead-man guard: the session touches $HEARTBEAT every turn; the watcher
# kills the queue when it goes stale so an orphaned queue never contends
# with the driver's end-of-round bench.py for the exclusive chip.
# Round-4 lesson (ADVICE #2): `kill -- -$$` silently fails when the script
# is not a process-group leader, and even as leader a `timeout` child that
# re-execs can escape — the watcher now also kills the direct child tree.
#
#   touch /tmp/tpu_pipeline_heartbeat
#   nohup setsid bash tools/tpu_queue_r5.sh > /tmp/tpu_queue_r5.log 2>&1 &
#   echo $! > /tmp/tpu_queue_r5.pid
set -u
cd "$(dirname "$0")/.."

HEARTBEAT=${HEARTBEAT:-/tmp/tpu_pipeline_heartbeat}
STALE_S=${STALE_S:-2700}
LOGDIR=${LOGDIR:-/root/repo/.logs}
mkdir -p "$LOGDIR"
touch "$HEARTBEAT"

kill_tree() {
  # kill the full descendant tree of $1 (children first), then $1
  local pid=$1
  for c in $(ps -o pid= --ppid "$pid" 2>/dev/null); do
    kill_tree "$c"
  done
  kill "$pid" 2>/dev/null
}

watcher() {
  while sleep 120; do
    local age=$(( $(date +%s) - $(stat -c %Y "$HEARTBEAT" 2>/dev/null || echo 0) ))
    if [ "$age" -gt "$STALE_S" ]; then
      echo "heartbeat stale (${age}s) $(date -u): killing pipeline"
      # group kill (works when launched via setsid) AND explicit tree walk
      # (works when it wasn't / when a child escaped the group)
      for c in $(ps -o pid= --ppid $$); do
        [ "$c" != "$BASHPID" ] && kill_tree "$c"
      done
      kill -- -$$ 2>/dev/null
      kill $$ 2>/dev/null
      exit 0
    fi
  done
}
watcher &
WATCHER_PID=$!

echo "=== tpu_queue_r5 start $(date -u) ==="

echo "--- bench.py (quiet-host rehearsal) $(date -u)"
BENCH_DEADLINE_S=${BENCH_DEADLINE_S:-10800} python bench.py \
  > "$LOGDIR/bench_r5a.json" 2> "$LOGDIR/bench_r5a.err"
echo "bench.py rc=$? $(date -u)"

# Later stages are separate scripts so the session can append work without
# restarting the queue: run everything matching .logs/queue_r5_stage_*.sh
# in lexical order as they appear, until a sentinel stops us.
for i in $(seq 1 240); do
  for s in "$LOGDIR"/queue_r5_stage_*.sh; do
    [ -e "$s" ] || continue
    done_marker="${s%.sh}.done"
    [ -e "$done_marker" ] && continue
    echo "--- stage $s $(date -u)"
    bash "$s" > "${s%.sh}.log" 2>&1
    echo "stage rc=$? (log ${s%.sh}.log) $(date -u)"
    touch "$done_marker"
  done
  [ -e "$LOGDIR/queue_r5_stop" ] && break
  sleep 15
done

echo "=== tpu_queue_r5 done $(date -u) ==="
kill "$WATCHER_PID" 2>/dev/null
