#!/bin/bash
# Round-4 queue C: re-records under the carry-scan default + the int8r
# eval rung. Start ONLY after tools/tpu_queue_r4b.sh drains.
#
# Usage: bash tools/tpu_queue_r4c.sh >> measurements/r4/queue_c.log 2>&1
set -u
cd "$(dirname "$0")/.."
MDIR=measurements/r4
mkdir -p "$MDIR"

probe() {
  timeout 600 python - <<'EOF' 2>/dev/null
import time, jax.numpy as jnp
x = jnp.ones((256, 256))
float(jnp.sum(x @ x))
ts = []
for _ in range(3):
    t0 = time.time(); float(jnp.sum(x @ x)); ts.append(time.time() - t0)
print(f"{sorted(ts)[1]:.3f}")
EOF
}

run_task() {  # run_task <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  [ -e "$MDIR/$name.done" ] && return 0
  local rtt
  rtt=$(probe) || rtt=""
  if [ -z "$rtt" ] || ! awk "BEGIN{exit !($rtt < 0.15)}"; then
    echo "$(date -u +%H:%M:%S) $name: tunnel degraded (rtt=${rtt:-dead}), deferring"
    return 1
  fi
  echo "$(date -u +%H:%M:%S) $name: starting (rtt=$rtt)"
  if timeout "$tmo" "$@" > "$MDIR/$name.out" 2> "$MDIR/$name.err"; then
    echo "rtt_at_start=$rtt" > "$MDIR/$name.done"
    echo "$(date -u +%H:%M:%S) $name: DONE"
  else
    local rc=$?
    echo "$(date -u +%H:%M:%S) $name: FAILED (exit $rc) — will retry next pass"
    mv "$MDIR/$name.out" "$MDIR/$name.out.fail" 2>/dev/null || true
  fi
  return 0
}

TASKS="eval_ladder2 dissect8_carry slots128_carry int4_7b_carry int4_13b_carry headline2"

for pass in $(seq 1 100); do
  all_done=1
  # VERDICT #3 done-bar: the int8r rung should hit agreement@12 = 1.0
  run_task eval_ladder2     9000 python tools/eval_retrieval.py --ladder || all_done=0
  # carry at low B (default-flip safety check)
  run_task dissect8_carry   5400 env BENCH_B=8 BENCH_VARIANTS=paged:page,paged:page+carry python tools/bench_decode_step.py 3 || all_done=0
  # 128-slot headline under the carry default (int8 KV pool for HBM)
  run_task slots128_carry   9000 env BENCH_SLOTS_LIST=128 BENCH_KV_INT8=1 BENCH_CACHE=2048 python tools/bench_slots.py 128 1 || all_done=0
  # capacity rungs: the 8-slot aggregate runs the paged batcher -> carry lift
  run_task int4_7b_carry    5400 env BENCH_MODES=int4 python tools/bench_7b.py 64 2 || all_done=0
  run_task int4_13b_carry   5400 env BENCH_MODES=int4 BENCH_HIDDEN=5120 BENCH_LAYERS=40 BENCH_HEADS=40 BENCH_KV_HEADS=8 BENCH_INTER=13824 python tools/bench_7b.py 64 2 || all_done=0
  run_task headline2        3600 python bench.py || all_done=0
  remaining=0
  for t in $TASKS; do
    [ -e "$MDIR/$t.done" ] || remaining=$((remaining+1))
  done
  echo "$(date -u +%H:%M:%S) pass $pass done; remaining=$remaining"
  if [ "$remaining" -eq 0 ]; then echo "queue drained"; exit 0; fi
  [ "$all_done" -eq 0 ] && sleep 180
done
