#!/bin/bash
# Round-5 queue A: drain the eight stranded round-4 tasks (queue B tail +
# queue C) so the carry-default and int8r-exactness claims get the on-chip
# records the docs cite (VERDICT r4 next-steps #2/#3). Priority order: the
# int8r eval ladder is the exactness done-bar, then the carry slot curve,
# then the capacity rungs and the page=256 A/B. Outputs keep their round-4
# names/paths so every existing doc citation resolves.
#
# Usage: nohup bash tools/tpu_queue_r5.sh >> measurements/r5/queue_a.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
MDIR=measurements/r4
mkdir -p "$MDIR" measurements/r5

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

TASKS="eval_ladder2 slots96_carry slots128_carry dissect8_carry int4_7b_carry int4_13b_carry dissect64_p256c headline2"

for pass in $(seq 1 400); do
  # int8r exactness done-bar: agreement@12 = 1.0 at 10k/100k/1M on chip
  run_task eval_ladder2     9000 python tools/eval_retrieval.py --ladder || true
  # carry-default slot curve above the old knee
  run_task slots96_carry     9000 env ORT_PAGED_SCAN=carry BENCH_SLOTS_LIST=96 BENCH_CACHE=2048 python tools/bench_slots.py 128 1 || true
  run_task slots128_carry    9000 env BENCH_SLOTS_LIST=128 BENCH_KV_INT8=1 BENCH_CACHE=2048 python tools/bench_slots.py 128 1 || true
  # carry at low B (default-flip safety check)
  run_task dissect8_carry    5400 env BENCH_B=8 BENCH_VARIANTS=paged:page,paged:page+carry python tools/bench_decode_step.py 3 || true
  # capacity rungs: the 8-slot aggregate runs the paged batcher -> carry lift
  run_task int4_7b_carry     5400 env BENCH_MODES=int4 python tools/bench_7b.py 64 2 || true
  run_task int4_13b_carry    5400 env BENCH_MODES=int4 BENCH_HIDDEN=5120 BENCH_LAYERS=40 BENCH_HEADS=40 BENCH_KV_HEADS=8 BENCH_INTER=13824 python tools/bench_7b.py 64 2 || true
  # pending page-size A/B from queue B
  run_task dissect64_p256c   5400 env BENCH_B=64 BENCH_PAGE=256 BENCH_VARIANTS=paged:page+carry,paged:head python tools/bench_decode_step.py 3 || true
  # driver headline under the round-5 bench.py default
  run_task headline2         3600 python bench.py || true
  remaining=0
  for t in $TASKS; do
    [ -e "$MDIR/$t.done" ] || remaining=$((remaining + 1))
  done
  echo "$(date -u +%H:%M:%S) pass $pass done; remaining=$remaining"
  if [ "$remaining" -eq 0 ]; then echo "queue drained"; exit 0; fi
  sleep 180
done
