#!/bin/bash
# Resumable TPU measurement queue (round 4) — same protocol as round 3
# (tools/tpu_queue.sh): probe warm-execution RTT before each task, run
# only in healthy windows, done-markers in measurements/r4/.
#
# Usage: bash tools/tpu_queue_r4.sh >> measurements/r4/queue.log 2>&1
set -u
cd "$(dirname "$0")/.."
MDIR=measurements/r4
mkdir -p "$MDIR"

probe() {
  # 600 s budget: the REMOTE COMPILER's latency swings independently of
  # execution health — a cold probe compile took 181 s in a window whose
  # warm RTT was 0.033 s (healthy). Only the warm RTT gates tasks.
  timeout 600 python - <<'EOF' 2>/dev/null
import time, jax.numpy as jnp
x = jnp.ones((256, 256))
float(jnp.sum(x @ x))  # compile outside the timed section
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
    local rc=$?  # read BEFORE $(date): command substitution resets $?
    echo "$(date -u +%H:%M:%S) $name: FAILED (exit $rc) — will retry next pass"
    mv "$MDIR/$name.out" "$MDIR/$name.out.fail" 2>/dev/null || true
  fi
  return 0
}

TASKS="int4_7b int4_13b encode_ab sweep10m northstar_1m northstar_1m_hybrid spec_realized slots_knee slots_bp eval_text headline dissect64a dissect64b dissect64c dissect8 eval_ladder slots96 slots128_kvint8 slots_bp2"

for pass in $(seq 1 200); do
  all_done=1
  # VERDICT #1: w4a8 int4 capacity rungs (kernel default changed to w4a8)
  run_task int4_7b      5400 env BENCH_MODES=int4 python tools/bench_7b.py 64 2 || all_done=0
  run_task int4_13b     5400 env BENCH_MODES=int4 BENCH_HIDDEN=5120 BENCH_LAYERS=40 BENCH_HEADS=40 BENCH_KV_HEADS=8 BENCH_INTER=13824 python tools/bench_7b.py 64 2 || all_done=0
  # VERDICT #4: encoder QKV-fusion A/B
  run_task encode_ab    3600 python tools/bench_encode_ab.py || all_done=0
  # VERDICT #5: 10M int8 rung as ONE program
  run_task sweep10m     7200 env BENCH_N=10000000 BENCH_DTYPE=int8 BENCH_B=128 python bench.py || all_done=0
  # VERDICT #2: north-star serve at the 1M float32 production rung (+hybrid)
  run_task northstar_1m 7200 env BENCH_N=1000000 python tools/bench_serve_tpu.py || all_done=0
  run_task northstar_1m_hybrid 7200 env BENCH_N=1000000 BENCH_HYBRID=1 python tools/bench_serve_tpu.py || all_done=0
  # VERDICT #9: realized speculation on a trained extraction model
  run_task spec_realized 7200 python tools/bench_spec_realized.py 3 || all_done=0
  # VERDICT #6: slot curve to the knee + page-exhaustion backpressure
  # (32,64 completes with the pallas KV-write kernel; 128 bf16 pools
  # don't fit HBM — measured separately with the int8 KV pool below)
  run_task slots_knee   9000 env BENCH_SLOTS_LIST=32,64 BENCH_CACHE=2048 python tools/bench_slots.py 128 2 || all_done=0
  run_task slots_bp     5400 env BENCH_SLOTS_LIST=32 BENCH_POOL_FRAC=0.5 BENCH_CACHE=2048 python tools/bench_slots.py 64 1 || all_done=0
  # VERDICT #8: text-corpus eval rung
  run_task eval_text    5400 python tools/eval_retrieval.py --text || all_done=0
  # headline record in a verified-healthy window (driver also runs it)
  run_task headline     3600 python bench.py || all_done=0
  # decode-step dissection at the knee's batch (B=64): which walk wins,
  # and the pallas kv-write vs the XLA scatter it replaced. Paired
  # tasks share "head" as the cross-task anchor (tunnel swings make
  # cross-task absolutes unreliable; within-task ordering is the signal)
  run_task dissect64a   5400 env BENCH_B=64 BENCH_VARIANTS=paged:head,paged:page python tools/bench_decode_step.py 3 || all_done=0
  run_task dissect64b   5400 env BENCH_B=64 BENCH_VARIANTS=paged:head,paged:dma python tools/bench_decode_step.py 3 || all_done=0
  run_task dissect64c   5400 env BENCH_B=64 BENCH_VARIANTS=scatter,kvwrite python tools/bench_decode_step.py 3 || all_done=0
  # low-B check for the page-walk default flip (head -> page)
  run_task dissect8     5400 env BENCH_B=8 BENCH_VARIANTS=paged:head,paged:page python tools/bench_decode_step.py 3 || all_done=0
  # VERDICT #3's Done bar: int8 agreement@12 with the fp32 rescore wired
  run_task eval_ladder  7200 python tools/eval_retrieval.py --ladder || all_done=0
  # knee refinement: 96 bf16 (fits), 128 with the int8 KV pool (half
  # the pool HBM -> fits; dtype noted), and backpressure that actually
  # engages (pool_frac 0.2 < the 7/16-of-maxp worst-case admission
  # grant, unlike the vacuous 0.5 run)
  run_task slots96      7200 env BENCH_SLOTS_LIST=96 BENCH_CACHE=2048 python tools/bench_slots.py 128 1 || all_done=0
  run_task slots128_kvint8 7200 env BENCH_SLOTS_LIST=128 BENCH_KV_INT8=1 BENCH_CACHE=2048 python tools/bench_slots.py 128 1 || all_done=0
  run_task slots_bp2    5400 env BENCH_SLOTS_LIST=32 BENCH_POOL_FRAC=0.2 BENCH_CACHE=2048 python tools/bench_slots.py 64 1 || all_done=0
  remaining=0
  for t in $TASKS; do
    [ -e "$MDIR/$t.done" ] || remaining=$((remaining+1))
  done
  echo "$(date -u +%H:%M:%S) pass $pass done; remaining=$remaining"
  if [ "$remaining" -eq 0 ]; then echo "queue drained"; exit 0; fi
  [ "$all_done" -eq 0 ] && sleep 180
done
