#!/bin/bash
# Round-5 queue B: new measurements (VERDICT r4 #4/#5/#6/#7/#8).
# Waits for queue A (tools/tpu_queue_r5.sh) to drain so two TPU tasks
# never run concurrently on this 1-core VM.
#
# Usage: nohup bash tools/tpu_queue_r5b.sh >> measurements/r5/queue_b.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
ADIR=measurements/r4
MDIR=measurements/r5
mkdir -p "$MDIR"

A_TASKS="eval_ladder2 slots96_carry slots128_carry dissect8_carry int4_7b_carry int4_13b_carry dissect64_p256c headline2"

a_remaining() {
  local n=0 t
  for t in $A_TASKS; do
    [ -e "$ADIR/$t.done" ] || n=$((n + 1))
  done
  echo "$n"
}

while [ "$(a_remaining)" -gt 0 ]; do
  echo "$(date -u +%H:%M:%S) waiting for queue A ($(a_remaining) tasks left)"
  sleep 300
done
echo "$(date -u +%H:%M:%S) queue A drained; starting queue B"

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

TASKS="hostres_1m encode_ab_16x128 encode_ab_32x128 northstar_1m_int8r spec_realized2 slots192_carry"

for pass in $(seq 1 400); do
  # VERDICT #8: host-resident residual plane feasibility + cost (the 10M
  # exact-ranking design; 1M first — q1 fits HBM beside the f32 staging)
  run_task hostres_1m        5400 python tools/probe_hostres.py 1000000 || true
  # VERDICT #4: QKV fusion A/B at the serve-time query shape (M<=4k)
  run_task encode_ab_16x128  5400 python tools/bench_encode_ab.py 16 128 || true
  run_task encode_ab_32x128  5400 python tools/bench_encode_ab.py 32 128 || true
  # VERDICT #5: north-star serve on the int8r index + rank-64 ColBERT
  # (int8r stores 2.1 GB at 1M vs fp32's 4.3 GB — room for rank 64)
  run_task northstar_1m_int8r 9000 env BENCH_N=1000000 BENCH_DTYPE=int8r BENCH_HYBRID=1 BENCH_CB_RANK=64 BENCH_CONC=100 python tools/bench_serve_tpu.py || true
  # VERDICT #7: train the draft to its claim band (600 steps barely
  # moved loss 6.76->6.49, quote_acc 0.0 — induction needs thousands)
  run_task spec_realized2    9000 env STEPS=6000 python tools/bench_spec_realized.py 3 || true
  # VERDICT #6: the carry curve's new knee — 192 slots, int8 KV pool
  run_task slots192_carry    9000 env BENCH_SLOTS_LIST=192 BENCH_KV_INT8=1 BENCH_CACHE=2048 python tools/bench_slots.py 128 1 || true
  remaining=0
  for t in $TASKS; do
    [ -e "$MDIR/$t.done" ] || remaining=$((remaining + 1))
  done
  echo "$(date -u +%H:%M:%S) pass $pass done; remaining=$remaining"
  if [ "$remaining" -eq 0 ]; then echo "queue drained"; exit 0; fi
  sleep 180
done
