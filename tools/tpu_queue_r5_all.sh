#!/bin/bash
# Round-5 unified queue: replaces the A/B/C chain with ONE priority-
# ordered runner so the novel records (hostres, north-star int8r, the
# 10M exact rung, the new headline) land before the ledger re-records —
# the A/B/C sequencing had them gated behind hours of re-measurement.
# Output names/paths are unchanged, so every doc citation resolves.
#
# Usage: nohup bash tools/tpu_queue_r5_all.sh >> measurements/r5/queue_all.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
R4=measurements/r4
R5=measurements/r5
mkdir -p "$R4" "$R5"

# Wait for any orphaned in-flight task from the killed A/B/C runners.
while pgrep -f "bench_slots|bench_decode_step|bench_7b|eval_retrieval|bench_serve_tpu|probe_hostres|bench_encode_ab|bench_spec_realized" >/dev/null 2>&1; do
  echo "$(date -u +%H:%M:%S) waiting for an in-flight task to finish"
  sleep 120
done

# The killed runner couldn't write slots96_carry's .done marker; adopt
# the orphan's output if it looks complete (bench_slots prints a JSON
# line per slot point).
if [ ! -e "$R4/slots96_carry.done" ] && [ -s "$R4/slots96_carry.out" ] \
   && grep -q '"slots"' "$R4/slots96_carry.out"; then
  echo "adopted_orphan=1" > "$R4/slots96_carry.done"
  echo "$(date -u +%H:%M:%S) slots96_carry: adopted orphaned output"
fi

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

run_task() {  # run_task <dir> <name> <timeout_s> <cmd...>
  local dir=$1 name=$2 tmo=$3; shift 3
  [ -e "$dir/$name.done" ] && return 0
  local rtt
  rtt=$(probe) || rtt=""
  if [ -z "$rtt" ] || ! awk "BEGIN{exit !($rtt < 0.15)}"; then
    echo "$(date -u +%H:%M:%S) $name: tunnel degraded (rtt=${rtt:-dead}), deferring"
    return 1
  fi
  echo "$(date -u +%H:%M:%S) $name: starting (rtt=$rtt)"
  if timeout "$tmo" "$@" > "$dir/$name.out" 2> "$dir/$name.err"; then
    echo "rtt_at_start=$rtt" > "$dir/$name.done"
    echo "$(date -u +%H:%M:%S) $name: DONE"
  else
    local rc=$?
    echo "$(date -u +%H:%M:%S) $name: FAILED (exit $rc) — will retry next pass"
    mv "$dir/$name.out" "$dir/$name.out.fail" 2>/dev/null || true
  fi
  return 0
}

ALL_DONE_CHECK() {
  local n=0
  for t in slots96_carry slots128_carry dissect8_carry int4_7b_carry int4_13b_carry dissect64_p256c headline2; do
    [ -e "$R4/$t.done" ] || n=$((n+1))
  done
  for t in hostres_1m northstar_1m_int8r spec_realized2 encode_ab_16x128 encode_ab_32x128 slots192_carry sweep10m_int8r_hostres; do
    [ -e "$R5/$t.done" ] || n=$((n+1))
  done
  echo "$n"
}

for pass in $(seq 1 400); do
  # -- novel records first ------------------------------------------------
  # carry slot curve above the old knee (paired with the in-flight 96)
  run_task $R4 slots128_carry    9000 env BENCH_SLOTS_LIST=128 BENCH_KV_INT8=1 BENCH_CACHE=2048 python tools/bench_slots.py 128 1 || true
  # host-residual capability + cost on the real runtime (VERDICT #8)
  run_task $R5 hostres_1m        5400 python tools/probe_hostres.py 1000000 || true
  # north-star serve on int8r + rank-64 hybrid (VERDICT #5)
  run_task $R5 northstar_1m_int8r 9000 env BENCH_N=1000000 BENCH_DTYPE=int8r BENCH_HYBRID=1 BENCH_CB_RANK=64 BENCH_CONC=100 python tools/bench_serve_tpu.py || true
  # driver headline preview under the int8r default (VERDICT #3)
  # BENCH_SKIP_PROBE: run_task's own rtt gate already vouches for the
  # tunnel; bench.py's in-process probe child once timed out in a
  # healthy window and recorded a false tunnel-dead zero as .done
  run_task $R4 headline2         3600 env BENCH_SKIP_PROBE=1 python bench.py || true
  # the 10M exact rung (VERDICT #8) — after hostres_1m proves the path
  if [ -e "$R5/hostres_1m.done" ]; then
    run_task $R5 sweep10m_int8r_hostres 9000 env BENCH_N=10000000 BENCH_DTYPE=int8r BENCH_RESIDUAL=host BENCH_B=128 BENCH_GEN=262144 python bench.py || true
  fi
  # realized speculation at 6000 training steps (VERDICT #7)
  run_task $R5 spec_realized2    9000 env STEPS=6000 python tools/bench_spec_realized.py 3 || true
  # QKV fusion A/B at the serve-time query shapes (VERDICT #4)
  run_task $R5 encode_ab_16x128  5400 python tools/bench_encode_ab.py 16 128 || true
  run_task $R5 encode_ab_32x128  5400 python tools/bench_encode_ab.py 32 128 || true
  # -- ledger re-records --------------------------------------------------
  run_task $R4 dissect8_carry    5400 env BENCH_B=8 BENCH_VARIANTS=paged:page,paged:page+carry python tools/bench_decode_step.py 3 || true
  run_task $R4 int4_7b_carry     5400 env BENCH_MODES=int4 python tools/bench_7b.py 64 2 || true
  run_task $R4 int4_13b_carry    5400 env BENCH_MODES=int4 BENCH_HIDDEN=5120 BENCH_LAYERS=40 BENCH_HEADS=40 BENCH_KV_HEADS=8 BENCH_INTER=13824 python tools/bench_7b.py 64 2 || true
  run_task $R4 dissect64_p256c   5400 env BENCH_B=64 BENCH_PAGE=256 BENCH_VARIANTS=paged:page+carry,paged:head python tools/bench_decode_step.py 3 || true
  run_task $R5 slots192_carry    9000 env BENCH_SLOTS_LIST=192 BENCH_KV_INT8=1 BENCH_CACHE=2048 python tools/bench_slots.py 128 1 || true
  # the orphaned 96-slot point, re-run only if its output was unusable
  run_task $R4 slots96_carry     9000 env ORT_PAGED_SCAN=carry BENCH_SLOTS_LIST=96 BENCH_CACHE=2048 python tools/bench_slots.py 128 1 || true
  remaining=$(ALL_DONE_CHECK)
  echo "$(date -u +%H:%M:%S) pass $pass done; remaining=$remaining"
  if [ "$remaining" -eq 0 ]; then echo "queue drained"; exit 0; fi
  sleep 180
done
