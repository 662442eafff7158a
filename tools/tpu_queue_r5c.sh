#!/bin/bash
# Round-5 queue C: the 10M exact-ranking rung (VERDICT r4 #8). Waits for
# queue B (which contains the hostres_1m capability probe) to drain.
#
# Usage: nohup bash tools/tpu_queue_r5c.sh >> measurements/r5/queue_c.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
MDIR=measurements/r5
mkdir -p "$MDIR"

B_TASKS="hostres_1m encode_ab_16x128 encode_ab_32x128 northstar_1m_int8r spec_realized2 slots192_carry"

b_remaining() {
  local n=0 t
  for t in $B_TASKS; do
    [ -e "$MDIR/$t.done" ] || n=$((n + 1))
  done
  echo "$n"
}

while [ "$(b_remaining)" -gt 0 ]; do
  echo "$(date -u +%H:%M:%S) waiting for queue B ($(b_remaining) tasks left)"
  sleep 300
done
echo "$(date -u +%H:%M:%S) queue B drained; starting queue C"

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

run_task() {
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

TASKS="sweep10m_int8r_hostres"

for pass in $(seq 1 400); do
  # the 10M fp32-oracle-exact rung: int8 q1 scan from HBM (10 GB),
  # host-resident q2 rescore plane (10 GB, 64 rows/query over PCIe).
  # GEN shrunk to 256k rows so generation staging peaks ~1 GB f32
  # beside the 10 GB q1 plane.
  run_task sweep10m_int8r_hostres 9000 env BENCH_N=10000000 BENCH_DTYPE=int8r BENCH_RESIDUAL=host BENCH_B=128 BENCH_GEN=262144 python bench.py || true
  remaining=0
  for t in $TASKS; do
    [ -e "$MDIR/$t.done" ] || remaining=$((remaining + 1))
  done
  echo "$(date -u +%H:%M:%S) pass $pass done; remaining=$remaining"
  if [ "$remaining" -eq 0 ]; then echo "queue drained"; exit 0; fi
  sleep 180
done
