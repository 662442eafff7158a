#!/bin/bash
# Round-4 follow-up TPU queue: page-size A/B and KV-write structure
# probe. Start ONLY after tools/tpu_queue_r4.sh drains (one chip, one
# queue). Same protocol: warm-RTT gate, done-markers, resumable.
#
# Usage: bash tools/tpu_queue_r4b.sh >> measurements/r4/queue_b.log 2>&1
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

TASKS="dissect64_carry slots64_carry kvwrite_probe kvwrite_probe_i8 dissect64_p256c slots96_carry"

for pass in $(seq 1 100); do
  all_done=1
  # THE hypothesis test: the layer scan's xs/ys pool stacking copies
  # 2x67 MB per layer per step; ORT_PAGED_SCAN=carry flows the pools
  # through the scan carry via the aliased pallas writes instead
  # (models/decoder.py). Bit-identical by test; this measures it.
  run_task dissect64_carry   5400 env BENCH_B=64 BENCH_VARIANTS=paged:page,paged:page+carry python tools/bench_decode_step.py 3 || all_done=0
  # end-to-end: does the flat 32->64 curve (slots_knee: 1718/1720)
  # unflatten with the carry scan?
  run_task slots64_carry     9000 env ORT_PAGED_SCAN=carry BENCH_SLOTS_LIST=32,64 BENCH_CACHE=2048 python tools/bench_slots.py 128 2 || all_done=0
  # Structure probe: inscan (serving xs/ys) vs flat (no scan) vs single
  run_task kvwrite_probe     5400 python tools/bench_kvwrite_probe.py 3 || all_done=0
  run_task kvwrite_probe_i8  5400 env BENCH_KV_INT8=1 python tools/bench_kvwrite_probe.py 3 || all_done=0
  # page=256 on top of carry: halves the walk's grid steps; write RMW
  # bytes double — decides whether page size moves post-carry
  run_task dissect64_p256c   5400 env BENCH_B=64 BENCH_PAGE=256 BENCH_VARIANTS=paged:page+carry,paged:head python tools/bench_decode_step.py 3 || all_done=0
  run_task slots96_carry     9000 env ORT_PAGED_SCAN=carry BENCH_SLOTS_LIST=96 BENCH_CACHE=2048 python tools/bench_slots.py 128 1 || all_done=0
  remaining=0
  for t in $TASKS; do
    [ -e "$MDIR/$t.done" ] || remaining=$((remaining+1))
  done
  echo "$(date -u +%H:%M:%S) pass $pass done; remaining=$remaining"
  if [ "$remaining" -eq 0 ]; then echo "queue drained"; exit 0; fi
  [ "$all_done" -eq 0 ] && sleep 180
done
