#!/bin/bash
# Resumable TPU measurement queue (round 3).
#
# The remote-compile tunnel's health swings between ~0.05 s RTT
# (healthy) and minutes-long stalls (degraded) on an hours timescale
# (docs/BENCHMARKS.md "Measurement caveat"). This watcher probes RTT
# before each queued task and only runs tasks in healthy windows, so
# every recorded number carries a verified-healthy marker. Done
# markers live in measurements/r3/ (in-repo: survives VM restarts,
# unlike the round-2 /tmp queue, which a restart silently dropped).
#
# Usage: bash tools/tpu_queue.sh >> measurements/r3/queue.log 2>&1
set -u
cd "$(dirname "$0")/.."
MDIR=measurements/r3
mkdir -p "$MDIR"

probe() {
  # Execution RTT of a WARM (already-compiled) program — the thing that
  # actually bounds timed benchmark loops. The old probe timed
  # jnp.sum(x@x), whose reduction program cold-compiles inside the timed
  # section, so it measured remote-COMPILER latency (0.5 s..30 s swings)
  # and deferred through perfectly healthy execution windows. Median of 3
  # warm round trips; healthy threshold 0.15 s (healthy is ~0.02-0.05 s).
  timeout 180 python - <<'EOF' 2>/dev/null
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

for pass in $(seq 1 200); do
  all_done=1
  run_task headline     2400 python bench.py || all_done=0
  run_task eval_ladder  7200 python tools/eval_retrieval.py --ladder || all_done=0
  run_task slots_bf16   7200 python tools/bench_slots.py 128 2 || all_done=0
  run_task slots_int8w  7200 env BENCH_INT8=1 python tools/bench_slots.py 128 2 || all_done=0
  run_task slots_int4   7200 env BENCH_INT4=1 BENCH_KV_INT8=1 python tools/bench_slots.py 128 2 || all_done=0
  run_task decode_3way  7200 python tools/bench_decode.py 128 2 || all_done=0
  run_task northstar    7200 python tools/bench_serve_tpu.py || all_done=0
  remaining=0
  for t in headline eval_ladder slots_bf16 slots_int8w slots_int4 decode_3way northstar; do
    [ -e "$MDIR/$t.done" ] || remaining=$((remaining+1))
  done
  if [ "$remaining" -eq 0 ]; then echo "queue drained"; exit 0; fi
  [ "$all_done" -eq 0 ] && sleep 180
done
