"""Dissect the gap between bench.py's fused-path number and the kernel
dissection at the same rung (1M f32x2 B=32: 17.2 ms/sweep headline vs
7.2 ms/sweep for the u2 kernel, both healthy-window).

Interleaves, round-robin in ONE run (min over rounds):
  kern_fixed   — topk_pallas(u2) with a FIXED query batch (dissection loop)
  kern_rot     — topk_pallas(u2) rotating over 20 query batches (bench loop)
  auto_rot     — cosine_topk auto policy, rotating batches (bench's actual
                 callee: adds the segmentation wrapper + auto routing)
  xla_rot      — topk_xla_compensated, rotating (the fallback at this rung)
  f32_xla_rot  — plain-f32 corpus + topk_xla HIGHEST (candidate faster
                 exact config seen in the 1M dissection: 5.06 ms)

Whichever pair diverges names the cost: loop shape (fixed vs rot),
wrapper (kern vs auto), or kernel-vs-XLA routing.

Holding the f32 staging corpus AND the x2 split AND XLA score temps
OOMs the 16 GB chip at 1M, so the run is split by corpus layout:
``MODE=x2`` (default) measures the x2-layout variants and frees the f32
staging buffer; ``MODE=f32`` measures the plain-f32 ones.

Usage: [MODE=x2|f32] python tools/bench_fused_gap.py [N] [B] [ROUNDS]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from outline_rag_tpu.ops.topk import (
    cosine_topk,
    split_f32_bf16x2,
    topk_pallas,
    topk_xla,
    topk_xla_compensated,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
D, K, BLOCK_N = 1024, 12, 1024
N = (N // BLOCK_N) * BLOCK_N

MODE = os.environ.get("MODE", "x2")  # x2 | f32 | both (both needs N<=500k)

kc, kq = jax.random.split(jax.random.key(0))


@jax.jit
def _gen_corpus(key):
    c = jax.random.normal(key, (N, D), jnp.float32)
    return c / jnp.linalg.norm(c, axis=1, keepdims=True)


corpus_f32 = jax.block_until_ready(_gen_corpus(kc))
corpus_x2 = None
if MODE in ("x2", "both"):
    corpus_x2 = jax.block_until_ready(split_f32_bf16x2(corpus_f32))
    if MODE == "x2":
        corpus_f32.delete()  # free 4 GB: x2 variants never touch it
NB = 20
qb = jax.random.normal(kq, (NB, B, D), jnp.float32)
qb = qb / jnp.linalg.norm(qb, axis=-1, keepdims=True)
jax.block_until_ready(qb)
q0 = qb[0]


def loop_fixed(fn, iters):
    carry = jnp.float32(0)
    for _ in range(iters):
        v, _ = fn(q0 + carry * 0)
        carry = carry + jnp.sum(v)
    return float(carry)


def loop_rot(fn, iters):
    carry = jnp.float32(0)
    for i in range(iters):
        v, _ = fn(qb[i % NB] + carry * 0)
        carry = carry + jnp.sum(v)
    return float(carry)


VARIANTS = {}
if MODE in ("x2", "both"):
    VARIANTS.update({
        "kern_fixed": (loop_fixed, lambda q: topk_pallas(
            q, corpus_x2, K, block_n=BLOCK_N, unroll_merge=2)),
        "kern_rot": (loop_rot, lambda q: topk_pallas(
            q, corpus_x2, K, block_n=BLOCK_N, unroll_merge=2)),
        "auto_rot": (loop_rot, lambda q: cosine_topk(
            q, corpus_x2, K, block_n=BLOCK_N)),
        "xla_rot": (loop_rot, lambda q: topk_xla_compensated(
            q, corpus_x2, K)),
    })
if MODE in ("f32", "both"):
    VARIANTS.update({
        "f32_xla_rot": (loop_rot, lambda q: topk_xla(q, corpus_f32, K)),
        "f32_kern_rot": (loop_rot, lambda q: topk_pallas(
            q, corpus_f32, K, block_n=BLOCK_N)),
    })

print(f"N={N} B={B} rounds={ROUNDS}")
for name, (loop, fn) in VARIANTS.items():
    loop(fn, 1)  # compile
best = {name: float("inf") for name in VARIANTS}
ITERS = 6
for r in range(ROUNDS):
    t_round = time.perf_counter()
    for name, (loop, fn) in VARIANTS.items():
        t0 = time.perf_counter()
        loop(fn, 1)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        loop(fn, ITERS)
        tn = time.perf_counter() - t0
        dt = max(tn - max(t1 - tn / ITERS, 0.0), tn / ITERS) / ITERS
        best[name] = min(best[name], dt)
    print(
        f"[round {r + 1}/{ROUNDS} wall={time.perf_counter() - t_round:.1f}s] "
        + " ".join(f"{n}={v * 1e3:.2f}ms" for n, v in best.items()),
        flush=True,
    )
for name, dt in best.items():
    gbs = N * D * 4 / dt / 1e9
    flag = "  IMPOSSIBLE(>roofline)" if gbs > 850 else ""
    print(f"{name:12s} {dt * 1e3:8.2f} ms/sweep  {B / dt:9.0f} q/s  "
          f"{gbs:5.0f} GB/s{flag}")
