"""Dissect the fused top-K kernel's per-step cost on the real chip.

Variants:
  full    — the production kernel (ops/topk.py)
  nomerge — matmul + tile max only (floor: DMA + MXU + minimal VPU)
  matmul  — matmul only, accumulate max into scratch (no per-step max over
            the tile output — pure MXU/DMA floor)

Usage: python tools/bench_topk_kernel.py [N] [B] [DTYPE]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from outline_rag_tpu.ops.topk import topk_pallas, topk_xla

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
DT = {"f32": jnp.float32, "bf16": jnp.bfloat16}[
    sys.argv[3] if len(sys.argv) > 3 else "f32"
]
D = 1024
BLOCK_N = int(os.environ.get("BLOCK_N", 1024))
N = (N // BLOCK_N) * BLOCK_N

key = jax.random.key(0)
corpus = jax.random.normal(key, (N, D), jnp.float32)
corpus = (corpus / jnp.linalg.norm(corpus, axis=1, keepdims=True)).astype(DT)
queries = jax.random.normal(jax.random.key(1), (B, D), jnp.float32)
queries = (queries / jnp.linalg.norm(queries, axis=1, keepdims=True)).astype(DT)
jax.block_until_ready((corpus, queries))


def _mk_kernel(mode):
    def kernel(q_ref, c_ref, out_ref, acc):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            acc[:] = jnp.full_like(acc, -1e30)

        precision = (
            jax.lax.Precision.HIGHEST
            if q_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        s = jax.lax.dot_general(
            c_ref[:], q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        if mode == "nomerge":
            acc[:] = jnp.maximum(acc[:], jnp.max(s, axis=0, keepdims=True))
        else:  # matmul: cheapest possible consumption of s
            acc[:] = jnp.maximum(acc[:], s[:1, :])

        @pl.when(j == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc[:]

    return kernel


def _mk_kernel_x2_nomerge():
    """qmajor 3-pass compensated dot + tile-max only (no K-select): the
    f32x2 floor. full(f32x2) - this = the merge cost the unroll_merge
    variants try to shrink at small N."""
    from outline_rag_tpu.ops.topk import _dot_compensated

    def kernel(q_ref, c_ref, out_ref, acc):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            acc[:] = jnp.full_like(acc, -1e30)

        s = _dot_compensated(q_ref[:], c_ref[:])  # [B, TN]
        acc[:] = jnp.maximum(acc[:], jnp.max(s, axis=1, keepdims=True))

        @pl.when(j == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc[:]

    return kernel


@jax.jit
def run_x2_nomerge(q2, c2):
    return pl.pallas_call(
        _mk_kernel_x2_nomerge(),
        grid=(N // BLOCK_N,),
        in_specs=[
            pl.BlockSpec((B, 2 * D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (BLOCK_N, 2 * D), lambda j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, 1), jnp.float32)],
    )(q2, c2)


@functools.partial(jax.jit, static_argnames=("mode",))
def run_variant(q, c, mode):
    return pl.pallas_call(
        _mk_kernel(mode),
        grid=(N // BLOCK_N,),
        in_specs=[
            pl.BlockSpec((B, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_N, D), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B), lambda j: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, B), jnp.float32)],
    )(q, c)


_salt_ctr = [0]


def make_chained(fn):
    def chained(iters, salt=0.0):
        # inputs vary per dispatch (globally-unique offset + data carry):
        # bit-identical repeats let a caching tunnel layer serve results
        # and poison the min-over-rounds (CLAUDE.md protocol). The offset
        # must clear one ulp of a typical unit-norm entry in DT or it
        # rounds away and repeats become bit-identical again: bf16 ulp at
        # |x|~0.03 is ~1.2e-4, so 1e-3 steps survive every dtype.
        carry = jnp.float32(salt)
        for i in range(iters):
            _salt_ctr[0] += 1
            q = queries + (
                carry * 1e-9 + (_salt_ctr[0] % 97 + 1) * 1e-3
            ).astype(DT)
            out = fn(q, corpus)
            first = out[0] if isinstance(out, tuple) else out
            carry = carry + jnp.sum(first.astype(jnp.float32)[:1])
        return float(carry)

    return chained


@jax.jit
def _xla_single_stage(q, c):
    """Control: plain dot + full-width lax.top_k (pre-topk_wide path),
    for measuring the two-stage top-k gain in isolation."""
    precision = (
        jax.lax.Precision.HIGHEST
        if c.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    scores = jnp.dot(
        q.astype(c.dtype), c.T,
        preferred_element_type=jnp.float32, precision=precision,
    )
    v, i = jax.lax.top_k(scores, 12)
    return v, i.astype(jnp.int32)


VARIANTS = {
    "full": lambda q, c: topk_pallas(q, c, 12, block_n=BLOCK_N, interpret=False),
    "xla": lambda q, c: topk_xla(q, c, 12),
    "xla1stage": lambda q, c: _xla_single_stage(q, c),
}
if DT == jnp.float32:
    from outline_rag_tpu.ops.topk import (
        split_f32_bf16x2,
        topk_xla_compensated,
    )

    corpus_x2 = jax.block_until_ready(split_f32_bf16x2(corpus))
    VARIANTS["f32x2"] = lambda q, c: topk_pallas(
        q.astype(jnp.float32), corpus_x2, 12, block_n=BLOCK_N, interpret=False
    )
    VARIANTS["f32x2_xla"] = lambda q, c: topk_xla_compensated(
        q.astype(jnp.float32), corpus_x2, 12
    )
    # unrolled-merge A/B (VERDICT r2 #3): straight-line extraction
    # passes replace while_loop iterations — the candidate fix for the
    # kernel's launch-overhead-bound small-N regime
    # u12 == k: fully static merge — the while_loop body never runs
    # (cond evaluates once, false), so a merge is pure vector code
    for u in (2, 4, 8, 12):
        VARIANTS[f"f32x2_u{u}"] = (
            lambda q, c, u=u: topk_pallas(
                q.astype(jnp.float32), corpus_x2, 12, block_n=BLOCK_N,
                interpret=False, unroll_merge=u,
            )
        )
    # split the PERTURBED q (not a cached split plus zero): `x + sum(q)*0`
    # is bit-identical every iteration — the exact caching artifact the
    # chained salt exists to defeat
    VARIANTS["f32x2_nomerge"] = lambda q, c: run_x2_nomerge(
        split_f32_bf16x2(q.astype(jnp.float32)), corpus_x2
    )
if B <= 128:  # the stripped diagnostics don't chunk B and OOM VMEM past it
    VARIANTS["matmul"] = lambda q, c: run_variant(q, c, "matmul")
    VARIANTS["nomerge"] = lambda q, c: run_variant(q, c, "nomerge")

print(f"N={N} B={B} D={D} dtype={np.dtype(DT).name} block_n={BLOCK_N}")
# the remote tunnel's throughput swings 2-4x on a seconds timescale, so:
# interleave variants round-robin and keep the MIN over rounds (min is
# robust against slow phases; all variants see the same phases)
chains = {name: make_chained(fn) for name, fn in VARIANTS.items()}
for ch in chains.values():
    ch(1)  # compile
best = {name: float("inf") for name in VARIANTS}
ROUNDS = int(os.environ.get("ROUNDS", 4))
ITERS = int(os.environ.get("ITERS", 6))
# dt below this implies >850 GB/s — physically impossible on v5e HBM;
# such a round measured a caching/overlap artifact, not the kernel, and
# must not become the variant's final min
MIN_PLAUSIBLE_DT = N * D * jnp.dtype(DT).itemsize / 850e9
dropped = {name: 0 for name in VARIANTS}
for r in range(ROUNDS):
    r_t0 = time.perf_counter()
    for name, ch in chains.items():
        t0 = time.perf_counter()
        ch(1, salt=r * 10.0)
        t_one = time.perf_counter() - t0
        t0 = time.perf_counter()
        ch(ITERS, salt=r * 10.0 + 5.0)
        t_many = time.perf_counter() - t0
        dt = max(t_many - max(t_one - t_many / ITERS, 0.0), t_many / ITERS) / ITERS
        if dt < MIN_PLAUSIBLE_DT:
            dropped[name] += 1
            continue
        best[name] = min(best[name], dt)
    # per-round trace: wall time reveals tunnel window quality (healthy
    # rounds finish in seconds; degraded ones in minutes — min ignores them)
    print(
        f"[round {r + 1}/{ROUNDS} wall={time.perf_counter() - r_t0:.1f}s] "
        + " ".join(f"{n}={v * 1e3:.2f}ms" for n, v in best.items()),
        flush=True,
    )
steps = N // BLOCK_N
for name, dt in best.items():
    gbs = N * D * jnp.dtype(DT).itemsize / dt / 1e9 if dt != float("inf") else 0
    note = f"  ({dropped[name]} impossible round(s) dropped)" if dropped[name] else ""
    if dt == float("inf"):
        print(f"{name:10s}  every round impossible — no plausible reading")
        continue
    print(
        f"{name:10s} {dt * 1e3:8.2f} ms  {gbs:6.0f} GB/s  "
        f"{dt / steps * 1e6:6.2f} us/step{note}"
    )
