"""Dissect the w4a16 kernel's decode-shape cost on the real chip.

Variants per shape (all interleaved round-robin, min over rounds,
two-point iteration counts so dispatch/RTT cancels — the protocol from
tools/bench_topk_kernel.py):

  v1   — the 2-D-grid w4a16 kernel (ops/int4_linear.py _w4a16_kernel)
  v2   — single-k-step w4a16 kernel (whole K resident; bias fold,
         static scale columns)
  v3   — w4a8_matmul: 2-op nibble->int8 decode, int8 MXU dots,
         post-dot group scales (the production int4 path)
  int8 — w8a8_matmul on the same [K, N]: the 557 GB/s-class bar,
         at 2x the weight bytes
  dma  — a pallas kernel that streams the same packed blocks but only
         touches one column: the pure HBM-stream floor for 4-bit

Shapes are the bandwidth-dominant decode matmuls of the 7B/13B capacity
rungs (tools/bench_7b.py). Usage:

  python tools/bench_int4_kernel.py [shape ...]   # default: all
  BENCH_M=1 BENCH_ROUNDS=5 python tools/bench_int4_kernel.py 7b_wgu
"""

import functools
import os
import sys
import time
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from outline_rag_tpu.models.decoder import quantize_decoder_params_int4
from outline_rag_tpu.ops.int4_linear import (
    _pick_block,
    w4a8_matmul,
    w4a16_matmul,
)
from outline_rag_tpu.ops.int8_linear import (
    quantize_linear_weight,
    w8a8_matmul,
)

M = int(os.environ.get("BENCH_M", 1))
ROUNDS = int(os.environ.get("BENCH_ROUNDS", 5))
IT_LO = int(os.environ.get("BENCH_IT_LO", 30))
IT_HI = int(os.environ.get("BENCH_IT_HI", 90))

SHAPES = {  # name -> (K, N)
    "7b_wqkv": (4096, 6144),
    "7b_wo": (4096, 4096),
    "7b_wgu": (4096, 22016),
    "7b_wd": (11008, 4096),
    "13b_wgu": (5120, 27648),
    "13b_wd": (13824, 5120),
}


def _quant4(w, gsz=128):
    qp = quantize_decoder_params_int4(
        {"layers": {"wq": w}, "embed": w[:1], "final_norm": w[0]},
        group_size=gsz,
    )
    return qp["layers"]["wq"]["q4"], qp["layers"]["wq"]["s4"]


def _dma_kernel(x_ref, q_ref, o_ref):
    # the block DMA is driven by the BlockSpec pipeline regardless of
    # what the body reads; one column + the x dependency keeps the loop
    # body live without VPU work (vector ops only: Mosaic rejects
    # sub-32-bit scalar extracts)
    o_ref[...] = (
        q_ref[:, :1].astype(jnp.int32).astype(jnp.float32)
        * x_ref[0:1, 0:1].astype(jnp.float32)
    )


def dma_floor(x, q4):
    n, kp = q4.shape
    bn = _pick_block(n)
    return pl.pallas_call(
        _dma_kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((16, 128), lambda nb: (0, 0)),
            pl.BlockSpec((bn, kp), lambda nb: (nb, 0)),
        ],
        out_specs=pl.BlockSpec((bn, 1), lambda nb: (nb, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(jnp.zeros((16, 128), x.dtype) + x[0, 0], q4)


def make_chained(fn, x0):
    # iters is TRACED so every iteration count shares one executable
    @jax.jit
    def chained(iters):
        def body(_, x):
            out = fn(x)
            return x0 + (jnp.sum(out) * jnp.asarray(1e-30, jnp.float32)).astype(
                x0.dtype
            )

        return jax.lax.fori_loop(0, iters, body, x0)

    return chained


def main():
    names = sys.argv[1:] or list(SHAPES)
    runners = {}  # (shape, variant) -> chained fn
    meta = {}
    key = jax.random.key(0)
    for name in names:
        k, n = SHAPES[name]
        # stable per-shape fold (Python's str hash is PYTHONHASHSEED-
        # randomized per process -> non-reproducible weights)
        kw, kx = jax.random.split(
            jax.random.fold_in(key, zlib.crc32(name.encode()) % 2**31)
        )
        w = 0.02 * jax.random.normal(kw, (k, n), jnp.float32)
        q4, s4 = _quant4(w)
        q8, s8 = quantize_linear_weight(w)
        x0 = jax.random.normal(kx, (M, k), jnp.bfloat16)
        jax.block_until_ready((q4, s4, q8, s8, x0))
        del w
        runners[name, "v1"] = make_chained(
            lambda x, q4=q4, s4=s4: w4a16_matmul(x, q4, s4, variant="v1"), x0
        )
        runners[name, "v2"] = make_chained(
            lambda x, q4=q4, s4=s4: w4a16_matmul(x, q4, s4, variant="v2"), x0
        )
        runners[name, "v3"] = make_chained(
            lambda x, q4=q4, s4=s4: w4a8_matmul(x, q4, s4), x0
        )
        runners[name, "int8"] = make_chained(
            lambda x, q8=q8, s8=s8: w8a8_matmul(x, q8, s8), x0
        )
        runners[name, "dma"] = make_chained(
            lambda x, q4=q4: dma_floor(x, q4), x0
        )
        meta[name] = (k, n)

    variants = ["dma", "v1", "v2", "v3", "int8"]
    # warm every executable (remote compiles are the slow part)
    for kk, fn in runners.items():
        t0 = time.time()
        jax.block_until_ready(fn(2))
        print(f"compiled {kk[0]}/{kk[1]} in {time.time() - t0:.1f}s", flush=True)

    best = {kk: float("inf") for kk in runners}
    for r in range(ROUNDS):
        for name in names:
            for v in variants:
                fn = runners[name, v]
                ts = {}
                for it in (IT_LO, IT_HI):
                    t0 = time.time()
                    jax.block_until_ready(fn(it))
                    ts[it] = time.time() - t0
                dt = (ts[IT_HI] - ts[IT_LO]) / (IT_HI - IT_LO)
                if dt > 0:
                    best[name, v] = min(best[name, v], dt)
        print(f"round {r + 1}/{ROUNDS} done", flush=True)

    print(f"\nM={M}, two-point {IT_LO}/{IT_HI}, min over {ROUNDS} rounds")
    for name in names:
        k, n = meta[name]
        packed = n * k / 2
        line = [f"{name:9s} K={k:5d} N={n:5d}"]
        for v in variants:
            dt = best[name, v]
            bw = packed / dt / 1e9 if v != "int8" else 2 * packed / dt / 1e9
            line.append(f"{v}={dt * 1e6:7.1f}us ({bw:5.1f} GB/s)")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
