"""Where do the KV-write's 10.6 ms/step go — kernel or scan structure?

The B=64 dissection (measurements/r4/dissect64c) timed the pallas
page-RMW write at 10.58 ms per decode step = ~480 us per layer call =
~7.5 us per grid step, ~10x the usual Mosaic per-step overhead. Two
hypotheses:

- the kernel itself is slow (RMW aliasing stalls the block pipeline);
- the serving structure is slow: the per-layer ``lax.scan`` carries the
  pools as xs AND re-emits them as ys, and XLA may materialize a copy
  of the layer's pool slab per iteration that the pallas call's
  input_output_aliasing cannot elide (a [1025,4,64,128] bf16 slab is
  67 MB; 2 tensors x 22 layers = 2.9 GB/step -> ~10 ms at copy speed,
  which matches the measurement suspiciously well).

Timed units (jitted, donated, varying pos per iteration — tunnel rules):

- ``inscan``   — the serving structure: scan over L, pools as xs/ys,
                 one paged_kv_write per iteration (= dissect64c unit,
                 1 token chunk).
- ``flat``     — same L sequential writes, NO scan: one [L*P, ...] pool,
                 L unrolled paged_kv_write calls at per-layer page
                 offsets; the jit donates the pool so XLA can chain
                 aliases without any carry structure.
- ``single``   — ONE write call (1/L of the work): per-call floor incl.
                 fixed dispatch.

If flat ~= inscan/L_overhead ~ single*L, the kernel is fine and the
scan carry is the cost — the fix is restructuring the paged forward to
commit KV once per step outside the layer scan. If flat ~= inscan, the
kernel's RMW itself is the cost — the fix is kernel-side.

Usage: python tools/bench_kvwrite_probe.py [rounds]
Env: BENCH_B (64), BENCH_LAYERS (22), BENCH_PAGE (128), BENCH_KV_INT8,
     BENCH_CPU (smoke).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    import jax

    if os.environ.get("BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from outline_rag_tpu.ops.paged_attention import paged_kv_write

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    b = int(os.environ.get("BENCH_B", 64))
    layers = int(os.environ.get("BENCH_LAYERS", 22))
    page = int(os.environ.get("BENCH_PAGE", 128))
    kv_int8 = bool(os.environ.get("BENCH_KV_INT8"))
    kvh, dh, cache = 4, 64, 2048
    maxp = cache // page
    pool_pages = b * maxp + 1
    dt = jnp.int8 if kv_int8 else jnp.bfloat16
    rng = np.random.default_rng(0)

    # per-row distinct pages (real serving shape; see bench_decode_step)
    tbl = (
        np.arange(b, dtype=np.int32)[:, None] * maxp
        + np.arange(1, maxp + 1, dtype=np.int32)[None]
    )
    tbl_j = jnp.asarray(tbl)

    def new_kv(pos):
        v = (pos[:, None, None, None] % 97).astype(dt)
        return v + jnp.zeros((b, 1, kvh, dh), dt)

    def fn_inscan(pools, pos):
        def lbody(pos, pool_lv):
            pk, pv = pool_lv
            val = new_kv(pos)
            pk, pv = paged_kv_write(pk, pv, tbl_j, pos, val, val)
            return pos, (pk, pv)

        _, pools = jax.lax.scan(lbody, pos, pools)
        return pools, pos + 1

    def init_inscan():
        shape = (layers, pool_pages, kvh, dh, page)
        return (jnp.zeros(shape, dt), jnp.zeros(shape, dt))

    def fn_flat(pools, pos):
        pk, pv = pools
        val = new_kv(pos)
        for li in range(layers):
            off = jnp.int32(li * pool_pages)
            pk, pv = paged_kv_write(pk, pv, tbl_j + off, pos, val, val)
        return (pk, pv), pos + 1

    def init_flat():
        shape = (layers * pool_pages, kvh, dh, page)
        return (jnp.zeros(shape, dt), jnp.zeros(shape, dt))

    def fn_single(pools, pos):
        pk, pv = pools
        val = new_kv(pos)
        pk, pv = paged_kv_write(pk, pv, tbl_j, pos, val, val)
        return (pk, pv), pos + 1

    def init_single():
        shape = (pool_pages, kvh, dh, page)
        return (jnp.zeros(shape, dt), jnp.zeros(shape, dt))

    variants = {
        "inscan": (fn_inscan, init_inscan),
        "flat": (fn_flat, init_flat),
        "single": (fn_single, init_single),
    }

    # tunnel-health marker (memory/tpu-tunnel-degradation)
    x = jnp.ones((256, 256))
    (x @ x).block_until_ready()
    t0 = time.perf_counter()
    float(jnp.sum(x @ x))
    rtt = time.perf_counter() - t0
    print(f"# tunnel rtt {rtt:.3f}s", file=sys.stderr)

    state, jitted = {}, {}
    pos0 = jnp.asarray(
        512 + rng.integers(0, page // 2, (b,)), jnp.int32
    )
    for name, (fn, init) in variants.items():
        jitted[name] = jax.jit(fn, donate_argnums=(0,))
        state[name] = (init(), pos0)
        # warm/compile
        state[name] = jitted[name](*state[name])
        jax.block_until_ready(state[name])

    reps = 20
    best = {n: float("inf") for n in variants}
    for r in range(rounds):
        for name in variants:
            st = state[name]
            jax.block_until_ready(st)
            t0 = time.perf_counter()
            for _ in range(reps):
                st = jitted[name](*st)
            jax.block_until_ready(st)
            dt_ms = (time.perf_counter() - t0) / reps * 1e3
            state[name] = st
            best[name] = min(best[name], dt_ms)
            print(f"# round {r} {name}: {dt_ms:.2f} ms/call", file=sys.stderr)

    out = {
        "metric": (
            f"paged_kv_write structure probe, B={b} T=1 L={layers} "
            f"page={page} {'int8' if kv_int8 else 'bf16'} pool"
        ),
        "ms": {n: round(v, 3) for n, v in best.items()},
        "flat_vs_inscan": round(best["inscan"] / best["flat"], 2),
        "single_x_L_ms": round(best["single"] * layers, 2),
        "tunnel_rtt_s": round(rtt, 3),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
