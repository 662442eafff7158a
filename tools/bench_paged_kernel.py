"""Paged-attention walk dissection: head vs page vs dma variants + XLA gather.

The decode slot-scaling curve's knee named per-step latency as the
binding resource (docs/BENCHMARKS.md "Decode slot scaling"); the paged
page-walk kernel's grid overhead is the prime suspect — at 16 slots the
"head" walk runs B x KvH x MAXP = 512 grid steps per layer per decode
step, each computing a sub-MXU-granularity [GT,Dh]x[Dh,S] tile. This
tool times ONE attention call (the unit the decoder's layer scan
repeats) at serving shapes across the three walk variants and the XLA
gather fallback.

Protocol: variants interleave round-robin within each round and the min
over rounds is reported (tools/bench_topk_kernel.py pattern — the
tunnel's throughput swings 2-4x on a seconds timescale, so relative
comparisons within one run beat absolute values). Inputs vary per
iteration (anti-caching).

Usage: python tools/bench_paged_kernel.py [rounds]
Env: BENCH_B (16), BENCH_CTX (576: 512-prompt + mid-generation),
     BENCH_T (1), BENCH_KVH (4), BENCH_HEADS (32), BENCH_DH (64),
     BENCH_PAGE (128), BENCH_CACHE (1024), BENCH_INT8_KV (0),
     BENCH_VARIANTS ("head,page,dma,xla"), BENCH_CPU (interpret off-TPU).
"""

from __future__ import annotations

import functools
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

    from outline_rag_tpu.ops.paged_attention import (
        paged_attention,
        paged_attention_xla,
    )

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    b = int(os.environ.get("BENCH_B", 16))
    ctx = int(os.environ.get("BENCH_CTX", 576))
    t = int(os.environ.get("BENCH_T", 1))
    kvh = int(os.environ.get("BENCH_KVH", 4))
    heads = int(os.environ.get("BENCH_HEADS", 32))
    dh = int(os.environ.get("BENCH_DH", 64))
    page = int(os.environ.get("BENCH_PAGE", 128))
    max_cache = int(os.environ.get("BENCH_CACHE", 1024))
    int8_kv = bool(os.environ.get("BENCH_INT8_KV"))
    names = os.environ.get("BENCH_VARIANTS", "head,page,dma,xla").split(",")
    maxp = max_cache // page
    pages = b * maxp + 1
    reps = int(os.environ.get("BENCH_REPS", 50))

    rng = np.random.default_rng(0)
    q0 = jnp.asarray(
        rng.standard_normal((b, t, heads, dh)), jnp.bfloat16
    )
    if int8_kv:
        pk = jnp.asarray(
            rng.integers(-127, 128, (pages, kvh, dh, page)), jnp.int8
        )
        pv = jnp.asarray(
            rng.integers(-127, 128, (pages, kvh, dh, page)), jnp.int8
        )
        ks = jnp.asarray(
            rng.uniform(0.01, 0.1, (pages, kvh, page)), jnp.float32
        )
        vs = jnp.asarray(
            rng.uniform(0.01, 0.1, (pages, kvh, page)), jnp.float32
        )
    else:
        pk = jnp.asarray(
            rng.standard_normal((pages, kvh, dh, page)), jnp.bfloat16
        )
        pv = jnp.asarray(
            rng.standard_normal((pages, kvh, dh, page)), jnp.bfloat16
        )
        ks = vs = None
    # every row: a distinct scattered page set, positions mid-generation
    table = jnp.asarray(
        np.stack([
            rng.permutation(np.arange(1, pages))[:maxp] for _ in range(b)
        ]).astype(np.int32)
    )
    pos = jnp.asarray(
        np.full((b,), ctx, np.int32)
        + rng.integers(0, page // 2, (b,)).astype(np.int32)
    )

    interp = jax.default_backend() != "tpu"

    def make(name):
        if name == "xla":
            fn = paged_attention_xla
        else:
            fn = functools.partial(
                paged_attention, interpret=interp, variant=name
            )

        # chain reps calls through a q perturbation so one dispatch times
        # reps sequential kernel executions (amortizes the tunnel RTT)
        # while each call sees fresh inputs (anti-caching)
        @jax.jit
        def run(q, seed):
            def body(carry, i):
                # seed + i: every round AND every chained call sees fresh
                # inputs (the tunnel can short-circuit repeated identical
                # executions — CLAUDE.md measurement caveat)
                qq = carry + (seed + i).astype(carry.dtype) * 1e-6
                o = fn(qq, pk, pv, table, pos, ks, vs)
                return carry + o[:, :, :, :1] * 1e-6, ()

            out, _ = jax.lax.scan(
                body, q, jnp.arange(reps, dtype=jnp.int32)
            )
            return out

        return run

    fns = {n: make(n) for n in names}
    # compile + warm outside timing
    for n, f in fns.items():
        f(q0, jnp.int32(0)).block_until_ready()

    # tunnel-health marker
    x = jnp.ones((256, 256))
    float(jnp.sum(x @ x))
    t0 = time.perf_counter()
    float(jnp.sum(x @ x))
    rtt = time.perf_counter() - t0
    print(f"# tunnel rtt {rtt:.3f}s", file=sys.stderr)

    best: dict[str, float] = {n: float("inf") for n in names}
    for r in range(rounds):
        for n in names:
            t0 = time.perf_counter()
            fns[n](q0, jnp.int32(r + 1)).block_until_ready()
            dt = (time.perf_counter() - t0) / reps
            best[n] = min(best[n], dt)
            print(
                f"# round {r} {n}: {dt * 1e6:.1f} us/call",
                file=sys.stderr,
            )

    kv_bytes = 2 * b * (ctx + page // 4) * kvh * dh * (1 if int8_kv else 2)
    out = {
        "metric": (
            f"paged-attention walk, B={b} ctx~{ctx} T={t} "
            f"KvH={kvh} page={page} maxp={maxp} "
            f"{'int8' if int8_kv else 'bf16'} pool"
        ),
        "us_per_call": {n: round(best[n] * 1e6, 1) for n in names},
        "kv_gbs": {
            n: round(kv_bytes / best[n] / 1e9, 1) for n in names
        },
        "tunnel_rtt_s": round(rtt, 3),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
