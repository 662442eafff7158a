"""Batched decode-step dissection: ring vs paged walks, and the KV scatter.

The slot-scaling curve flattened at ~30 ms per batched decode step
(16 slots), far off the ~2 ms weight-read roofline; this tool breaks
that step down on-chip:

- ``ring``      — decoder_forward over the [L,B,KvH,C,Dh] ring cache
- ``paged:X``   — decoder_forward over the paged pool with page-walk
                  variant X (head | page | dma — ops/paged_attention.py)
- ``scatter``   — ONLY the per-layer pool KV write
  (``pool.at[pages,:,:,offs].set``), L x per step, isolated: XLA
  lowers advanced-index scatter poorly on TPU and it runs once per
  layer per step on the serving path

Each timed unit is a jitted ``lax.scan`` of ``chunk`` decode steps (the
batcher's exact step shape, serve/decode_batcher.py::step_chunk);
variants interleave round-robin, min over rounds, chained inputs
(bench_topk_kernel protocol).

Usage: python tools/bench_decode_step.py [rounds]
Env: BENCH_B (16), BENCH_CHUNK (16), BENCH_PROMPT (512: start position),
     BENCH_INT8 (w8a8 weights), BENCH_KV_INT8 (int8 pool),
     BENCH_LAYERS/... (model shape, default 1.1B), BENCH_PAGE (128),
     BENCH_VARIANTS ("ring,paged:head,paged:page,paged:dma,scatter"),
     BENCH_CPU (smoke off-tunnel).
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

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from outline_rag_tpu.models import decoder as D

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    b = int(os.environ.get("BENCH_B", 16))
    chunk = int(os.environ.get("BENCH_CHUNK", 16))
    prompt = int(os.environ.get("BENCH_PROMPT", 512))
    page = int(os.environ.get("BENCH_PAGE", 128))
    kv_int8 = bool(os.environ.get("BENCH_KV_INT8"))
    w_int8 = bool(os.environ.get("BENCH_INT8"))
    names = os.environ.get(
        "BENCH_VARIANTS", "ring,paged:head,paged:page,paged:dma,scatter"
    ).split(",")
    cfg = D.DecoderConfig(
        vocab_size=int(os.environ.get("BENCH_VOCAB", 32000)),
        hidden=int(os.environ.get("BENCH_HIDDEN", 2048)),
        layers=int(os.environ.get("BENCH_LAYERS", 22)),
        heads=int(os.environ.get("BENCH_HEADS", 32)),
        kv_heads=int(os.environ.get("BENCH_KV_HEADS", 4)),
        intermediate=int(os.environ.get("BENCH_INTER", 5632)),
        max_cache=int(os.environ.get("BENCH_CACHE", 1024)),
    )
    params = D.fuse_decoder_params(
        D.stack_decoder_params(
            D.cast_decoder_params(
                D.init_decoder_params(jax.random.key(0), cfg), cfg.dtype
            )
        )
    )
    if w_int8:
        params = D.quantize_decoder_params(params)
    maxp = cfg.max_cache // page
    pool_pages = b * maxp + 1
    rng = np.random.default_rng(0)

    def scan_steps(fn):
        """jit a scan of `chunk` decode steps threading (cache, tok, pos)."""

        def run(p, cache, tok, pos):
            def body(carry, _):
                cache, tok, pos = carry
                logits, cache = fn(p, tok[:, None], cache, pos)
                nxt = jnp.argmax(
                    logits[:, -1, :512].astype(jnp.float32), axis=-1
                ).astype(jnp.int32)
                return (cache, nxt, jnp.minimum(pos + 1, cfg.max_cache - 2)), ()

            (cache, tok, pos), _ = jax.lax.scan(
                body, (cache, tok, pos), None, length=chunk
            )
            return cache, tok, pos

        return jax.jit(run, donate_argnums=(1,))

    def fresh_state():
        tok = jnp.asarray(rng.integers(2, 30000, (b,)), jnp.int32)
        pos = jnp.asarray(
            prompt + rng.integers(0, page // 2, (b,)), jnp.int32
        )
        return tok, pos

    variants = {}
    for name in names:
        if name == "ring":
            fn = scan_steps(
                lambda p, t, c, s: D.decoder_forward(p, t, c, s, cfg)
            )
            variants[name] = (fn, lambda: D.init_cache(cfg, b))
        elif name.startswith("paged:"):
            walk = name.split(":", 1)[1]
            # "paged:<walk>+carry" runs the layer scan with the pools
            # as CARRY over a layer-flattened pool (ORT_PAGED_SCAN=
            # carry, models/decoder.py) instead of the xs/ys form
            scan_mode = "xs"
            if walk.endswith("+carry"):
                walk, scan_mode = walk[: -len("+carry")], "carry"

            def make_paged(walk, scan_mode):
                import outline_rag_tpu.ops.paged_attention as PA

                orig = PA.paged_attention

                def forced(*a, **kw):
                    kw.pop("variant", None)
                    return orig(*a, variant=walk, **kw)

                def fn_paged(p, t, c, s):
                    # env reads happen at TRACE time (this body runs
                    # under jit tracing), so setting it here scopes the
                    # scan mode to this variant's program
                    prev = os.environ.get("ORT_PAGED_SCAN")
                    PA.paged_attention = forced
                    os.environ["ORT_PAGED_SCAN"] = scan_mode
                    try:
                        return D.decoder_forward(p, t, c, s, cfg)
                    finally:
                        PA.paged_attention = orig
                        if prev is None:
                            os.environ.pop("ORT_PAGED_SCAN", None)
                        else:
                            os.environ["ORT_PAGED_SCAN"] = prev

                def init():
                    c = D.init_paged_cache(
                        cfg, b, pool_pages, page,
                        kv_dtype="int8" if kv_int8 else None,
                    )
                    table = np.zeros((b, maxp), np.int32)
                    for r in range(b):
                        table[r] = rng.permutation(
                            np.arange(1, pool_pages)
                        )[:maxp]
                    return dataclasses.replace(
                        c, table=jnp.asarray(table)
                    )

                return scan_steps(fn_paged), init

            variants[name] = make_paged(walk, scan_mode)
        elif name in ("scatter", "kvwrite"):
            # the paged forward's per-layer KV write, isolated, L x per
            # step: "scatter" = the XLA advanced-index scatter of
            # [B,1,KvH,Dh] rows into the pool; "kvwrite" = the pallas
            # page-RMW write kernel that replaced it
            # (ops/paged_attention.py::paged_kv_write)
            kvh, dh = cfg.kv_heads, cfg.hd
            shape = (cfg.layers, pool_pages, kvh, dh, page)
            # per-row DISTINCT pages (like real serving): shared pages
            # would let consecutive grid steps reuse the fetched block
            # and flatter the kernel's timing
            tbl = (
                np.arange(b, dtype=np.int32)[:, None] * maxp
                + np.arange(1, maxp + 1, dtype=np.int32)[None]
            )
            tbl_j = jnp.asarray(tbl)
            use_kernel = name == "kvwrite"

            def make_write(use_kernel):
                def init_s():
                    dt = jnp.int8 if kv_int8 else cfg.dtype
                    return (jnp.zeros(shape, dt), jnp.zeros(shape, dt))

                def run(p, pools, tok, pos):
                    del p
                    dt = pools[0].dtype
                    new = tok[:, None, None, None].astype(dt) + jnp.zeros(
                        (b, 1, kvh, dh), dt
                    )

                    def body(carry, _):
                        pools, tok, pos = carry

                        # scan over L layers like the forward does
                        def lbody(carry, pool_lv):
                            tok = carry
                            pk, pv = pool_lv
                            val = new + tok[0].astype(dt)
                            if use_kernel:
                                from outline_rag_tpu.ops.paged_attention import (  # noqa: E501
                                    paged_kv_write,
                                )

                                pk, pv = paged_kv_write(
                                    pk, pv, tbl_j, pos, val, val
                                )
                            else:
                                pg = (pos // page)[:, None]
                                w_pages = jnp.take_along_axis(
                                    tbl_j, jnp.minimum(pg, maxp - 1), axis=1
                                )
                                w_offs = (pos % page)[:, None]
                                pk = pk.at[w_pages, :, :, w_offs].set(val)
                                pv = pv.at[w_pages, :, :, w_offs].set(val)
                            return tok, (pk, pv)

                        tok2, pools = jax.lax.scan(lbody, tok, pools)
                        return (pools, tok + 1, pos + 1), ()

                    (pools, tok, pos), _ = jax.lax.scan(
                        body, (pools, tok, pos), None, length=chunk
                    )
                    return pools, tok, pos

                return jax.jit(run, donate_argnums=(1,)), init_s

            variants[name] = make_write(use_kernel)
        else:
            raise SystemExit(f"unknown variant {name!r}")

    # compile + warm
    states = {}
    for name, (fn, init) in variants.items():
        tok, pos = fresh_state()
        cache = init()
        cache, tok, pos = fn(params, cache, tok, pos)
        int(jax.device_get(tok[0]))  # fetch: the lazy tunnel ignores block_until_ready
        states[name] = (cache, tok, pos)

    x = jnp.ones((256, 256))
    float(jnp.sum(x @ x))
    t0 = time.perf_counter()
    float(jnp.sum(x @ x))
    rtt = time.perf_counter() - t0
    print(f"# tunnel rtt {rtt:.3f}s", file=sys.stderr)

    best = {n: float("inf") for n in variants}
    for r in range(rounds):
        for name, (fn, init) in variants.items():
            cache, tok, pos = states[name]
            t0 = time.perf_counter()
            cache, tok, pos = fn(params, cache, tok, pos)
            int(jax.device_get(tok[0]))  # fetch forces execution
            dt = (time.perf_counter() - t0) / chunk
            states[name] = (cache, tok, pos)
            best[name] = min(best[name], dt)
            print(f"# round {r} {name}: {dt * 1e3:.2f} ms/step",
                  file=sys.stderr)

    print(json.dumps({
        "metric": (
            f"batched decode step, B={b} chunk={chunk} pos~{prompt} "
            f"{'int8' if w_int8 else 'bf16'} weights, "
            f"{'int8' if kv_int8 else 'bf16'} KV, "
            f"L{cfg.layers}/h{cfg.hidden}/v{cfg.vocab_size} shape"
        ),
        "ms_per_step": {n: round(best[n] * 1e3, 2) for n in best},
        "tunnel_rtt_s": round(rtt, 3),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
