"""7B-class chat decode on ONE 16 GB v5e chip — the quantized-capacity rung.

A Llama-7B-shape model (32L x 4096H, GQA 32/8, 11008 intermediate,
32000 vocab; ~6.6B params) does not fit a 16 GB chip in bf16 (13.4 GB
weights alone, before KV/programs) and its f32 init tree (~27 GB) can't
even be materialized to quantize — so this uses the layer-streamed
``init_quantized_decoder_params`` (init one f32 layer -> quantize ->
drop) to build the int4 (~3.4 GB) or int8 (~6.7 GB) tree directly, then
measures single-stream and batched decode through LocalChatProvider.

This is the capacity story the int4 path exists for (at 1.1B it loses
on speed — docs/BENCHMARKS.md "Decode slot scaling"): the model that
otherwise needs a second chip serves from one.

Usage: python tools/bench_7b.py [new_tokens] [rounds]
Env: BENCH_MODES="int4,int8" (int8 may not leave room for big pools),
     BENCH_SLOTS (default 8), BENCH_PROMPT (default 512),
     DECODER_INT4_MODE=kernel|xla, BENCH_* shape overrides.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


class StubTok:
    eos_token_id = 1_000_000

    def encode(self, text):
        return [2 + (b % 30000) for b in text.encode()][:48]

    def decode(self, ids):
        return " ".join(str(i) for i in ids)


def main() -> None:
    import jax

    if os.environ.get("BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from outline_rag_tpu.models.decoder import (
        DecoderConfig,
        init_quantized_decoder_params,
    )
    from outline_rag_tpu.serve.llm import LocalChatProvider

    new_tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    slots = int(os.environ.get("BENCH_SLOTS", 8))
    prompt_len = int(os.environ.get("BENCH_PROMPT", 512))
    modes = [m for m in os.environ.get("BENCH_MODES", "int4").split(",") if m]
    cfg = DecoderConfig(
        vocab_size=int(os.environ.get("BENCH_VOCAB", 32000)),
        hidden=int(os.environ.get("BENCH_HIDDEN", 4096)),
        layers=int(os.environ.get("BENCH_LAYERS", 32)),
        heads=int(os.environ.get("BENCH_HEADS", 32)),
        kv_heads=int(os.environ.get("BENCH_KV_HEADS", 8)),
        intermediate=int(os.environ.get("BENCH_INTER", 11008)),
        max_cache=int(os.environ.get("BENCH_CACHE", 1024)),
    )

    x = jnp.ones((256, 256))
    float(jnp.sum(x @ x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(x @ x))
        ts.append(time.perf_counter() - t0)
    rtt = sorted(ts)[1]
    print(f"# tunnel rtt {rtt:.3f}s", file=sys.stderr)

    out: dict = {}
    for mode in modes:
        t0 = time.perf_counter()
        params = init_quantized_decoder_params(
            jax.random.key(0), cfg, mode=mode
        )
        jax.block_until_ready(params)
        gb = sum(
            x.size * x.dtype.itemsize
            for x in jax.tree_util.tree_leaves(params)
        ) / 1e9
        n_params = sum(
            (x.size * 2 if x.dtype == jnp.uint8 else x.size)
            for x in jax.tree_util.tree_leaves(params)
            if x.dtype in (jnp.uint8, jnp.int8)
        )
        print(
            f"# {mode}: built {n_params/1e9:.2f}B quantized params, "
            f"{gb:.2f} GB tree, {time.perf_counter()-t0:.0f}s",
            file=sys.stderr,
        )

        def stream_one(prov, tag):
            import asyncio

            async def run():
                n = 0
                async for d in prov.stream(
                    "bench",
                    [{"role": "user", "content": f"bench {tag} {time.time()}"}],
                    temperature=0.7,
                    top_p=0.95,
                ):
                    n += len(d["content"].split())
                return n

            t0 = time.perf_counter()
            n = asyncio.run(run())
            return n / (time.perf_counter() - t0)

        prov = LocalChatProvider(
            params, cfg, StubTok(), eos_id=StubTok.eos_token_id,
            chunk_tokens=16, max_new_tokens=new_tokens,
            int8_weights=mode == "int8", int4_weights=mode == "int4",
            prequantized=True,
        )
        stream_one(prov, "warm")
        single = max(stream_one(prov, f"r{r}") for r in range(rounds))
        print(f"# {mode} single-stream: {single:.1f} tok/s", file=sys.stderr)

        agg = 0.0
        if slots > 1:
            import asyncio

            page = 128
            pool = slots * (cfg.max_cache // page) + 1
            prov2 = LocalChatProvider(
                params, cfg, StubTok(), eos_id=StubTok.eos_token_id,
                chunk_tokens=16, max_new_tokens=new_tokens,
                int8_weights=mode == "int8", int4_weights=mode == "int4",
                prequantized=True, batch_slots=slots,
                kv_pages=pool, page_size=page, kv_int8=True,
            )

            async def one(i, r):
                n = 0
                async for d in prov2.stream(
                    "bench",
                    [{"role": "user", "content": f"agg {i} {r} {time.time()}"}],
                    temperature=0.7,
                    top_p=0.95,
                ):
                    n += len(d["content"].split())
                return n

            async def wave(r):
                return await asyncio.gather(*[one(i, r) for i in range(slots)])

            asyncio.run(wave("warm"))
            for r in range(rounds):
                t0 = time.perf_counter()
                counts = asyncio.run(wave(r))
                agg = max(agg, sum(counts) / (time.perf_counter() - t0))
            print(
                f"# {mode} aggregate x{slots}: {agg:.1f} tok/s",
                file=sys.stderr,
            )
            prov2._batcher.close()

        out[mode] = {
            "tree_gb": round(gb, 2),
            "single_tok_s": round(single, 1),
            f"agg_{slots}slot_tok_s": round(agg, 1),
        }
        del prov, params  # free before the next mode

    out_line = {
        "metric": (
            f"7B-class decode on one v5e chip "
            f"({cfg.layers}L x {cfg.hidden}H, GQA {cfg.heads}/{cfg.kv_heads},"
            f" prompt {prompt_len}, +{new_tokens} tokens)"
        ),
        **out,
        "tunnel_rtt_s": round(rtt, 3),
    }
    print(json.dumps(out_line))


if __name__ == "__main__":
    main()
