"""Decode throughput benchmark: bf16 vs int8 vs int4 decoder weights.

Measures end-to-end tok/s through LocalChatProvider (the only honest way
to time decode through this VM's lazy remote-compile tunnel — chained
small matmuls inside one jit are unmeasurable in isolation; see
docs/BENCHMARKS.md). Variants are interleaved round-robin and the best
round per variant is reported, following tools/bench_topk_kernel.py's
protocol for the tunnel's 2-4x throughput swings.

Usage: python tools/bench_decode.py [new_tokens] [rounds]
Env:   BENCH_LAYERS/BENCH_HIDDEN/... override the model shape
       (default: TinyLlama-1.1B shape — 22 layers, 2048 hidden,
       32 heads / 4 kv heads, 5632 intermediate, 32000 vocab).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


class StubTok:
    eos_token_id = 1_000_000  # never sampled -> full-length generations

    def encode(self, text):
        return [2 + (b % 30000) for b in text.encode()][:48]

    def decode(self, ids):
        return " ".join(str(i) for i in ids)


def build_provider(mode: str, cfg, params, chunk_tokens, max_new, slots=0):
    from outline_rag_tpu.serve.llm import LocalChatProvider

    return LocalChatProvider(
        params,
        cfg,
        StubTok(),
        eos_id=StubTok.eos_token_id,
        chunk_tokens=chunk_tokens,
        max_new_tokens=max_new,
        int8_weights=mode == "int8",
        int4_weights=mode == "int4",
        batch_slots=slots,
    )


def time_stream(prov, max_new, tag: str) -> tuple[float, int]:
    import asyncio

    async def run():
        text = []
        async for d in prov.stream(
            "bench",
            [{"role": "user", "content": f"benchmark {tag} {time.time()}"}],
            temperature=0.7,
            top_p=0.95,
        ):
            text.append(d["content"])
        return len("".join(text).split())

    t0 = time.perf_counter()
    n = asyncio.run(run())
    dt = time.perf_counter() - t0
    return dt, n


def main() -> None:
    import jax

    if os.environ.get("BENCH_CPU"):  # smoke-test the harness off-tunnel
        jax.config.update("jax_platforms", "cpu")

    from outline_rag_tpu.models.decoder import (
        DecoderConfig,
        init_decoder_params,
    )

    new_tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cfg = DecoderConfig(
        vocab_size=int(os.environ.get("BENCH_VOCAB", 32000)),
        hidden=int(os.environ.get("BENCH_HIDDEN", 2048)),
        layers=int(os.environ.get("BENCH_LAYERS", 22)),
        heads=int(os.environ.get("BENCH_HEADS", 32)),
        kv_heads=int(os.environ.get("BENCH_KV_HEADS", 4)),
        intermediate=int(os.environ.get("BENCH_INTER", 5632)),
        max_cache=int(os.environ.get("BENCH_CACHE", 1024)),
    )
    n_params = (
        cfg.vocab_size * cfg.hidden * 2
        + cfg.layers
        * (
            cfg.hidden * cfg.heads * cfg.hd
            + 2 * cfg.hidden * cfg.kv_heads * cfg.hd
            + cfg.heads * cfg.hd * cfg.hidden
            + 3 * cfg.hidden * cfg.intermediate
        )
    )
    print(
        f"# {cfg.layers}L x {cfg.hidden}H ({n_params / 1e9:.2f}B params), "
        f"{new_tokens} new tokens, {rounds} interleaved rounds",
        file=sys.stderr,
    )
    params = init_decoder_params(jax.random.key(0), cfg)

    modes = [
        m.strip()
        for m in os.environ.get("BENCH_MODES", "bf16,int8,int4").split(",")
        if m.strip()
    ]
    bad = [m for m in modes if m not in ("bf16", "int8", "int4")]
    if bad:
        raise SystemExit(f"BENCH_MODES: unknown mode(s) {bad}")
    provs = {
        m: build_provider(m, cfg, params, 16, new_tokens) for m in modes
    }

    # warm both (compile prefill + chunk programs)
    for name, p in provs.items():
        dt, n = time_stream(p, new_tokens, f"warm-{name}")
        print(f"# warm {name}: {n} toks in {dt:.1f}s", file=sys.stderr)

    best: dict[str, float] = {}
    for r in range(rounds):
        for name, p in provs.items():
            dt, n = time_stream(p, new_tokens, f"r{r}-{name}")
            rate = n / dt
            best[name] = max(best.get(name, 0.0), rate)
            print(f"# round {r} {name}: {rate:.1f} tok/s", file=sys.stderr)

    # aggregate throughput through the continuous batcher (the serving
    # configuration): S concurrent streams over S slots
    slots = int(os.environ.get("BENCH_SLOTS", 4))
    agg: dict[str, float] = {}
    if slots > 1:
        import asyncio

        provs.clear()  # free single-stream weights before the batched pass
        for name in modes:
            p = build_provider(name, cfg, params, 16, new_tokens, slots=slots)

            async def one(i):
                text = []
                async for d in p.stream(
                    "bench",
                    [{"role": "user", "content": f"agg {name} {i} {time.time()}"}],
                    temperature=0.7,
                    top_p=0.95,
                ):
                    text.append(d["content"])
                return len("".join(text).split())

            async def run_all():
                return await asyncio.gather(*[one(i) for i in range(slots)])

            asyncio.run(run_all())  # warm
            t0 = time.perf_counter()
            counts = asyncio.run(run_all())
            dt = time.perf_counter() - t0
            agg[name] = sum(counts) / dt
            p._batcher.close()
            print(f"# aggregate {name} x{slots}: {agg[name]:.1f} tok/s", file=sys.stderr)

    out = {"metric": f"decode tok/s ({n_params / 1e9:.2f}B)"}
    for name in modes:
        out[name] = round(best[name], 1)
    if "bf16" in best:
        for name in modes:
            if name != "bf16":
                out[f"{name}_speedup"] = round(best[name] / best["bf16"], 2)
    for name, v in agg.items():
        out[f"{name}_aggregate"] = round(v, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
