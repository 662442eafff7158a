"""Paged-KV vs ring decode benchmark, plus prefix-cache admission latency.

Drives DecodeBatcher directly (no provider/tokenizer overhead) at the
TinyLlama-1.1B shape. Variants are interleaved round-robin and the best
round per variant is reported (tools/bench_topk_kernel.py protocol for
the remote tunnel's throughput swings). The second section measures
time-to-first-token for a long-prompt admission cold vs warm (same
prefix resubmitted — pages served from the prefix cache).

Usage: python tools/bench_paged.py [new_tokens] [rounds]
Env:   BENCH_* shape overrides as in tools/bench_decode.py;
       BENCH_SLOTS (default 4), BENCH_PREFIX (default 768).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def collect(q):
    from outline_rag_tpu.serve.decode_batcher import DONE

    out = []
    while True:
        item = q.get(timeout=600)
        if item is DONE:
            return out
        if isinstance(item, Exception):
            raise item
        out.extend(item)


def main() -> None:
    import jax

    from outline_rag_tpu.models.decoder import (
        DecoderConfig,
        cast_decoder_params,
        fuse_decoder_params,
        init_decoder_params,
        stack_decoder_params,
    )
    from outline_rag_tpu.serve.decode_batcher import DecodeBatcher

    new_tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    slots = int(os.environ.get("BENCH_SLOTS", 4))
    cfg = DecoderConfig(
        vocab_size=int(os.environ.get("BENCH_VOCAB", 32000)),
        hidden=int(os.environ.get("BENCH_HIDDEN", 2048)),
        layers=int(os.environ.get("BENCH_LAYERS", 22)),
        heads=int(os.environ.get("BENCH_HEADS", 32)),
        kv_heads=int(os.environ.get("BENCH_KV_HEADS", 4)),
        intermediate=int(os.environ.get("BENCH_INTER", 5632)),
        max_cache=int(os.environ.get("BENCH_CACHE", 1024)),
    )
    params = fuse_decoder_params(
        stack_decoder_params(
            cast_decoder_params(init_decoder_params(jax.random.key(0), cfg), cfg.dtype)
        )
    )
    page = 128
    maxp = cfg.max_cache // page
    # HBM-equal pool: as many pages as the ring holds slots x maxp
    pool = slots * maxp + 1

    batchers = {
        "ring": DecodeBatcher(params, cfg, slots=slots, chunk_tokens=16,
                              eos_id=-1),
        "paged": DecodeBatcher(params, cfg, slots=slots, chunk_tokens=16,
                               eos_id=-1, kv_pages=pool, page_size=page),
    }
    if os.environ.get("BENCH_KV_INT8"):
        batchers["paged-int8"] = DecodeBatcher(
            params, cfg, slots=slots, chunk_tokens=16, eos_id=-1,
            kv_pages=pool, page_size=page, kv_int8=True,
        )

    def one_round(b, tag):
        prompts = [
            [(7 * i + j + hash(tag) % 97) % 30000 + 2 for i in range(48)]
            for j in range(slots)
        ]
        t0 = time.perf_counter()
        qs = [b.submit(p, 0.7, 0.95, new_tokens, seed=j + 1)
              for j, p in enumerate(prompts)]
        n = sum(len(collect(q)) for q in qs)
        return n / (time.perf_counter() - t0)

    for name, b in batchers.items():
        rate = one_round(b, f"warm-{name}")
        print(f"# warm {name}: {rate:.1f} tok/s", file=sys.stderr)

    best: dict[str, float] = {}
    for r in range(rounds):
        for name, b in batchers.items():
            rate = one_round(b, f"r{r}-{name}")
            best[name] = max(best.get(name, 0.0), rate)
            print(f"# round {r} {name}: {rate:.1f} tok/s", file=sys.stderr)
    for name, rate in best.items():
        print(f"{name}: {rate:.1f} tok/s aggregate ({slots} slots)")
    for name, b in batchers.items():
        if name != "paged":
            b.close()

    # -- prefix-cache admission latency ---------------------------------
    b = batchers["paged"]
    npfx = int(os.environ.get("BENCH_PREFIX", 768))
    prefix = [(11 * i) % 30000 + 2 for i in range(npfx)]

    def ttft(tail_seed):
        p = prefix + [(13 * i + tail_seed) % 30000 + 2 for i in range(24)]
        t0 = time.perf_counter()
        q = b.submit(p, 0.0, 1.0, 8, seed=tail_seed)
        first = q.get(timeout=600)  # first token
        if isinstance(first, Exception):
            # a failed admission must fail the bench loudly, not be
            # timed as a bogus "first token"
            raise first
        dt = time.perf_counter() - t0
        collect(q)
        return dt

    ttft(1)  # compile the prefill-chunk program shape
    colds = []
    for s in (2, 3, 4):
        b.flush_prefix_cache()  # idle between requests: safe
        colds.append(ttft(s))
    cold = min(colds)
    warm = min(ttft(s) for s in (5, 6, 7))  # prefix cached by last cold run
    print(f"# prefix hits: {b.prefix_hits}/{b.prefix_lookups} lookups",
          file=sys.stderr)
    print(f"prefix {npfx}: cold TTFT {cold * 1e3:.0f} ms, "
          f"warm TTFT {warm * 1e3:.0f} ms")
    b.close()


if __name__ == "__main__":
    main()
