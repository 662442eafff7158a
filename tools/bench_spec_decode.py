"""Speculative-decode benchmark: verify-step cost and throughput range.

A random-init model almost never agrees with prompt-lookup drafts, so
end-to-end speedup on real text cannot be synthesized offline. What CAN
be measured honestly on the chip:

  plain    — generate_chunk (the non-speculative baseline), tok/s
  spec0    — generate_chunk_spec with acceptance ~= 0 (random model):
             the WORST case — every verify step emits exactly 1 token,
             so this prices the [1, 1+K] forward + draft lookup overhead
  ceiling  — force_accept=True: every step emits K+1 tokens — the
             all-accepted throughput ceiling

Real-workload tok/s = plain_rate x (avg accepted+1) x (spec0/plain);
the spec0/plain ratio is the overhead factor, ceiling/plain bounds the
win. Acceptance itself depends on how much the answer quotes the
context (high for RAG extraction answers; the output distribution is
unchanged either way — tests/test_decoder_spec.py).

Variants interleave round-robin with fresh prompts per round (the
remote-tunnel measurement protocol, docs/BENCHMARKS.md); best round per
variant is reported.

Usage: python tools/bench_spec_decode.py [new_tokens] [rounds] [draft_k]
Env:   BENCH_LAYERS/BENCH_HIDDEN/... override the model shape (default
       TinyLlama-1.1B shape); BENCH_INT8=1 for int8 weights.
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
    import jax.numpy as jnp
    import numpy as np

    from outline_rag_tpu.models.decoder import (
        DecoderConfig,
        decoder_forward,
        fuse_decoder_params,
        generate_chunk,
        generate_chunk_spec,
        init_cache,
        init_decoder_params,
        quantize_decoder_params,
        stack_decoder_params,
    )

    new_tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    draft_k = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    steps = 16
    cfg = DecoderConfig(
        vocab_size=int(os.environ.get("BENCH_VOCAB", 32000)),
        hidden=int(os.environ.get("BENCH_HIDDEN", 2048)),
        layers=int(os.environ.get("BENCH_LAYERS", 22)),
        heads=int(os.environ.get("BENCH_HEADS", 32)),
        kv_heads=int(os.environ.get("BENCH_KV_HEADS", 4)),
        intermediate=int(os.environ.get("BENCH_INTER", 5632)),
        max_cache=int(os.environ.get("BENCH_CACHE", 2048)),
    )
    params = fuse_decoder_params(
        stack_decoder_params(init_decoder_params(jax.random.key(0), cfg))
    )
    if os.environ.get("BENCH_INT8", "1") == "1":
        params = quantize_decoder_params(params)
        print("# int8 weights", file=sys.stderr)

    prefill = jax.jit(functools.partial(decoder_forward, cfg=cfg))
    plain = jax.jit(
        functools.partial(
            generate_chunk, cfg=cfg, n_steps=steps,
            temperature=0.7, top_p=0.95, eos_id=-1,
        )
    )
    spec = {
        forced: jax.jit(
            functools.partial(
                generate_chunk_spec, cfg=cfg, n_steps=steps,
                draft_k=draft_k, gram=3, temperature=0.7, top_p=0.95,
                eos_id=-1, force_accept=forced,
            )
        )
        for forced in (False, True)
    }

    t_prompt = 64
    rng = np.random.default_rng(0)

    def run_variant(name: str, seed: int) -> float:
        """One fresh generation of ~new_tokens tokens; returns tok/s."""
        prompt = rng.integers(3, cfg.vocab_size, size=(1, t_prompt)).astype(
            np.int32
        )
        cache = init_cache(cfg, 1)
        logits, cache = prefill(
            params, jnp.asarray(prompt), cache, jnp.zeros((1,), jnp.int32)
        )
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        pos = jnp.full((1,), t_prompt, jnp.int32)
        key = jax.random.key(seed)
        buf = np.zeros((1, cfg.max_cache), np.int32)
        buf[0, :t_prompt] = prompt[0]
        buf = jnp.asarray(buf)
        made = 0
        t0 = time.perf_counter()
        while made < new_tokens:
            if name == "plain":
                toks, cache, tok, pos = plain(params, cache, tok, pos, key)
                # fetch the chunk like the serving provider does (it must
                # stream the text): every variant pays one host sync per
                # chunk, so the comparison prices speculation itself, not
                # sync asymmetry
                np.asarray(toks)
                made += steps
            else:
                emitted, cnt, cache, buf, tok, pos = spec[name == "ceiling"](
                    params, cache, buf, tok, pos, key
                )
                np.asarray(emitted)
                n = int(cnt[0])
                if n == 0:
                    break
                made += n
        jax.block_until_ready(tok)
        return made / (time.perf_counter() - t0)

    for name in ("plain", "spec0", "ceiling"):
        r = run_variant(name, 999)
        print(f"# warm {name}: {r:.1f} tok/s", file=sys.stderr)

    best: dict[str, float] = {}
    for r in range(rounds):
        for name in ("plain", "spec0", "ceiling"):
            rate = run_variant(name, 1000 + r)
            best[name] = max(best.get(name, 0.0), rate)
            print(f"# round {r} {name}: {rate:.1f} tok/s", file=sys.stderr)

    overhead = best["spec0"] / best["plain"]
    print(
        json.dumps(
            {
                "metric": f"speculative decode (K={draft_k})",
                "plain_tok_s": round(best["plain"], 1),
                "spec_worst_tok_s": round(best["spec0"], 1),
                "spec_ceiling_tok_s": round(best["ceiling"], 1),
                "overhead_factor": round(overhead, 3),
                "max_speedup": round(best["ceiling"] / best["plain"], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
