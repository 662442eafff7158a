"""Fused one-program query benchmark at bge-m3 model size.

Measures the end-to-end fused program (embed -> score+top-K -> gather ->
[lexical] -> [ColBERT] -> cross-encode -> rerank) on the real chip, with
the retrieval-mode knobs toggled — quantifying what LEX_WEIGHT /
COLBERT_WEIGHT cost in QPS (the ColBERT stage re-encodes all B*K
candidates; docs/BENCHMARKS.md documents why).

Usage: python tools/bench_fused.py [n_rows] [batch]
Variants are interleaved round-robin, best-of-round (tunnel protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from outline_rag_tpu.engine.fused import fused_query
    from outline_rag_tpu.models.encoder import (
        EncoderConfig,
        cast_params,
        init_colbert_head,
        init_encoder_params,
        init_sparse_head,
        stack_layer_params,
    )
    from outline_rag_tpu.models.reranker import init_reranker_params

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 102_400
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    top_k, rerank_k, tq, tc = 12, 3, 64, 64

    cfg = EncoderConfig.bge_m3()
    enc = init_encoder_params(jax.random.key(0), cfg)
    enc["sparse"] = init_sparse_head(jax.random.key(2), cfg)
    enc["colbert"] = init_colbert_head(jax.random.key(3), cfg)
    enc = stack_layer_params(cast_params(enc, jnp.bfloat16))
    rr = stack_layer_params(
        cast_params(init_reranker_params(jax.random.key(1), cfg), jnp.bfloat16)
    )

    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((n, cfg.hidden), dtype=np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    corpus = jnp.asarray(corpus)
    penalty = jnp.zeros((n,), jnp.float32)
    scales = jnp.ones((n,), jnp.float32)
    tok_ids = jnp.asarray(
        rng.integers(3, cfg.vocab_size, size=(n, tc)).astype(np.int32)
    )
    tok_mask = jnp.ones((n, tc), jnp.int32)
    tok_w = jnp.ones((n, tc), jnp.float32)
    q_ids0 = rng.integers(3, cfg.vocab_size, size=(b, tq)).astype(np.int32)
    q_mask = jnp.ones((b, tq), jnp.int32)

    # cached-ColBERT variant state: projected int8 token vectors
    # (content is irrelevant for timing; shapes/dtypes are what count)
    from outline_rag_tpu.models.encoder import colbert_projection

    cb_rank = int(os.environ.get("BENCH_CB_RANK", 128))
    cb_proj = colbert_projection(cfg.hidden, cb_rank)
    cb_codes = jnp.asarray(
        rng.integers(-127, 128, size=(n, tc, cb_rank)).astype(np.int8)
    )
    cb_scales = jnp.full((n, tc), 1 / 127.0, jnp.float32)

    VARIANTS = {
        "dense": dict(lex_weight=0.0, colbert_weight=0.0),
        "dense+lex": dict(lex_weight=0.3, colbert_weight=0.0),
        "dense+lex+colbert": dict(lex_weight=0.3, colbert_weight=0.3),
        "dense+lex+colbert-cached": dict(
            lex_weight=0.3, colbert_weight=0.3, cached=True
        ),
    }

    def run(weights, q_ids):
        w = dict(weights)
        cached = w.pop("cached", False)
        extra = (cb_codes, cb_scales, cb_proj) if cached else (None, None, None)
        return fused_query(
            enc, rr, q_ids, q_mask, corpus, scales, penalty,
            tok_ids, tok_mask, tok_w, *extra,
            enc_cfg=cfg, rr_cfg=cfg, top_k=top_k, rerank_k=rerank_k,
            **w,
        )

    def chained(weights, iters):
        carry = jnp.int32(0)
        for _ in range(iters):
            q = jnp.asarray(q_ids0) + carry * 0
            out = run(weights, q)
            carry = (out[1][0, 0] > 1e9).astype(jnp.int32)
        return int(carry)

    for name, w in VARIANTS.items():
        t0 = time.perf_counter()
        chained(w, 1)  # compile
        print(f"# compiled {name} in {time.perf_counter() - t0:.0f}s", file=sys.stderr)

    best: dict[str, float] = {}
    ROUNDS, ITERS = 3, 4
    for _ in range(ROUNDS):
        for name, w in VARIANTS.items():
            t0 = time.perf_counter()
            chained(w, 1)
            t_one = time.perf_counter() - t0
            t0 = time.perf_counter()
            chained(w, ITERS)
            t_many = time.perf_counter() - t0
            dt = max(
                t_many - max(t_one - t_many / ITERS, 0.0), t_many / ITERS
            ) / ITERS
            best[name] = min(best.get(name, float("inf")), dt)

    out = {
        "metric": f"fused query QPS by retrieval mode ({n} rows, B={b}, bge-m3 size)",
    }
    for name, dt in best.items():
        out[name] = round(b / dt, 1)
    out["colbert_qps_cost"] = round(
        1 - (b / best["dense+lex+colbert"]) / (b / best["dense+lex"]), 3
    )
    out["colbert_cached_qps_cost"] = round(
        1 - (b / best["dense+lex+colbert-cached"]) / (b / best["dense+lex"]), 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
