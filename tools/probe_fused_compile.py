"""Isolate which axis of the 1M int8r+hybrid FUSED program kills the
remote compiler.

northstar_1m_int8r (2026-08-21, attempts 2 and 3): every fused-query
compile at BENCH_N=1M BENCH_DTYPE=int8r BENCH_HYBRID=1 BENCH_CB_RANK=64
failed with `remote_compile: HTTP 500: tpu_compile_helper subprocess
exit code 1` — deterministically (174 failures per run), while the same
program compiles on CPU XLA (dryrun b4 rung) and the 1M int8r OPS-level
programs compile on the chip (eval_ladder2, bench 16k/10M hostres).
The serve fell back to the staged path at ~10 asks/s.

This probe rebuilds the failing program MINUS the bge-m3 trunk (a
2-layer hidden-1024 encoder keeps the index-side program identical) and
compiles one fused query per config axis, directly populating the index
planes on-device (no 500 s ingest per point):

    python tools/probe_fused_compile.py [n] [dtype:rank ...]
    # default: 1000000 int8r:64 int8r:32 int8:64 int8r:0

Prints one JSON line per config: compiled ok / HTTP 500 / other, and
the compile wall time.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from outline_rag_tpu.engine.embedder import EncoderEmbedder
    from outline_rag_tpu.engine.fused import FusedEngine
    from outline_rag_tpu.engine.rerank import CrossEncoderReranker
    from outline_rag_tpu.index import VectorIndex
    from outline_rag_tpu.models.encoder import (
        EncoderConfig,
        init_colbert_head,
        init_encoder_params,
    )
    from outline_rag_tpu.models.reranker import init_reranker_params
    from outline_rag_tpu.models.tokenizer import HashTokenizer

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    configs = sys.argv[2:] or ["int8r:64", "int8r:32", "int8:64", "int8r:0"]
    tok_w = 64
    d = 1024

    cfg = EncoderConfig(
        vocab_size=4096, hidden=d, layers=2, heads=8, intermediate=2048,
        max_positions=512,
    )
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    with jax.default_device(jax.devices("cpu")[0]):
        enc_params = init_encoder_params(jax.random.key(0), cfg)
        enc_params["colbert"] = init_colbert_head(jax.random.key(3), cfg)
        rr_params = init_reranker_params(jax.random.key(1), cfg)
        emb = EncoderEmbedder(
            enc_params, cfg, tok, max_tokens=tok_w, seq_buckets=(tok_w,),
            name="probe",
        )
        rr = CrossEncoderReranker(rr_params, cfg, tok, max_tokens=2 * tok_w)
    dev = jax.devices()[0]
    emb.params = jax.device_put(emb.params, dev)
    rr.params = jax.device_put(rr.params, dev)
    emit(stage="init", backend=jax.default_backend(), n=n)

    cap = 1024
    while cap < n:
        cap *= 2

    SEG = min(262_144, n)

    for spec in configs:
        dtype, rank_s = spec.split(":")
        rank = int(rank_s)
        t0 = time.time()
        try:
            index = VectorIndex(
                dim=d, capacity=cap, dtype=dtype, token_width=tok_w,
                colbert_rank=rank,
            )
            # populate the planes directly on-device (probe shortcut —
            # the ingest path is not under test here, the program is)
            sh = index._shard

            import functools

            @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
            def fill(state, tstate, cstate, k):
                ks = jax.random.split(k, 8)
                vec = jax.random.randint(
                    ks[0], (SEG, d), -127, 128, jnp.int32
                ).astype(jnp.int8)
                state = dataclasses.replace(
                    state,
                    vectors=jax.lax.dynamic_update_slice(
                        state.vectors, vec.astype(state.vectors.dtype),
                        (0, 0),
                    ),
                    scales=jnp.full_like(state.scales, 0.03),
                    penalty=jnp.where(
                        jnp.arange(cap) < n, 0.0, state.penalty
                    ).astype(jnp.float32),
                    residual=(
                        state.residual
                        if state.residual.shape[1] == 0
                        else jax.lax.dynamic_update_slice(
                            state.residual,
                            jax.random.randint(
                                ks[1], (SEG, d), -127, 128, jnp.int32
                            ).astype(jnp.int8),
                            (0, 0),
                        )
                    ),
                )
                tstate = dataclasses.replace(
                    tstate,
                    ids=jax.random.randint(
                        ks[2], tstate.ids.shape, 3, cfg.vocab_size, jnp.int32
                    ),
                    mask=jnp.ones_like(tstate.mask),
                    weights=jax.random.uniform(ks[3], tstate.weights.shape),
                )
                if cstate is not None:
                    cstate = dataclasses.replace(
                        cstate,
                        codes=jax.random.randint(
                            ks[4], cstate.codes.shape, -127, 128, jnp.int32
                        ).astype(jnp.int8),
                        scales=jax.random.uniform(
                            ks[5], cstate.scales.shape, jnp.float32,
                            0.001, 0.02,
                        ),
                    )
                return state, tstate, cstate

            sh.state, index.tokens.state, new_cb = fill(
                sh.state, index.tokens.state, index.tokens.colbert,
                jax.random.key(7),
            )
            if index.tokens.colbert is not None:
                index.tokens.colbert = new_cb
            sh.cursor = n
            sh.live = n
            sh.row_ids[:] = "x"  # the query path only needs SOME id per row

            eng = FusedEngine(
                emb, rr, index, top_k=12, rerank_k=12,
                lex_weight=0.4, colbert_weight=0.6 if rank else 0.0,
            )
            res = eng.query(["alpha bravo charlie"])
            emit(
                config=spec, ok=True, wall_s=round(time.time() - t0, 1),
                rows=len(res[0]),
            )
        except Exception as e:
            msg = repr(e)
            kind = (
                "http500" if "HTTP 500" in msg
                else "oom" if "RESOURCE_EXHAUSTED" in msg
                else "other"
            )
            emit(
                config=spec, ok=False, kind=kind,
                wall_s=round(time.time() - t0, 1), error=msg[:400],
            )
        finally:
            try:
                del index, eng
            except Exception:
                pass


if __name__ == "__main__":
    main()
