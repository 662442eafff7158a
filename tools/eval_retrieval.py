"""Retrieval-quality evaluation harness.

Self-retrieval protocol (no labeled data needed): chunks are indexed, then
queried with perturbed excerpts of themselves; recall@k measures whether
the source chunk comes back. Run across index dtypes to quantify the
quantization ladder (BASELINE.md: fp32 exact parity; measured tolerance
for bf16/int8).

Usage: python tools/eval_retrieval.py [n_chunks] [dim]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from outline_rag_tpu.index import VectorIndex
from outline_rag_tpu.models.hash_embedder import HashEmbedder

WORDS = (
    "wolf river star canyon helium pack tundra spring orbit moon forest "
    "glacier ember quartz raven delta fusion sediment aurora basalt lichen "
    "comet fjord nebula osprey tide juniper magma talon frost prairie"
).split()


def make_corpus(rng: np.random.Generator, n: int) -> list[str]:
    texts = []
    for _ in range(n):
        words = rng.choice(WORDS, size=rng.integers(12, 30))
        texts.append(" ".join(words))
    return texts


def perturbed_query(rng: np.random.Generator, text: str) -> str:
    """Excerpt + noise: drop ~30% of words, shuffle lightly."""
    words = text.split()
    keep = [w for w in words if rng.random() > 0.3]
    if not keep:
        keep = words[:3]
    return " ".join(keep)


def evaluate(n_chunks: int = 500, dim: int = 256, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    emb = HashEmbedder(dim=dim)
    texts = make_corpus(rng, n_chunks)
    vectors = emb.embed(texts)
    queries = [perturbed_query(rng, t) for t in texts]
    n_queries = min(100, n_chunks)
    qvecs = emb.embed(queries[:n_queries])

    results: dict = {}
    fp32_top: list[list[str]] | None = None
    for dtype in ("float32", "bfloat16", "int8"):
        idx = VectorIndex(dim=dim, capacity=max(2048, 1 << (n_chunks - 1).bit_length()), dtype=dtype)
        idx.add_chunks([f"c{i}" for i in range(n_chunks)], vectors, source_id="eval")
        ids, _ = idx.query(qvecs, k=12)
        r1 = np.mean([ids[i][0] == f"c{i}" for i in range(n_queries)])
        r12 = np.mean([f"c{i}" in ids[i] for i in range(n_queries)])
        entry = {
            "recall@1": round(float(r1), 4),
            "recall@12": round(float(r12), 4),
        }
        if dtype == "float32":
            fp32_top = ids
        else:
            # set agreement of the quantized top-12 vs the fp32 top-12:
            # the discriminating metric once self-retrieval saturates
            agree = np.mean(
                [
                    len(set(ids[i]) & set(fp32_top[i])) / max(len(fp32_top[i]), 1)
                    for i in range(n_queries)
                ]
            )
            entry["agreement@12_vs_fp32"] = round(float(agree), 4)
        results[dtype] = entry
    return results


def evaluate_ladder(
    rungs=(10_000, 100_000, 1_000_000),
    dim: int = 1024,
    n_queries: int = 64,
    noise: float = 0.35,
    seed: int = 0,
) -> dict:
    """The BASELINE.md scaling ladder as ONE diffable JSON artifact.

    Vector-space protocol at scale (text hashing would dominate runtime
    at 1M rows): corpus = random unit vectors; query q_i = unit(c_i +
    noise*g). recall@k = does row i come back. fp32 must be exact
    (recall@1 = 1.0 — the pgvector-exact-parity claim); bf16/int8 report
    measured recall + top-12 set agreement vs the fp32 lists.
    """
    import jax

    out: dict = {
        "protocol": f"self-retrieval, noise={noise}, B={n_queries}, dim={dim}",
        "backend": jax.default_backend(),
        "rungs": {},
    }
    for n in rungs:
        rng = np.random.default_rng(seed)
        corpus = rng.standard_normal((n, dim)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        g = rng.standard_normal((n_queries, dim)).astype(np.float32)
        g /= np.linalg.norm(g, axis=1, keepdims=True)  # unit perturbation
        queries = corpus[:n_queries] + noise * g
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)

        cap = 1 << (n - 1).bit_length()
        if n > cap * 0.75:
            # stay under the ~80% speculative-warm trigger: at 95%
            # occupancy every dtype's index kicks off next-capacity
            # (2x) remote pre-warm compiles the eval never uses
            cap *= 2
        rung: dict = {}
        fp32_lists: list[list[str]] | None = None
        for dtype in ("float32", "f32x2", "bfloat16", "int8", "int8r"):
            idx = VectorIndex(dim=dim, capacity=cap, dtype=dtype)
            ids_all = [f"c{i}" for i in range(n)]
            # append in large source blocks (the ingest shape at scale)
            step = 100_000
            for lo in range(0, n, step):
                hi = min(lo + step, n)
                idx.add_chunks(
                    ids_all[lo:hi], corpus[lo:hi], source_id=f"blk{lo}",
                    replace=False,
                )
            ids, _ = idx.query(queries, k=12)
            r1 = float(np.mean([ids[i][0] == f"c{i}" for i in range(n_queries)]))
            r12 = float(np.mean([f"c{i}" in ids[i] for i in range(n_queries)]))
            entry = {"recall@1": round(r1, 4), "recall@12": round(r12, 4)}
            if dtype == "float32":
                fp32_lists = ids
            else:
                agree = float(
                    np.mean(
                        [
                            len(set(ids[i]) & set(fp32_lists[i]))
                            / max(len(fp32_lists[i]), 1)
                            for i in range(n_queries)
                        ]
                    )
                )
                entry["agreement@12_vs_fp32"] = round(agree, 4)
            rung[dtype] = entry
            del idx  # free device memory before the next dtype
        out["rungs"][str(n)] = rung
    return out


def evaluate_text(
    n_chunks: int = 384,
    n_queries: int = 64,
    seed: int = 0,
) -> dict:
    """TEXT-path rung (VERDICT r3 item 8): tokenize -> encode -> fused
    retrieve (+hybrid lexical / cached-ColBERT modes) -> rerank, end to
    end over generated wiki-ish paragraphs — the pipeline real serving
    runs, where the vector-space ladder above shortcuts the encoder.

    Random-init tiny encoder + HashTokenizer (the no-network fallback
    stack); the reranker is random too, so recall@1 is computed on the
    RETRIEVAL ordering (each result row carries the retrieval score).
    Reports per index dtype (float32 vs int8+rescore) and per mode
    (dense / +lex / +colbert / hybrid): recall, top-12 agreement across
    dtypes, and the mode-vs-dense overlap (how much the hybrid paths
    actually move rankings on text)."""
    import jax

    from outline_rag_tpu.engine.embedder import EncoderEmbedder
    from outline_rag_tpu.engine.fused import FusedEngine
    from outline_rag_tpu.engine.rerank import CrossEncoderReranker
    from outline_rag_tpu.models.encoder import (
        EncoderConfig,
        init_colbert_head,
        init_encoder_params,
        init_sparse_head,
    )
    from outline_rag_tpu.models.reranker import init_reranker_params
    from outline_rag_tpu.models.tokenizer import HashTokenizer

    rng = np.random.default_rng(seed)
    cfg = EncoderConfig.tiny()
    params = init_encoder_params(jax.random.key(seed), cfg)
    rr_params = init_reranker_params(jax.random.key(seed + 1), cfg)
    tok = HashTokenizer(vocab_size=cfg.vocab_size)

    # A RANDOM-init tiny encoder maps every paragraph to ~0.99 cosine of
    # every other (measured), so quantization noise would swamp the
    # ranking gaps and the dtype comparison would be meaningless. A few
    # hundred contrastive steps on (perturbed excerpt, chunk) pairs —
    # the repo's own training loop — spreads the space the way a real
    # checkpoint does.
    from outline_rag_tpu.models.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    train_texts = make_corpus(rng, 256)
    optimizer = make_optimizer(lr=3e-4)
    state = init_train_state(params, optimizer)
    train_step = make_train_step(cfg, optimizer)
    for step in range(120):
        lo = (step * 32) % len(train_texts)
        chunk = [
            train_texts[(lo + j) % len(train_texts)] for j in range(32)
        ]
        qtexts = [perturbed_query(rng, t) for t in chunk]
        qb = tok.batch(qtexts, 32, buckets=(32,))
        pb = tok.batch(chunk, 32, buckets=(32,))
        batch = {
            "q_ids": qb.input_ids, "q_mask": qb.attention_mask,
            "p_ids": pb.input_ids, "p_mask": pb.attention_mask,
        }
        state, _metrics = train_step(state, batch)
    params = jax.device_get(state.params)
    params["sparse"] = init_sparse_head(jax.random.key(seed + 2), cfg)
    params["colbert"] = init_colbert_head(jax.random.key(seed + 3), cfg)
    emb = EncoderEmbedder(
        params, cfg, tok, max_tokens=64, seq_buckets=(64,), name="tiny"
    )
    rr = CrossEncoderReranker(rr_params, cfg, tok, max_tokens=128)

    texts = make_corpus(rng, n_chunks)
    queries = [perturbed_query(rng, t) for t in texts[:n_queries]]
    tw = 32
    cb_rank = 8
    hc = params["colbert"]["w"].shape[1]
    vectors = emb.embed(texts)
    tb = tok.batch(texts, tw, buckets=(tw,))
    token_weights = emb.token_weights(tb.input_ids, tb.attention_mask)

    modes = {
        "dense": (0.0, 0.0),
        "lex": (0.35, 0.0),
        "colbert": (0.0, 0.35),
        "hybrid": (0.35, 0.35),
    }
    out: dict = {
        "protocol": (
            f"text self-retrieval, n={n_chunks}, B={n_queries}, "
            f"tiny encoder + hash tokenizer, token_width={tw}, "
            f"colbert_rank={cb_rank}"
        ),
        "backend": jax.default_backend(),
        "dtypes": {},
    }
    sets: dict = {}  # (dtype, mode) -> list of top-12 id sets
    for dtype in ("float32", "int8"):
        vidx = VectorIndex(
            dim=cfg.hidden,
            capacity=1024,
            dtype=dtype,
            token_width=tw,
            colbert_rank=cb_rank,
        )
        cb_codes, cb_scales = emb.colbert_cache(
            tb.input_ids, tb.attention_mask, cb_rank,
            proj=vidx.colbert_projection_for(hc),
        )
        vidx.add_chunks(
            [f"c{i}" for i in range(n_chunks)],
            vectors,
            source_id="eval",
            token_ids=tb.input_ids,
            token_mask=tb.attention_mask,
            token_weights=token_weights,
            colbert_codes=cb_codes,
            colbert_scales=cb_scales,
        )
        dt_entry: dict = {}
        for mode, (lw, cw) in modes.items():
            eng = FusedEngine(
                emb, rr, vidx, top_k=12, rerank_k=12,
                lex_weight=lw, colbert_weight=cw,
            )
            res = eng.query(queries)
            # retrieval ordering: sort each row by the retrieval score
            # (random-init reranker scores would scramble recall@1)
            ordered = [
                [r[0] for r in sorted(row, key=lambda r: -r[2])]
                for row in res
            ]
            r1 = float(np.mean(
                [ordered[i][:1] == [f"c{i}"] for i in range(n_queries)]
            ))
            r12 = float(np.mean(
                [f"c{i}" in ordered[i] for i in range(n_queries)]
            ))
            sets[dtype, mode] = [set(o) for o in ordered]
            sets[dtype, mode, "order"] = ordered
            entry = {"recall@1": round(r1, 4), "recall@12": round(r12, 4)}
            if mode != "dense":
                # the candidate SET is dense-chosen (top_k == 12), so
                # the hybrid modes show up as ORDER changes: fraction
                # of queries whose retrieval ranking moved at all
                dense_o = sets[dtype, "dense", "order"]
                entry["order_changed_vs_dense"] = round(float(np.mean([
                    ordered[i] != dense_o[i] for i in range(n_queries)
                ])), 4)
            if dtype != "float32":
                entry["agreement@12_vs_fp32"] = round(float(np.mean([
                    len(sets[dtype, mode][i] & sets["float32", mode][i])
                    / max(len(sets["float32", mode][i]), 1)
                    for i in range(n_queries)
                ])), 4)
            dt_entry[mode] = entry
        out["dtypes"][dtype] = dt_entry
        del vidx
    return out


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--ladder":
        rungs = tuple(
            int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2
                             else "10000,100000,1000000".split(","))
        )
        print(json.dumps(evaluate_ladder(rungs=rungs), indent=2))
    elif len(sys.argv) > 1 and sys.argv[1] == "--text":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 384
        print(json.dumps(evaluate_text(n_chunks=n), indent=2))
    else:
        n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
        d = int(sys.argv[2]) if len(sys.argv) > 2 else 256
        print(
            json.dumps({"n_chunks": n, "dim": d, "results": evaluate(n, d)}, indent=2)
        )
