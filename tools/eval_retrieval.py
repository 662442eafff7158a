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
        for dtype in ("float32", "f32x2", "bfloat16", "int8"):
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


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--ladder":
        rungs = tuple(
            int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2
                             else "10000,100000,1000000".split(","))
        )
        print(json.dumps(evaluate_ladder(rungs=rungs), indent=2))
    else:
        n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
        d = int(sys.argv[2]) if len(sys.argv) > 2 else 256
        print(
            json.dumps({"n_chunks": n, "dim": d, "results": evaluate(n, d)}, indent=2)
        )
