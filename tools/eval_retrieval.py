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


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    print(json.dumps({"n_chunks": n, "dim": d, "results": evaluate(n, d)}, indent=2))
