"""RetrievalService: the engine facade used by the serve layer.

Equivalent of the reference's retriever pipeline construction + use
(``initialize_rag_components`` building base retriever -> reranker,
reference ``app/rag.py:36-100``, and ``_get_reranked_parent_docs``,
reference ``app/blueprints/api.py:112-149`` — minus the parent-doc fetch,
which stays in the serve layer against the document store).

Two execution paths behind one ``retrieve_batch`` call:
- fused: single XLA program (``engine/fused.py``) when both encoder and
  reranker are on-TPU JAX models and the index carries a token cache;
- staged: embed -> index.query -> rerank as separate device calls (works
  with the hash embedder / noop reranker seams).
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np

from outline_rag_tpu.engine.embedder import EncoderEmbedder
from outline_rag_tpu.engine.rerank import CrossEncoderReranker, NoopReranker
from outline_rag_tpu.index.store import VectorIndex
from outline_rag_tpu.utils.profiling import metrics

log = logging.getLogger(__name__)


@dataclasses.dataclass
class RetrievedChunk:
    chunk_id: str
    score: float  # retrieval (dense) score on BOTH paths; the
    #               cross-encoder score lives in rerank_score
    rerank_score: float | None = None


class RetrievalService:
    def __init__(
        self,
        index: VectorIndex,
        embedder,
        reranker=None,
        top_k: int = 12,
        rerank_k: int = 3,
        chunk_text_lookup=None,  # callable chunk_id -> text (staged rerank)
        lex_weight: float = 0.0,
        colbert_weight: float = 0.0,
    ):
        self.index = index
        self.embedder = embedder
        self.reranker = reranker or NoopReranker()
        self.top_k = top_k
        self.rerank_k = rerank_k
        self.chunk_text_lookup = chunk_text_lookup
        self._fused = None
        if (
            isinstance(embedder, EncoderEmbedder)
            and isinstance(self.reranker, CrossEncoderReranker)
            and index.tokens is not None
        ):
            from outline_rag_tpu.engine.fused import FusedEngine

            self._fused = FusedEngine(
                embedder, self.reranker, index, top_k, rerank_k,
                lex_weight=lex_weight, colbert_weight=colbert_weight,
            )

    @property
    def fused(self) -> bool:
        return self._fused is not None

    # consecutive fused failures before the engine stops attempting the
    # fused program at all. Rationale (northstar_1m_int8r forensics,
    # 2026-08-21): jit caches only SUCCESSFUL compiles, so a program the
    # remote compiler deterministically rejects (the 1M int8r + rank-64
    # hybrid fused query, HTTP 500 from tpu_compile_helper) was re-paid
    # as a multi-second failing compile on EVERY ask — 174 failures in
    # one serve run, ~10 asks/s, every answer silently served without
    # context through chat.py's fail-open. Three strikes tolerates
    # transient tunnel errors; a deterministic rejection downgrades to
    # the staged path (smaller programs, known-compiling) permanently.
    _FUSED_STRIKE_LIMIT = 3

    def retrieve_batch(self, queries: list[str]) -> list[list[RetrievedChunk]]:
        if not queries:
            return []
        if self._fused is not None:
            try:
                with metrics.timeit("retrieve.fused"):
                    fused_out = self._fused.query(queries)
            except Exception:
                import logging

                self._fused_strikes = getattr(self, "_fused_strikes", 0) + 1
                log = logging.getLogger(__name__)
                if self._fused_strikes >= self._FUSED_STRIKE_LIMIT:
                    log.exception(
                        "fused retrieval failed %d times; disabling the "
                        "fused engine (staged path from here on)",
                        self._fused_strikes,
                    )
                    self._fused = None
                else:
                    log.exception(
                        "fused retrieval failed (strike %d/%d); serving "
                        "this batch via the staged path",
                        self._fused_strikes, self._FUSED_STRIKE_LIMIT,
                    )
                with metrics.timeit("retrieve.staged"):
                    return self._staged(queries)
            else:
                self._fused_strikes = 0
                return [
                    [
                        RetrievedChunk(cid, dense, rerank_score=rr)
                        for cid, rr, dense in row
                    ]
                    for row in fused_out
                ]
        with metrics.timeit("retrieve.staged"):
            return self._staged(queries)

    def retrieve(self, query: str) -> list[RetrievedChunk]:
        return self.retrieve_batch([query])[0]

    # -- staged path -------------------------------------------------------

    def _staged(self, queries: list[str]) -> list[list[RetrievedChunk]]:
        with metrics.timeit("retrieve.embed"):
            qvecs = self.embedder.embed(queries)
        with metrics.timeit("retrieve.index"):
            ids, scores = self.index.query(qvecs, self.top_k)
        out: list[list[RetrievedChunk]] = []
        for qi, (query, chunk_ids) in enumerate(zip(queries, ids)):
            if not chunk_ids:
                out.append([])
                continue
            if isinstance(self.reranker, NoopReranker) or self.chunk_text_lookup is None:
                out.append(
                    [
                        RetrievedChunk(cid, float(scores[qi, j]))
                        for j, cid in enumerate(chunk_ids[: self.rerank_k])
                    ]
                )
                continue
            texts = [self.chunk_text_lookup(cid) or "" for cid in chunk_ids]
            ranked = self.reranker.rerank(query, texts, self.rerank_k)
            out.append(
                [
                    RetrievedChunk(
                        chunk_ids[i], float(scores[qi, i]), rerank_score=s
                    )
                    for i, s in ranked
                ]
            )
        return out
