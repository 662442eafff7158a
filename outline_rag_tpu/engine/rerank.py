"""Rerank backends.

Interface: ``rerank(query, passages, top_n) -> list[(orig_index, score)]``
sorted by score descending — the contract of the reference's
``SiliconFlowReranker`` response handling (sort by relevance_score, map
``index`` back to original docs, reference ``app/llm_services.py:319-332``).
Failure semantics are fail-open: any error returns ``[]`` and the caller
proceeds with no context (reference ``app/llm_services.py:288-309``).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from outline_rag_tpu.models.encoder import (
    EncoderConfig,
    cast_params,
    maybe_fuse_encoder_params,
    stack_layer_params,
)
from outline_rag_tpu.models.reranker import reranker_forward

log = logging.getLogger(__name__)


class NoopReranker:
    """Keeps retrieval order; used when no reranker weights are available.
    Scores passed through are the caller's retrieval scores."""

    def rerank(
        self, query: str, passages: list[str], top_n: int
    ) -> list[tuple[int, float]]:
        return [(i, float(len(passages) - i)) for i in range(min(top_n, len(passages)))]


class CrossEncoderReranker:
    def __init__(
        self,
        params,
        cfg: EncoderConfig,
        tokenizer,
        max_tokens: int = 512,
        pair_buckets=(64, 128, 256, 512),
        int8: bool = False,
    ):
        self.cfg = cfg
        # QKV fusion follows the measured policy (unfused by default,
        # 0.92x at the ingest shape — models/encoder.py policy note)
        self.params = stack_layer_params(
            maybe_fuse_encoder_params(cast_params(params, cfg.dtype))
        )
        if int8:
            # w8a8 trunk (ENCODER_INT8): the rerank forward is B*K pair
            # sequences per query batch — the framework's biggest
            # per-ask MXU bill; the classifier head stays f32 HIGHEST
            from outline_rag_tpu.models.encoder import quantize_encoder_params

            self.params = quantize_encoder_params(self.params)
        self.tokenizer = tokenizer
        self.max_tokens = max_tokens
        self.pair_buckets = pair_buckets
        self._jit = jax.jit(
            lambda p, ids, mask: reranker_forward(p, ids, mask, self.cfg)
        )

    def rerank(
        self, query: str, passages: list[str], top_n: int
    ) -> list[tuple[int, float]]:
        if not passages:
            return []
        try:
            tb = self.tokenizer.batch_pairs(
                [query] * len(passages),
                passages,
                self.max_tokens,
                self.pair_buckets,
            )
            # pad candidate count to a fixed bucket (TOP_K is the usual size)
            n, width = tb.input_ids.shape
            nb = 16 if n <= 16 else ((n + 15) // 16) * 16
            ids = np.full((nb, width), self.tokenizer.pad_id, np.int32)
            mask = np.zeros((nb, width), np.int32)
            ids[:n] = tb.input_ids
            mask[:n] = tb.attention_mask
            scores = np.asarray(
                self._jit(self.params, jnp.asarray(ids), jnp.asarray(mask))
            )[:n]
            order = np.argsort(-scores, kind="stable")[:top_n]
            return [(int(i), float(scores[i])) for i in order]
        except Exception:
            log.exception("rerank failed; returning no candidates (fail-open)")
            return []
