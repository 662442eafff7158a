"""Embedding backends behind one interface.

``embed(texts) -> np.ndarray [n, dim]`` replaces the reference's
``CacheBackedEmbeddings``-wrapped remote call (reference
``app/llm_services.py:175-231``). The embedding cache equivalent lives in
``storage`` (same SHA-256 key scheme); this module is pure compute.
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
    pooled_embeddings,
    stack_layer_params,
)
from outline_rag_tpu.models.hash_embedder import HashEmbedder
from outline_rag_tpu.models.tokenizer import DEFAULT_BUCKETS, HashTokenizer

log = logging.getLogger(__name__)


class EncoderEmbedder:
    """On-TPU XLM-R encoder embedder with bucketed static shapes.

    One compiled program per (batch-bucket, seq-bucket) pair; batches are
    padded up to the nearest bucket so arbitrary ingestion batch sizes hit
    cached executables.
    """

    def __init__(
        self,
        params,
        cfg: EncoderConfig,
        tokenizer,
        max_tokens: int = 512,
        seq_buckets=DEFAULT_BUCKETS,
        batch_buckets=(8, 32, 128),
        name: str = "bge-m3",
        max_batch_tokens: int = 64 * 1024,
        int8: bool = False,
    ):
        self.cfg = cfg
        # stacked layers -> lax.scan forward: one traced layer, much
        # faster compiles for 24-layer configs. QKV fusion follows the
        # measured policy (maybe_fuse_encoder_params: unfused by
        # default, 0.92x at the ingest shape).
        self.params = stack_layer_params(
            maybe_fuse_encoder_params(cast_params(params, cfg.dtype))
        )
        if int8:
            # w8a8 trunk (ENCODER_INT8): int8 MXU throughput at the
            # encoder's large-M shapes; heads/score paths stay full-prec
            from outline_rag_tpu.models.encoder import quantize_encoder_params

            self.params = quantize_encoder_params(self.params)
        self.tokenizer = tokenizer
        self.max_tokens = max_tokens
        if max_tokens > max(seq_buckets):
            # whole-document mode: extend the ladder to the 8k flash range
            from outline_rag_tpu.models.tokenizer import buckets_for

            seq_buckets = buckets_for(max_tokens)
        self.seq_buckets = seq_buckets
        self.batch_buckets = batch_buckets
        self.model_name = name
        # device-batch token budget: long sequence buckets run at small
        # batch so activations (B x S x intermediate) stay within HBM
        self.max_batch_tokens = max_batch_tokens
        self._jit = jax.jit(
            lambda p, ids, mask: pooled_embeddings(p, ids, mask, self.cfg)
        )

    @property
    def dim(self) -> int:
        return self.cfg.hidden

    def _pad_batch(self, n: int) -> int:
        for b in self.batch_buckets:
            if n <= b:
                return b
        return ((n + self.batch_buckets[-1] - 1) // self.batch_buckets[-1]) * (
            self.batch_buckets[-1]
        )

    @property
    def has_sparse_head(self) -> bool:
        return "sparse" in self.params

    def token_weights(
        self, input_ids: np.ndarray, attention_mask: np.ndarray
    ) -> np.ndarray | None:
        """Per-token lexical weights for the hybrid path (BGE-m3 sparse
        head); None when the checkpoint has no sparse head."""
        if not self.has_sparse_head:
            return None
        from outline_rag_tpu.models.encoder import sparse_token_weights

        if not hasattr(self, "_sparse_jit"):
            self._sparse_jit = jax.jit(
                lambda p, ids, mask: sparse_token_weights(p, ids, mask, self.cfg)
            )
        outs = []
        for m, ids, mask in self._bucketed(
            np.asarray(input_ids), np.asarray(attention_mask)
        ):
            out = self._sparse_jit(self.params, ids, mask)
            outs.append(np.asarray(out)[:m])
        return np.concatenate(outs, axis=0)

    @property
    def has_colbert_head(self) -> bool:
        return "colbert" in self.params

    def colbert_cache(
        self,
        input_ids: np.ndarray,
        attention_mask: np.ndarray,
        rank: int,
        proj: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray] | tuple[None, None]:
        """Projected + int8-quantized per-token ColBERT vectors for the
        index cache (``models/encoder.py::colbert_cache_codes``); (None,
        None) when the checkpoint has no ColBERT head.

        ``proj`` should be the index-pinned matrix
        (``VectorIndex.colbert_projection_for``) so ingest-side codes
        provably match the query-side projection; when omitted the
        fixed-seed matrix is computed locally (legacy callers/tests).
        """
        if not self.has_colbert_head:
            return None, None
        from outline_rag_tpu.models.encoder import (
            colbert_cache_codes,
            colbert_projection,
        )

        proj_np = None if proj is None else np.asarray(proj, np.float32)
        cached = getattr(self, "_colbert_proj_np", None)
        same_proj = (
            proj_np is None and cached is None
        ) or (
            proj_np is not None
            and cached is not None
            and np.array_equal(cached, proj_np)
        )
        if getattr(self, "_colbert_rank", None) != rank or not same_proj:
            hc = self.params["colbert"]["w"].shape[1]
            use = (
                jnp.asarray(proj_np)
                if proj_np is not None
                else colbert_projection(hc, rank)
            )
            self._colbert_rank = rank
            self._colbert_proj_np = proj_np
            self._colbert_jit = jax.jit(
                lambda p, ids, mask: colbert_cache_codes(
                    p, ids, mask, self.cfg, use
                )
            )
        code_parts, scale_parts = [], []
        for m, ids, mask in self._bucketed(
            np.asarray(input_ids), np.asarray(attention_mask)
        ):
            codes, scales = self._colbert_jit(self.params, ids, mask)
            code_parts.append(np.asarray(codes)[:m])
            scale_parts.append(np.asarray(scales)[:m])
        return (
            np.concatenate(code_parts, axis=0),
            np.concatenate(scale_parts, axis=0),
        )

    def _batch_cap(self, width: int) -> int:
        """Largest batch bucket whose token count fits the budget."""
        fitting = [b for b in self.batch_buckets if b * width <= self.max_batch_tokens]
        return fitting[-1] if fitting else self.batch_buckets[0]

    def _bucketed(self, input_ids: np.ndarray, attention_mask: np.ndarray):
        """Yield (real_rows, padded_ids, padded_mask) slices: batch dim
        padded to the bucket ladder and split by the token budget, so
        every jitted head (pooled/sparse/colbert) hits cached
        executables — an unbucketed per-document batch size would
        compile a fresh 20-70s remote program per distinct chunk count
        and run arbitrarily large forwards."""
        n, width = input_ids.shape
        cap = self._batch_cap(width)
        for start in range(0, n, cap):
            stop = min(start + cap, n)
            nb = min(self._pad_batch(stop - start), cap)
            ids = np.full((nb, width), self.tokenizer.pad_id, np.int32)
            mask = np.zeros((nb, width), np.int32)
            ids[: stop - start] = input_ids[start:stop]
            mask[: stop - start] = attention_mask[start:stop]
            yield stop - start, jnp.asarray(ids), jnp.asarray(mask)

    def embed(self, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dim), np.float32)
        tb = self.tokenizer.batch(texts, self.max_tokens, self.seq_buckets)
        outs = []
        for m, ids, mask in self._bucketed(tb.input_ids, tb.attention_mask):
            out = self._jit(self.params, ids, mask)
            outs.append(np.asarray(out)[:m])
        return np.concatenate(outs, axis=0)


def get_embedder(settings=None, dim: int | None = None):
    """Factory honouring Settings: real encoder when a weights path is
    configured, deterministic hash embedder otherwise (offline seam)."""
    if settings is not None and settings.encoder_weights_path:
        try:
            from outline_rag_tpu.models.convert import load_pretrained
            from outline_rag_tpu.models.tokenizer import HFTokenizer

            cfg, params = load_pretrained(settings.encoder_weights_path)
            tok = HFTokenizer(settings.encoder_weights_path)
            return EncoderEmbedder(
                params, cfg, tok, max_tokens=settings.encoder_max_tokens,
                int8=settings.encoder_int8,
            )
        except Exception as exc:
            # an explicitly configured encoder that fails to load is a
            # deployment error — serving hash embeddings instead would
            # silently break retrieval quality (same policy as the
            # decoder path in serve/app.py)
            raise RuntimeError(
                "ENCODER_WEIGHTS_PATH is set but the checkpoint failed to "
                f"load from {settings.encoder_weights_path!r}"
            ) from exc
    d = dim or (settings.vector_dim if settings else 1024)
    return HashEmbedder(dim=d)
