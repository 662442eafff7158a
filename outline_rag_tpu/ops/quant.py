"""Per-row int8 quantization for the index and quantized scoring.

Replaces nothing in the reference directly (pgvector stores fp32 vectors,
reference ``app/database.py:126``); this is the TPU-native memory-footprint
lever: an int8 corpus is 4x smaller than fp32 at near-identical recall@12
when the top candidates are rescored in higher precision (see
``outline_rag_tpu.engine.query``).

Scheme: symmetric per-row absmax. ``q = round(x * 127 / absmax(row))``,
``scale = absmax(row) / 127``. Scores rescale as
``score = (q_q . q_c) * scale_q * scale_c`` — exact for the dot product up
to rounding because scales are per-row on both sides.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def quantize_rows_int8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[N, D] float -> ([N, D] int8, [N] f32 scales). Zero rows get scale 0."""
    absmax = jnp.max(jnp.abs(x), axis=1)
    scale = absmax / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(x / safe[:, None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


@jax.jit
def dequantize_rows_int8(q: jax.Array, scale: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * scale[:, None]


@functools.partial(jax.jit, static_argnames=("k",))
def int8_topk(
    q_queries: jax.Array,  # [B, D] int8
    q_scale: jax.Array,  # [B] f32
    corpus: jax.Array,  # [N, D] int8
    c_scale: jax.Array,  # [N] f32
    k: int,
    penalty: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Quantized exact top-K: int8 dot on the MXU (int32 accumulate), then
    per-pair rescale in f32. XLA path; the pallas int8 fused path reuses the
    fp32 kernel with pre-scaled scores folded into the corpus (see
    ``index.shard.DeviceShard.scored_corpus``)."""
    raw = jax.lax.dot_general(
        q_queries,
        corpus,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = raw.astype(jnp.float32) * q_scale[:, None] * c_scale[None, :]
    if penalty is not None:
        scores = scores + penalty[None, :]
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx.astype(jnp.int32)


def rescore_fp32(
    queries: jax.Array,  # [B, D] f32
    corpus_rows: jax.Array,  # [B, K, D] f32 gathered candidates
) -> jax.Array:
    """Exact fp32 rescore of gathered candidate rows: [B, K] scores."""
    return jnp.einsum(
        "bd,bkd->bk", queries, corpus_rows, preferred_element_type=jnp.float32
    )


__all__ = [
    "quantize_rows_int8",
    "dequantize_rows_int8",
    "int8_topk",
    "rescore_fp32",
]
