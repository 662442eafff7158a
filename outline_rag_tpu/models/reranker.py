"""Cross-encoder reranker (bge-reranker-v2-m3 architecture).

Replaces the reference's remote ``/v1/rerank`` call
(``SiliconFlowReranker``, reference ``app/llm_services.py:235-344``): the
(query, chunk) pair is tokenized as one sequence, run through the same
XLM-RoBERTa encoder trunk, and scored by a classification head on the CLS
token (dense -> tanh -> out_proj(1)), so rerank runs on-TPU inside the
fused query program instead of a second HTTP round-trip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from outline_rag_tpu.models.encoder import (
    EncoderConfig,
    Params,
    _dense_init,
    encoder_forward,
    init_encoder_params,
)


def init_reranker_params(key: jax.Array, cfg: EncoderConfig) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    params = init_encoder_params(k1, cfg)
    params["classifier"] = {
        "dense_w": _dense_init(k2, (cfg.hidden, cfg.hidden)),
        "dense_b": jnp.zeros((cfg.hidden,), jnp.float32),
        "out_w": _dense_init(k3, (cfg.hidden, 1)),
        "out_b": jnp.zeros((1,), jnp.float32),
    }
    return params


def reranker_forward(
    params: Params,
    input_ids: jax.Array,  # [B, S] query+passage pair sequences
    attention_mask: jax.Array,  # [B, S]
    cfg: EncoderConfig,
) -> jax.Array:
    """Relevance scores [B] (raw logits; monotonic in relevance, like the
    provider's ``relevance_score`` ordering, reference
    ``app/llm_services.py:319-326``)."""
    hidden = encoder_forward(params, input_ids, attention_mask, cfg)
    cls = hidden[:, 0, :].astype(jnp.float32)
    # f32 score-path matmuls: HIGHEST, or the MXU truncates to bf16 and
    # near-tie candidates flip order vs the oracle (repo precision rule)
    hi = jax.lax.Precision.HIGHEST
    h = jnp.tanh(
        jnp.matmul(cls, params["classifier"]["dense_w"], precision=hi)
        + params["classifier"]["dense_b"]
    )
    logits = (
        jnp.matmul(h, params["classifier"]["out_w"], precision=hi)
        + params["classifier"]["out_b"]
    )
    return logits[:, 0]
