"""On-TPU model forward passes.

Replaces the reference's remote SiliconFlow model calls:

- ``encoder``   : XLM-RoBERTa-family dense embedding encoder (the BGE-m3
                  architecture) — replaces ``SiliconFlowEmbeddings``
                  (reference ``app/llm_services.py:175-231``).
- ``reranker``  : cross-encoder sequence scorer (bge-reranker-v2-m3
                  architecture) — replaces ``SiliconFlowReranker``
                  (reference ``app/llm_services.py:235-344``).
- ``tokenizer`` : host-side HF tokenizer with fixed-shape bucketing.
- ``hash_embedder``: deterministic offline fallback embedder (test seam,
                  like the fake-embedder seam in SURVEY.md section 4).
- ``convert``   : HF torch checkpoint -> JAX params.
"""

from outline_rag_tpu.models.encoder import (
    EncoderConfig,
    encode_texts_config,
    encoder_forward,
    init_encoder_params,
    pooled_embeddings,
)
from outline_rag_tpu.models.reranker import (
    init_reranker_params,
    reranker_forward,
)

__all__ = [
    "EncoderConfig",
    "encoder_forward",
    "init_encoder_params",
    "pooled_embeddings",
    "encode_texts_config",
    "init_reranker_params",
    "reranker_forward",
]
