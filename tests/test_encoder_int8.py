"""w8a8 int8 encoder/reranker trunk parity (ENCODER_INT8).

The serving path's largest MXU bills are the query encode and the B*K
rerank pair forward (reference seams: remote embedding + /v1/rerank
calls, ``app/llm_services.py:175-344``). ``quantize_encoder_params``
moves the trunk's six dense projections per layer to int8 x int8 MXU
dots (the decoder's proven w8a8 strategy at large-M shapes); these
tests pin that the quantized trunk stays within the repo's parity bar
(cosine > 0.999, the SURVEY section 7 step 3 criterion) and that every
consumer — embedder, reranker, fused engine, aux heads — runs on the
quantized tree.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from outline_rag_tpu.engine.embedder import EncoderEmbedder
from outline_rag_tpu.engine.rerank import CrossEncoderReranker
from outline_rag_tpu.models.encoder import (
    EncoderConfig,
    cast_params,
    init_encoder_params,
    init_sparse_head,
    pooled_embeddings,
    quantize_encoder_params,
    sparse_token_weights,
    stack_layer_params,
)
from outline_rag_tpu.models.reranker import init_reranker_params, reranker_forward
from outline_rag_tpu.models.tokenizer import HashTokenizer


def _inputs(batch=8, seq=24, vocab=1024, seed=0):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(3, vocab, (batch, seq)).astype(np.int32))
    mask = jnp.ones((batch, seq), jnp.int32)
    return ids, mask


def test_quantized_tree_structure():
    cfg = EncoderConfig.tiny()
    p = stack_layer_params(init_encoder_params(jax.random.key(0), cfg))
    pq = quantize_encoder_params(p)
    for grp, names in (("attn", ("wq", "wk", "wv", "wo")), ("mlp", ("wi", "wo"))):
        for nm in names:
            leaf = pq["layers"][grp][nm]
            assert set(leaf) == {"q", "s"}
            assert leaf["q"].dtype == jnp.int8
            assert leaf["s"].dtype == jnp.float32
            # [L, N, K] transposed layout, scales per output channel
            assert leaf["q"].shape[:2] == (cfg.layers, leaf["s"].shape[1])
    # non-trunk params untouched
    assert pq["embed"]["word"].dtype != jnp.int8
    assert pq["layers"]["attn"]["ln_scale"].dtype == jnp.float32


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_int8_embedding_cosine_parity(dtype):
    cfg = EncoderConfig.tiny(dtype=dtype)
    p = stack_layer_params(
        cast_params(init_encoder_params(jax.random.key(0), cfg), dtype)
    )
    pq = quantize_encoder_params(p)
    ids, mask = _inputs()
    e_d = np.asarray(pooled_embeddings(p, ids, mask, cfg))
    e_q = np.asarray(pooled_embeddings(pq, ids, mask, cfg))
    cos = np.sum(e_d * e_q, axis=1)  # both unit-norm
    assert cos.min() > 0.999, cos


def test_int8_reranker_order_parity():
    cfg = EncoderConfig.tiny()
    rr = stack_layer_params(init_reranker_params(jax.random.key(1), cfg))
    rr_q = quantize_encoder_params(rr)
    ids, mask = _inputs(seed=3)
    s_d = np.asarray(reranker_forward(rr, ids, mask, cfg))
    s_q = np.asarray(reranker_forward(rr_q, ids, mask, cfg))
    assert (np.argsort(-s_d) == np.argsort(-s_q)).all(), (s_d, s_q)
    assert np.corrcoef(s_d, s_q)[0, 1] > 0.999


def test_embedder_int8_end_to_end():
    cfg = EncoderConfig.tiny()
    params = init_encoder_params(jax.random.key(0), cfg)
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    texts = ["alpha wolf pack forest", "geiger counter radiation levels"]
    dense = EncoderEmbedder(
        params, cfg, tok, max_tokens=32, seq_buckets=(32,), name="tiny"
    )
    q8 = EncoderEmbedder(
        params, cfg, tok, max_tokens=32, seq_buckets=(32,), name="tiny",
        int8=True,
    )
    e_d, e_q = dense.embed(texts), q8.embed(texts)
    assert np.allclose(np.linalg.norm(e_q, axis=1), 1.0, atol=1e-4)
    cos = np.sum(e_d * e_q, axis=1)
    assert cos.min() > 0.999, cos


def test_fused_engine_runs_on_int8_trunks():
    """The fused one-program path consumes the raw param trees; int8
    dict leaves must trace through encode -> retrieve -> rerank."""
    from outline_rag_tpu.engine.service import RetrievalService
    from outline_rag_tpu.index import VectorIndex

    cfg = EncoderConfig.tiny()
    enc_params = init_encoder_params(jax.random.key(0), cfg)
    rr_params = init_reranker_params(jax.random.key(1), cfg)
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    emb = EncoderEmbedder(
        enc_params, cfg, tok, max_tokens=64, seq_buckets=(32, 64),
        name="tiny", int8=True,
    )
    rr = CrossEncoderReranker(rr_params, cfg, tok, max_tokens=128, int8=True)
    idx = VectorIndex(dim=emb.dim, capacity=2048, token_width=32)
    docs = {
        "alpha": "the alpha wolf leads the pack through the snowy forest",
        "gamma": "gamma radiation is measured with a geiger counter",
    }
    for name, text in docs.items():
        tb = tok.batch([text], 32, buckets=(32,))
        idx.add_chunks(
            [f"{name}:0"], emb.embed([text]), source_id=name,
            token_ids=tb.input_ids, token_mask=tb.attention_mask,
        )
    svc = RetrievalService(idx, emb, rr, top_k=2, rerank_k=2)
    assert svc.fused
    out = svc.retrieve_batch(["wolf pack in the forest"])
    assert out and out[0]
    assert {c.chunk_id for c in out[0]} <= {"alpha:0", "gamma:0"}


def test_aux_heads_run_on_int8_trunk():
    """Sparse head (and by the same path ColBERT) reads hidden states
    produced by the quantized trunk; head weights stay full-precision."""
    cfg = EncoderConfig.tiny()
    p = init_encoder_params(jax.random.key(0), cfg)
    p["sparse"] = init_sparse_head(jax.random.key(2), cfg)
    pq = quantize_encoder_params(stack_layer_params(p))
    ids, mask = _inputs(batch=4)
    w = np.asarray(sparse_token_weights(pq, ids, mask, cfg))
    assert w.shape == (4, ids.shape[1])
    assert np.isfinite(w).all() and (w >= 0).all()
