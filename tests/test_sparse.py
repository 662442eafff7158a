"""BGE-m3 sparse (lexical) head + hybrid rescoring tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from outline_rag_tpu.models.encoder import (
    EncoderConfig,
    init_encoder_params,
    init_sparse_head,
    lexical_overlap_scores,
    sparse_token_weights,
)


@pytest.fixture(scope="module")
def sparse_model():
    cfg = EncoderConfig.tiny()
    params = init_encoder_params(jax.random.key(0), cfg)
    params["sparse"] = init_sparse_head(jax.random.key(1), cfg)
    return cfg, params


def test_sparse_weights_masking(sparse_model):
    cfg, params = sparse_model
    rng = np.random.default_rng(0)
    b, s = 2, 12
    ids = rng.integers(3, cfg.vocab_size, size=(b, s)).astype(np.int32)
    ids[:, 0] = 0  # CLS
    mask = np.ones((b, s), np.int32)
    mask[0, 8:] = 0  # padding tail
    ids[0, 8:] = 1
    w = np.asarray(
        sparse_token_weights(params, jnp.asarray(ids), jnp.asarray(mask), cfg)
    )
    assert w.shape == (b, s)
    assert (w >= 0).all()  # relu
    assert (w[:, 0] == 0).all()  # CLS zeroed
    assert (w[0, 8:] == 0).all()  # padding zeroed
    assert w[1, 1:].max() > 0  # real tokens get weight


def test_lexical_overlap_math():
    # query tokens [5, 7, 9]; candidate A contains 5 and 9, candidate B none
    q_ids = jnp.asarray([[5, 7, 9]])
    q_w = jnp.asarray([[1.0, 2.0, 3.0]])
    cand_ids = jnp.asarray([[[5, 9, 1, 1], [20, 21, 22, 23]]])  # [1, 2, 4]
    cand_w = jnp.asarray([[[0.5, 0.25, 0.0, 0.0], [9.0, 9.0, 9.0, 9.0]]])
    lex = np.asarray(lexical_overlap_scores(q_ids, q_w, cand_ids, cand_w))
    # A: 1.0*0.5 (tok 5) + 3.0*0.25 (tok 9) = 1.25; B: 0 (no overlap)
    np.testing.assert_allclose(lex, [[1.25, 0.0]], rtol=1e-6)


def test_lexical_duplicate_tokens_take_max():
    q_ids = jnp.asarray([[5]])
    q_w = jnp.asarray([[2.0]])
    cand_ids = jnp.asarray([[[5, 5, 5, 1]]])
    cand_w = jnp.asarray([[[0.1, 0.9, 0.4, 0.0]]])
    lex = np.asarray(lexical_overlap_scores(q_ids, q_w, cand_ids, cand_w))
    np.testing.assert_allclose(lex, [[1.8]], rtol=1e-6)  # 2.0 * max(0.9)


def test_fused_hybrid_rescoring(sparse_model):
    """Identical dense scores; lexical overlap must break the tie in favor
    of the candidate sharing tokens with the query."""
    from outline_rag_tpu.engine.embedder import EncoderEmbedder
    from outline_rag_tpu.engine.fused import FusedEngine
    from outline_rag_tpu.engine.rerank import CrossEncoderReranker
    from outline_rag_tpu.index import VectorIndex
    from outline_rag_tpu.models.reranker import init_reranker_params
    from outline_rag_tpu.models.tokenizer import HashTokenizer

    cfg, params = sparse_model
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    emb = EncoderEmbedder(params, cfg, tok, max_tokens=32, seq_buckets=(32,))
    rr_params = init_reranker_params(jax.random.key(2), cfg)
    rr = CrossEncoderReranker(rr_params, cfg, tok, max_tokens=64)

    idx = VectorIndex(dim=cfg.hidden, capacity=2048, token_width=32)
    # two chunks with IDENTICAL vectors but different text/tokens
    vec = np.zeros((1, cfg.hidden), np.float32)
    vec[0, 0] = 1.0
    texts = {"match": "wolves hunt in packs", "other": "completely different words"}
    for name, text in texts.items():
        tb = tok.batch([text], 32, buckets=(32,))
        # chunk lexical weights: uniform 1.0 on real tokens
        w = tb.attention_mask.astype(np.float32)
        idx.add_chunks(
            [name], vec.copy(), source_id=name,
            token_ids=tb.input_ids, token_mask=tb.attention_mask,
            token_weights=w,
        )

    fe = FusedEngine(emb, rr, idx, top_k=2, rerank_k=2, q_width=32, lex_weight=0.0)
    fe_lex = FusedEngine(emb, rr, idx, top_k=2, rerank_k=2, q_width=32, lex_weight=5.0)

    # retrieval stage check: dense scores tie -> with lexical weight, the
    # token-overlapping candidate gets the higher retrieval score
    import outline_rag_tpu.engine.fused as fused_mod
    import jax.numpy as jnp2

    tb = tok.batch(["wolves hunt in packs"], 32, buckets=(32,))
    state, row_ids, _ = idx._shard.snapshot()
    _, _, retr_vals, ridx, vals = fused_mod.fused_query(
        emb.params, rr.params,
        jnp2.asarray(tb.input_ids), jnp2.asarray(tb.attention_mask),
        state.vectors, state.scales, state.penalty,
        idx.tokens.state.ids, idx.tokens.state.mask, idx.tokens.state.weights,
        enc_cfg=cfg, rr_cfg=cfg, top_k=2, rerank_k=2, block_n=1024,
        lex_weight=5.0,
    )
    ridx = np.asarray(ridx)
    vals = np.asarray(vals)
    names = [str(row_ids[r]) for r in ridx[0]]
    assert names[0] == "match"
    assert vals[0, 0] > vals[0, 1]  # lexical overlap separated the tie
