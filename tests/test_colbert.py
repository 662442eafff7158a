"""BGE-m3 multi-vector (ColBERT) head + late-interaction tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from outline_rag_tpu.models.encoder import (
    EncoderConfig,
    colbert_token_vectors,
    init_colbert_head,
    init_encoder_params,
    late_interaction_scores,
)


@pytest.fixture(scope="module")
def colbert_model():
    cfg = EncoderConfig.tiny()
    params = init_encoder_params(jax.random.key(0), cfg)
    params["colbert"] = init_colbert_head(jax.random.key(1), cfg)
    return cfg, params


def test_colbert_vectors_masked_and_normalized(colbert_model):
    cfg, params = colbert_model
    rng = np.random.default_rng(0)
    b, s = 2, 12
    ids = rng.integers(3, cfg.vocab_size, size=(b, s)).astype(np.int32)
    ids[:, 0] = 0  # CLS
    mask = np.ones((b, s), np.int32)
    mask[0, 8:] = 0
    v = np.asarray(
        colbert_token_vectors(params, jnp.asarray(ids), jnp.asarray(mask), cfg)
    )
    assert v.shape == (b, s, cfg.hidden)
    norms = np.linalg.norm(v, axis=-1)
    assert np.allclose(norms[:, 0], 0.0)  # CLS dropped
    assert np.allclose(norms[0, 8:], 0.0)  # padding dropped
    np.testing.assert_allclose(norms[1, 1:], 1.0, atol=1e-5)  # unit tokens


def test_late_interaction_oracle():
    """MaxSim vs an explicit numpy loop."""
    rng = np.random.default_rng(1)
    b, tq, k, tc, h = 2, 5, 3, 7, 16
    q = rng.standard_normal((b, tq, h)).astype(np.float32)
    c = rng.standard_normal((b, k, tc, h)).astype(np.float32)
    q_mask = np.ones((b, tq), np.int32)
    q_mask[1, 3:] = 0
    q[1, 3:] = 0.0  # zeroed like the head output
    q[:, 0] = 0.0  # CLS slot zeroed

    got = np.asarray(
        late_interaction_scores(jnp.asarray(q), jnp.asarray(q_mask), jnp.asarray(c))
    )
    want = np.zeros((b, k), np.float32)
    for bi in range(b):
        valid = [i for i in range(1, tq) if q_mask[bi, i]]
        for ki in range(k):
            tot = 0.0
            for i in valid:
                tot += max(float(q[bi, i] @ c[bi, ki, j]) for j in range(tc))
            want[bi, ki] = tot / len(valid)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_late_interaction_identical_tokens_win():
    """A candidate sharing the query's exact token vectors scores 1.0
    (cosine-perfect MaxSim); an orthogonal candidate scores 0."""
    h = 8
    e = np.eye(h, dtype=np.float32)
    q = np.zeros((1, 3, h), np.float32)
    q[0, 1] = e[0]
    q[0, 2] = e[1]
    c = np.zeros((1, 2, 4, h), np.float32)
    c[0, 0, 0] = e[0]
    c[0, 0, 1] = e[1]
    c[0, 1, 0] = e[5]  # orthogonal to both query tokens
    q_mask = np.asarray([[1, 1, 1]], np.int32)
    got = np.asarray(
        late_interaction_scores(jnp.asarray(q), jnp.asarray(q_mask), jnp.asarray(c))
    )
    np.testing.assert_allclose(got, [[1.0, 0.0]], atol=1e-6)


def test_fused_colbert_rescoring(colbert_model):
    """Identical dense vectors; ColBERT late interaction must rank the
    candidate whose tokens match the query above the unrelated one."""
    from outline_rag_tpu.engine.embedder import EncoderEmbedder
    from outline_rag_tpu.engine.rerank import CrossEncoderReranker
    from outline_rag_tpu.index import VectorIndex
    from outline_rag_tpu.models.reranker import init_reranker_params
    from outline_rag_tpu.models.tokenizer import HashTokenizer
    import outline_rag_tpu.engine.fused as fused_mod

    cfg, params = colbert_model
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    emb = EncoderEmbedder(params, cfg, tok, max_tokens=32, seq_buckets=(32,))
    rr_params = init_reranker_params(jax.random.key(2), cfg)
    rr = CrossEncoderReranker(rr_params, cfg, tok, max_tokens=64)

    idx = VectorIndex(dim=cfg.hidden, capacity=2048, token_width=32)
    vec = np.zeros((1, cfg.hidden), np.float32)
    vec[0, 0] = 1.0
    texts = {"match": "wolves hunt in packs", "other": "completely different words"}
    for name, text in texts.items():
        tb = tok.batch([text], 32, buckets=(32,))
        idx.add_chunks(
            [name], vec.copy(), source_id=name,
            token_ids=tb.input_ids, token_mask=tb.attention_mask,
        )

    tb = tok.batch(["wolves hunt in packs"], 32, buckets=(32,))
    state, row_ids, _ = idx._shard.snapshot()

    def run(w):
        _, _, _, ridx, vals = fused_mod.fused_query(
            emb.params, rr.params,
            jnp.asarray(tb.input_ids), jnp.asarray(tb.attention_mask),
            state.vectors, state.scales, state.penalty,
            idx.tokens.state.ids, idx.tokens.state.mask,
            idx.tokens.state.weights,
            enc_cfg=cfg, rr_cfg=cfg, top_k=2, rerank_k=2, block_n=1024,
            colbert_weight=w,
        )
        return np.asarray(ridx), np.asarray(vals)

    ridx0, vals0 = run(0.0)
    np.testing.assert_allclose(vals0[0, 0], vals0[0, 1], atol=1e-5)  # dense tie

    ridx, vals = run(2.0)
    names = [str(row_ids[r]) for r in ridx[0]]
    assert names[0] == "match"
    assert vals[0, 0] > vals[0, 1]  # late interaction separated the tie
