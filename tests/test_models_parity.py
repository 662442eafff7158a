"""Encoder/reranker parity vs the HF torch implementation.

A tiny randomly-initialized XLM-RoBERTa is instantiated in transformers
(torch CPU), its state_dict converted via models/convert.py, and outputs
compared — the offline equivalent of SURVEY.md section 7 step 3's
"embedding parity vs reference API outputs (cosine > 0.999)".
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from outline_rag_tpu.models.convert import config_from_hf, params_from_state_dict
from outline_rag_tpu.models.encoder import encoder_forward, pooled_embeddings
from outline_rag_tpu.models.reranker import reranker_forward


def _tiny_hf_config():
    return transformers.XLMRobertaConfig(
        vocab_size=512,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=80,
        type_vocab_size=1,
        pad_token_id=1,
        layer_norm_eps=1e-5,
    )


def _random_inputs(rng, batch=3, seq=18, vocab=512, pad_id=1):
    lengths = rng.integers(5, seq, size=batch)
    ids = np.full((batch, seq), pad_id, np.int32)
    mask = np.zeros((batch, seq), np.int32)
    for i, L in enumerate(lengths):
        ids[i, :L] = rng.integers(3, vocab, size=L)
        ids[i, 0] = 0
        mask[i, :L] = 1
    return ids, mask


@pytest.fixture(scope="module")
def rng_np():
    return np.random.default_rng(123)


def test_encoder_parity(rng_np):
    torch.manual_seed(0)
    hf_cfg = _tiny_hf_config()
    model = transformers.XLMRobertaModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = config_from_hf(hf_cfg)
    cfg = cfg.__class__(**{**cfg.__dict__, "dtype": jnp.float32})
    params = params_from_state_dict(model.state_dict(), cfg)

    ids, mask = _random_inputs(rng_np, vocab=hf_cfg.vocab_size)
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state.numpy()
    ours = np.asarray(
        encoder_forward(params, jnp.asarray(ids), jnp.asarray(mask), cfg)
    )
    # compare only non-pad positions (HF computes garbage on pads too but
    # they are masked out downstream)
    m = mask.astype(bool)
    np.testing.assert_allclose(ours[m], ref[m], rtol=2e-4, atol=2e-4)


def test_pooled_embedding_normalized(rng_np):
    torch.manual_seed(1)
    hf_cfg = _tiny_hf_config()
    model = transformers.XLMRobertaModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = config_from_hf(hf_cfg)
    cfg = cfg.__class__(**{**cfg.__dict__, "dtype": jnp.float32})
    params = params_from_state_dict(model.state_dict(), cfg)
    ids, mask = _random_inputs(rng_np, vocab=hf_cfg.vocab_size)
    emb = np.asarray(pooled_embeddings(params, jnp.asarray(ids), jnp.asarray(mask), cfg))
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)
    with torch.no_grad():
        ref_cls = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state[:, 0, :].numpy()
    ref_emb = ref_cls / np.linalg.norm(ref_cls, axis=1, keepdims=True)
    cos = np.sum(emb * ref_emb, axis=1)
    assert np.all(cos > 0.999)


def test_reranker_parity(rng_np):
    torch.manual_seed(2)
    hf_cfg = _tiny_hf_config()
    hf_cfg.num_labels = 1
    model = transformers.XLMRobertaForSequenceClassification(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    cfg = cfg.__class__(**{**cfg.__dict__, "dtype": jnp.float32})
    params = params_from_state_dict(model.state_dict(), cfg)
    assert "classifier" in params

    ids, mask = _random_inputs(rng_np, vocab=hf_cfg.vocab_size)
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).logits[:, 0].numpy()
    ours = np.asarray(
        reranker_forward(params, jnp.asarray(ids), jnp.asarray(mask), cfg)
    )
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_bf16_close_to_f32(rng_np):
    torch.manual_seed(3)
    hf_cfg = _tiny_hf_config()
    model = transformers.XLMRobertaModel(hf_cfg, add_pooling_layer=False).eval()
    cfg32 = config_from_hf(hf_cfg)
    cfg32 = cfg32.__class__(**{**cfg32.__dict__, "dtype": jnp.float32})
    cfg16 = cfg32.__class__(**{**cfg32.__dict__, "dtype": jnp.bfloat16})
    params = params_from_state_dict(model.state_dict(), cfg32)
    ids, mask = _random_inputs(rng_np, vocab=hf_cfg.vocab_size)
    e32 = np.asarray(pooled_embeddings(params, jnp.asarray(ids), jnp.asarray(mask), cfg32))
    e16 = np.asarray(pooled_embeddings(params, jnp.asarray(ids), jnp.asarray(mask), cfg16))
    cos = np.sum(e32 * e16, axis=1)
    assert np.all(cos > 0.99)


def test_scan_forward_matches_loop(rng_np):
    from outline_rag_tpu.models.encoder import stack_layer_params

    torch.manual_seed(4)
    hf_cfg = _tiny_hf_config()
    model = transformers.XLMRobertaModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = config_from_hf(hf_cfg)
    cfg = cfg.__class__(**{**cfg.__dict__, "dtype": jnp.float32})
    params = params_from_state_dict(model.state_dict(), cfg)
    stacked = stack_layer_params(params)
    ids, mask = _random_inputs(rng_np, vocab=hf_cfg.vocab_size)
    loop_out = np.asarray(encoder_forward(params, jnp.asarray(ids), jnp.asarray(mask), cfg))
    scan_out = np.asarray(encoder_forward(stacked, jnp.asarray(ids), jnp.asarray(mask), cfg))
    np.testing.assert_allclose(scan_out, loop_out, rtol=1e-5, atol=1e-5)
