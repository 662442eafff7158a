"""Flash-attention kernel oracle tests (interpret mode on CPU).

Oracle = the encoder's einsum attention semantics: f32 logits, additive
key-padding bias, softmax over keys. The kernel must agree to float
tolerance for any S (block padding), any head_dim (lane padding), and
ragged masks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outline_rag_tpu.ops.attention import NEG_BIAS, flash_attention


def oracle(q, k, v, key_bias):
    d = q.shape[-1]
    logits = jnp.einsum(
        "bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits / jnp.sqrt(jnp.float32(d)) + key_bias[:, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bnqk,bknd->bqnd", probs, v)


def make_inputs(b, s, h, d, seed=0, ragged=True):
    key = jax.random.key(seed)
    kq, kk, kv, km = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, s, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, s, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, s, h, d), jnp.float32)
    if ragged:
        lengths = jax.random.randint(km, (b,), 1, s + 1)
    else:
        lengths = jnp.full((b,), s)
    mask = (jnp.arange(s)[None, :] < lengths[:, None]).astype(jnp.float32)
    bias = (1.0 - mask) * NEG_BIAS
    return q, k, v, bias, mask


@pytest.mark.parametrize(
    "b,s,h,d",
    [
        (2, 128, 4, 32),  # lane-padded head_dim
        (1, 200, 2, 64),  # odd S -> block padding
        (2, 256, 4, 128),  # exact lane width
    ],
)
def test_flash_matches_oracle(b, s, h, d):
    q, k, v, bias, mask = make_inputs(b, s, h, d)
    got = flash_attention(q, k, v, bias, interpret=True)
    want = oracle(q, k, v, bias)
    # compare only real-token query rows (padded queries are don't-care)
    m = np.asarray(mask)[:, :, None, None]
    np.testing.assert_allclose(
        np.asarray(got) * m, np.asarray(want) * m, atol=2e-5, rtol=2e-5
    )


def test_flash_fully_masked_row_is_finite():
    b, s, h, d = 1, 128, 2, 32
    q, k, v, _, _ = make_inputs(b, s, h, d, ragged=False)
    bias = jnp.full((b, s), NEG_BIAS, jnp.float32)  # no valid keys at all
    got = np.asarray(flash_attention(q, k, v, bias, interpret=True))
    assert np.isfinite(got).all()


def test_flash_custom_blocks():
    q, k, v, bias, mask = make_inputs(1, 384, 2, 64, seed=3)
    got = flash_attention(q, k, v, bias, block_q=128, block_k=128, interpret=True)
    want = oracle(q, k, v, bias)
    m = np.asarray(mask)[:, :, None, None]
    np.testing.assert_allclose(
        np.asarray(got) * m, np.asarray(want) * m, atol=2e-5, rtol=2e-5
    )


def test_long_document_embedder_buckets_and_slicing():
    """Whole-document mode: seq buckets extend past 512 and the token
    budget slices long-width batches into small device batches."""
    import dataclasses

    from outline_rag_tpu.engine.embedder import EncoderEmbedder
    from outline_rag_tpu.models.encoder import (
        EncoderConfig,
        init_encoder_params,
    )
    from outline_rag_tpu.models.tokenizer import HashTokenizer, buckets_for

    assert buckets_for(8192)[-1] == 8192
    assert buckets_for(100)[-1] == 64

    cfg = dataclasses.replace(EncoderConfig.tiny(), max_positions=1100)
    params = init_encoder_params(jax.random.key(0), cfg)
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    emb = EncoderEmbedder(
        params, cfg, tok, max_tokens=1024, max_batch_tokens=16 * 1024
    )
    assert emb.seq_buckets[-1] == 1024
    long_text = " ".join(f"word{i}" for i in range(900))
    texts = [f"{long_text} doc{j}" for j in range(10)]
    out = emb.embed(texts)  # width 1024 -> cap 8 -> two device batches
    assert out.shape == (10, cfg.hidden)
    single = emb.embed([texts[3]])
    np.testing.assert_allclose(out[3], single[0], atol=1e-5, rtol=1e-5)


def test_encoder_flash_impl_matches_einsum():
    from outline_rag_tpu.models.encoder import (
        EncoderConfig,
        encoder_forward,
        init_encoder_params,
    )
    import dataclasses

    cfg = EncoderConfig.tiny()
    params = init_encoder_params(jax.random.key(0), cfg)
    ids = jax.random.randint(jax.random.key(1), (2, 64), 3, cfg.vocab_size)
    mask = jnp.ones((2, 64), jnp.int32).at[1, 40:].set(0)
    base = encoder_forward(
        params, ids, mask, dataclasses.replace(cfg, attn_impl="einsum")
    )
    flash = encoder_forward(
        params, ids, mask, dataclasses.replace(cfg, attn_impl="flash")
    )
    m = np.asarray(mask)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(base) * m, np.asarray(flash) * m, atol=5e-5, rtol=5e-5
    )


def test_flash_masked_tile_skip_short_doc_in_long_bucket():
    """A short document padded into a long bucket leaves entire key
    tiles fully masked; the kernel skips them (live-tile early exit) and
    must still match the oracle exactly on the real rows, including when
    the FIRST tiles are the masked ones' complement (real keys at the
    start) and when the real span is tiny relative to the bucket."""
    b, s, h, d = 2, 512, 2, 64
    for real_len in (5, 130):  # far below one block and just past one
        q, k, v, _, _ = make_inputs(b, s, h, d, seed=7, ragged=False)
        mask = (jnp.arange(s)[None, :] < real_len).astype(jnp.float32)
        mask = jnp.broadcast_to(mask, (b, s))
        bias = (1.0 - mask) * NEG_BIAS
        got = flash_attention(
            q, k, v, bias, block_q=128, block_k=128, interpret=True
        )
        want = oracle(q, k, v, bias)
        m = np.asarray(mask)[:, :, None, None]
        np.testing.assert_allclose(
            np.asarray(got) * m, np.asarray(want) * m, atol=2e-5, rtol=2e-5
        )
