"""Decoder LM tests: HF parity, incremental-decode consistency, sampling."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outline_rag_tpu.models.decoder import (
    DecoderConfig,
    decoder_forward,
    generate_chunk,
    init_cache,
    init_decoder_params,
    sample_token,
    stack_decoder_params,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = DecoderConfig.tiny()
    params = stack_decoder_params(init_decoder_params(jax.random.key(0), cfg))
    return cfg, params


def test_prefill_matches_incremental(tiny):
    """Prefilling T tokens must give the same logits as feeding them one
    at a time through the KV cache — the correctness core of the cache."""
    cfg, params = tiny
    b, t = 2, 10
    toks = jax.random.randint(jax.random.key(1), (b, t), 0, cfg.vocab_size)

    cache = init_cache(cfg, b)
    full_logits, _ = decoder_forward(
        params, toks, cache, jnp.zeros((b,), jnp.int32), cfg
    )

    cache = init_cache(cfg, b)
    step_logits = []
    for i in range(t):
        lg, cache = decoder_forward(
            params, toks[:, i : i + 1], cache, jnp.full((b,), i, jnp.int32), cfg
        )
        step_logits.append(lg[:, 0])
    inc = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(full_logits), np.asarray(inc), atol=2e-4, rtol=2e-4
    )


def test_causality(tiny):
    """Changing a future token must not change past logits."""
    cfg, params = tiny
    toks = jax.random.randint(jax.random.key(2), (1, 8), 0, cfg.vocab_size)
    toks2 = toks.at[0, 6].set((toks[0, 6] + 1) % cfg.vocab_size)
    z = jnp.zeros((1,), jnp.int32)
    l1, _ = decoder_forward(params, toks, init_cache(cfg, 1), z, cfg)
    l2, _ = decoder_forward(params, toks2, init_cache(cfg, 1), z, cfg)
    np.testing.assert_allclose(
        np.asarray(l1[:, :6]), np.asarray(l2[:, :6]), atol=1e-5
    )
    assert not np.allclose(np.asarray(l1[:, 6:]), np.asarray(l2[:, 6:]))


def test_hf_llama_parity():
    """Tiny random HF LlamaForCausalLM -> converter -> our forward:
    logits must agree (GQA + RoPE + RMSNorm + SwiGLU all line up)."""
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    from outline_rag_tpu.models.convert import (
        decoder_config_from_hf,
        decoder_params_from_state_dict,
    )

    hf_cfg = LlamaConfig(
        vocab_size=211,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=96,
        max_position_embeddings=64,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval()
    cfg = dataclasses.replace(
        decoder_config_from_hf(hf_cfg), dtype=jnp.float32, max_cache=32
    )
    params = stack_decoder_params(
        decoder_params_from_state_dict(model.state_dict(), cfg)
    )

    toks = np.random.default_rng(0).integers(0, 211, size=(2, 12)).astype(np.int64)
    with torch.no_grad():
        want = model(torch.from_numpy(toks)).logits.numpy()
    got, _ = decoder_forward(
        params,
        jnp.asarray(toks, jnp.int32),
        init_cache(cfg, 2),
        jnp.zeros((2,), jnp.int32),
        cfg,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4, rtol=3e-4)


def test_sampling_modes():
    logits = jnp.asarray([[0.0, 5.0, 1.0, -2.0]], jnp.float32)
    key = jax.random.key(0)
    # greedy at temperature<=0
    assert int(sample_token(logits, key, 0.0, 0.9)[0]) == 1
    # tiny top_p keeps only the max
    for seed in range(5):
        t = sample_token(logits, jax.random.key(seed), 1.0, 1e-6)
        assert int(t[0]) == 1
    # top_p=1, high temperature: all tokens reachable
    seen = {
        int(sample_token(logits, jax.random.key(s), 50.0, 1.0)[0])
        for s in range(64)
    }
    assert len(seen) >= 3


def test_generate_chunk_stops_at_eos(tiny):
    cfg, params = tiny
    eos = 7
    cache = init_cache(cfg, 1)
    prompt = jax.random.randint(jax.random.key(3), (1, 4), 0, cfg.vocab_size)
    logits, cache = decoder_forward(
        params, prompt, cache, jnp.zeros((1,), jnp.int32), cfg
    )
    first = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    toks, cache, nxt, pos = generate_chunk(
        params, cache, first, jnp.full((1,), 4, jnp.int32), jax.random.key(4),
        cfg, n_steps=12, temperature=0.0, top_p=1.0, eos_id=eos,
    )
    toks = np.asarray(toks)[0]
    assert toks.shape == (12,)
    assert int(pos[0]) == 16
    if eos in toks:  # everything after the first eos is frozen eos
        i = list(toks).index(eos)
        assert all(t == eos for t in toks[i:])


def test_generation_greedy_matches_stepwise(tiny):
    """Chunked device-side generation == hand-rolled greedy loop."""
    cfg, params = tiny
    prompt = jax.random.randint(jax.random.key(5), (1, 3), 0, cfg.vocab_size)
    # hand loop
    cache = init_cache(cfg, 1)
    lg, cache = decoder_forward(
        params, prompt, cache, jnp.zeros((1,), jnp.int32), cfg
    )
    tok = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
    want = [int(tok[0])]
    pos = 3
    for _ in range(6):
        lg, cache = decoder_forward(
            params, tok[:, None], cache, jnp.full((1,), pos, jnp.int32), cfg
        )
        tok = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
        want.append(int(tok[0]))
        pos += 1
    # chunked
    cache = init_cache(cfg, 1)
    lg, cache = decoder_forward(
        params, prompt, cache, jnp.zeros((1,), jnp.int32), cfg
    )
    first = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
    toks, *_ = generate_chunk(
        params, cache, first, jnp.full((1,), 3, jnp.int32), jax.random.key(0),
        cfg, n_steps=6, temperature=0.0, top_p=1.0, eos_id=-1,
    )
    got = [int(first[0])] + [int(x) for x in np.asarray(toks)[0]]
    assert got == want


def test_hf_qwen2_parity():
    """Qwen2 exercises the attention-bias path of the converter."""
    torch = pytest.importorskip("torch")
    try:
        from transformers import Qwen2Config, Qwen2ForCausalLM
    except ImportError:
        pytest.skip("no Qwen2 in this transformers")

    from outline_rag_tpu.models.convert import (
        decoder_config_from_hf,
        decoder_params_from_state_dict,
    )

    hf_cfg = Qwen2Config(
        vocab_size=193,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=96,
        max_position_embeddings=64,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    model = Qwen2ForCausalLM(hf_cfg).eval()
    cfg = dataclasses.replace(
        decoder_config_from_hf(hf_cfg), dtype=jnp.float32, max_cache=32
    )
    assert cfg.attn_bias  # qwen2 -> qkv biases active
    params = stack_decoder_params(
        decoder_params_from_state_dict(model.state_dict(), cfg)
    )
    toks = np.random.default_rng(1).integers(0, 193, size=(2, 11)).astype(np.int64)
    with torch.no_grad():
        want = model(torch.from_numpy(toks)).logits.numpy()
    got, _ = decoder_forward(
        params,
        jnp.asarray(toks, jnp.int32),
        init_cache(cfg, 2),
        jnp.zeros((2,), jnp.int32),
        cfg,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4, rtol=3e-4)


def test_int8_weights_logit_parity(tiny):
    """int8-quantized weights (fused VMEM dequant path) must track the
    float forward closely: the candidate ranking that decode actually
    consumes has to survive quantization."""
    from outline_rag_tpu.models.decoder import quantize_decoder_params

    cfg, params = tiny
    qparams = quantize_decoder_params(params)
    b, t = 2, 9
    toks = jax.random.randint(jax.random.key(5), (b, t), 0, cfg.vocab_size)
    want, _ = decoder_forward(
        params, toks, init_cache(cfg, b), jnp.zeros((b,), jnp.int32), cfg
    )
    got, _ = decoder_forward(
        qparams, toks, init_cache(cfg, b), jnp.zeros((b,), jnp.int32), cfg
    )
    w = np.asarray(want)
    g = np.asarray(got)
    # per-position cosine similarity of the logit vectors
    cos = (w * g).sum(-1) / (
        np.linalg.norm(w, axis=-1) * np.linalg.norm(g, axis=-1)
    )
    assert cos.min() > 0.999, cos.min()
    # and the argmax (greedy next-token) agrees almost everywhere
    agree = (w.argmax(-1) == g.argmax(-1)).mean()
    assert agree >= 0.9, agree


def test_int8_weights_generation_runs(tiny):
    """Chunked generation with int8 weights: same device-side protocol,
    finite logits, positions advance."""
    from outline_rag_tpu.models.decoder import quantize_decoder_params

    cfg, params = tiny
    qparams = quantize_decoder_params(params)
    prompt = jnp.asarray([[5, 9, 13, 2]], jnp.int32)
    cache = init_cache(cfg, 1)
    logits, cache = decoder_forward(
        qparams, prompt, cache, jnp.zeros((1,), jnp.int32), cfg
    )
    assert np.isfinite(np.asarray(logits)).all()
    first = sample_token(
        logits[:, -1, :], jax.random.key(0), 0.0, 1.0
    )
    toks, cache, nxt, pos = generate_chunk(
        qparams, cache, first, jnp.full((1,), 4, jnp.int32),
        jax.random.key(1), cfg, n_steps=6, temperature=0.0, top_p=1.0,
        eos_id=0,
    )
    assert toks.shape == (1, 6)
    assert int(pos[0]) == 10


def test_int8_provider_stream(tiny):
    """LocalChatProvider(int8_weights=True) streams text end-to-end."""
    import asyncio

    from outline_rag_tpu.serve.llm import LocalChatProvider

    cfg, params = tiny

    class StubTok:
        eos_token_id = 0

        def encode(self, text):
            return [1 + (b % 250) for b in text.encode()][:40]

        def decode(self, ids):
            return "".join(chr(97 + (i % 26)) for i in ids)

    prov = LocalChatProvider(
        params, cfg, StubTok(), chunk_tokens=4, max_new_tokens=8,
        int8_weights=True,
    )

    async def run():
        out = []
        async for d in prov.stream(
            "m", [{"role": "user", "content": "hello"}], temperature=0.0
        ):
            out.append(d["content"])
        return "".join(out)

    text = asyncio.run(run())
    assert isinstance(text, str)


def test_int8_large_m_prefill_parity(tiny):
    """w8a8 now serves large-M prefill too (M > 256 previously fell back
    to weight-dequant + bf16 matmul): the int8 MXU path at prompt-bucket
    shapes must track the float forward as closely as the decode-step
    shapes do."""
    from outline_rag_tpu.models.decoder import quantize_decoder_params

    cfg, params = tiny
    qparams = quantize_decoder_params(params)
    b, t = 32, 12  # M = 384 per projection call: the former fallback regime
    toks = jax.random.randint(jax.random.key(11), (b, t), 0, cfg.vocab_size)
    want, _ = decoder_forward(
        params, toks, init_cache(cfg, b), jnp.zeros((b,), jnp.int32), cfg
    )
    got, _ = decoder_forward(
        qparams, toks, init_cache(cfg, b), jnp.zeros((b,), jnp.int32), cfg
    )
    w, g = np.asarray(want), np.asarray(got)
    cos = (w * g).sum(-1) / (
        np.linalg.norm(w, axis=-1) * np.linalg.norm(g, axis=-1)
    )
    assert cos.min() > 0.999, cos.min()


def test_int8_prefill_chunking_independent(tiny):
    """Per-row activation scales make w8a8 prefill chunk-boundary-
    independent: a prompt prefilled in chunks must agree with the whole-
    prompt prefill (the paged prefix-cache exactness contract relies on
    per-position math not depending on neighbors in the same dispatch)."""
    from outline_rag_tpu.models.decoder import quantize_decoder_params

    cfg, params = tiny
    qparams = quantize_decoder_params(params)
    t = 12
    toks = jax.random.randint(jax.random.key(13), (1, t), 0, cfg.vocab_size)
    whole, _ = decoder_forward(
        qparams, toks, init_cache(cfg, 1), jnp.zeros((1,), jnp.int32), cfg
    )
    cache = init_cache(cfg, 1)
    parts = []
    for start in range(0, t, 4):
        lg, cache = decoder_forward(
            qparams, toks[:, start : start + 4], cache,
            jnp.full((1,), start, jnp.int32), cfg,
        )
        parts.append(lg)
    chunked = jnp.concatenate(parts, axis=1)
    np.testing.assert_allclose(
        np.asarray(whole), np.asarray(chunked), atol=2e-4, rtol=2e-4
    )
