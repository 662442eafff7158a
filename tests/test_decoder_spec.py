"""Speculative decoding (prompt-lookup n-gram drafts) tests.

The correctness contract: the speculative path consumes the same
position-folded sampler keys as a plain positional-key decode loop and
only ever emits the model's own samples, so its output is BIT-EXACT
equal to plain decoding — at any temperature, whatever the drafts were.
Accepted drafts only change how many forwards that output costs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outline_rag_tpu.models.decoder import (
    DecoderConfig,
    _sample_one,
    decoder_forward,
    generate_chunk_spec,
    init_cache,
    init_decoder_params,
    key_at,
    propose_ngram,
    stack_decoder_params,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = DecoderConfig.tiny()
    params = stack_decoder_params(init_decoder_params(jax.random.key(0), cfg))
    return cfg, params


def _solo_positional(params, cfg, prompt, n_new, key, temperature, top_p,
                     eos_id):
    """Plain decode with the positional-key convention (the oracle)."""
    t = len(prompt)
    cache = init_cache(cfg, 1)
    lg, cache = decoder_forward(
        params, jnp.asarray([prompt], jnp.int32), cache,
        jnp.zeros((1,), jnp.int32), cfg,
    )
    tok = _sample_one(
        lg[0, t - 1].astype(jnp.float32), key_at(key, t),
        jnp.float32(temperature), jnp.float32(top_p),
    )
    out = [int(tok)]
    pos = t
    while len(out) < n_new and out[-1] != eos_id:
        lg, cache = decoder_forward(
            params, tok[None, None], cache,
            jnp.full((1,), pos, jnp.int32), cfg,
        )
        tok = _sample_one(
            lg[0, -1].astype(jnp.float32), key_at(key, pos + 1),
            jnp.float32(temperature), jnp.float32(top_p),
        )
        out.append(int(tok))
        pos += 1
    return out


def _spec_run(params, cfg, prompt, n_new, key, temperature, top_p, eos_id,
              draft_k=3, gram=2, n_steps=8):
    t = len(prompt)
    cache = init_cache(cfg, 1)
    buf = np.zeros((1, cfg.max_cache), np.int32)
    buf[0, :t] = prompt
    buf = jnp.asarray(buf)
    lg, cache = decoder_forward(
        params, jnp.asarray([prompt], jnp.int32), cache,
        jnp.zeros((1,), jnp.int32), cfg,
    )
    tok = _sample_one(
        lg[0, t - 1].astype(jnp.float32), key_at(key, t),
        jnp.float32(temperature), jnp.float32(top_p),
    )[None]
    out = [int(tok[0])]
    pos = jnp.full((1,), t, jnp.int32)
    steps_used = 0
    while len(out) < n_new and out[-1] != eos_id:
        emitted, cnt, cache, buf, tok, pos = generate_chunk_spec(
            params, cache, buf, tok, pos, key, cfg,
            n_steps=n_steps, draft_k=draft_k, gram=gram,
            temperature=temperature, top_p=top_p, eos_id=eos_id,
        )
        n = int(cnt[0])
        if n == 0:
            break
        out.extend(int(x) for x in np.asarray(emitted)[0, :n])
        steps_used += n_steps
        if eos_id in out:
            out = out[: out.index(eos_id) + 1]
            break
    return out[:n_new], steps_used


def test_spec_greedy_bit_exact(tiny):
    cfg, params = tiny
    prompt = [5, 9, 13, 5, 9, 13, 5, 9]  # repetitive -> drafts fire
    key = jax.random.key(7)
    want = _solo_positional(params, cfg, prompt, 20, key, 0.0, 1.0, -1)
    got, _ = _spec_run(params, cfg, prompt, 20, key, 0.0, 1.0, -1)
    assert got == want[: len(got)] and len(got) == 20


def test_spec_sampled_bit_exact(tiny):
    """temperature > 0: same positional keys -> identical tokens."""
    cfg, params = tiny
    prompt = [3, 17, 4, 3, 17, 4, 3]
    key = jax.random.key(11)
    want = _solo_positional(params, cfg, prompt, 18, key, 0.8, 0.95, -1)
    got, _ = _spec_run(params, cfg, prompt, 18, key, 0.8, 0.95, -1)
    assert got == want[: len(got)] and len(got) == 18


def test_spec_acceptance_speedup():
    """A constant-output model + matching prompt: every draft accepted,
    so each verify step advances draft_k+1 tokens (the whole point)."""
    cfg = DecoderConfig.tiny()
    params = stack_decoder_params(
        init_decoder_params(jax.random.key(0), cfg)
    )
    # zero lm_head -> uniform logits -> greedy always emits token 0
    params = dict(params)
    params["lm_head"] = jnp.zeros_like(params["lm_head"])
    prompt = [7] + [0] * 10  # the zeros region feeds perfect drafts
    key = jax.random.key(0)
    got, steps = _spec_run(
        params, cfg, prompt, 16, key, 0.0, 1.0, -1,
        draft_k=3, gram=2, n_steps=4,
    )
    assert got == [0] * 16
    # 1 (caller) + 4 steps x 4 tokens = 17 >= 16 in ONE chunk of 4 steps
    assert steps == 4


def test_spec_eos_inside_accepted_run():
    """eos emitted mid-window truncates the run and freezes the row."""
    cfg = DecoderConfig.tiny()
    params = stack_decoder_params(
        init_decoder_params(jax.random.key(0), cfg)
    )
    params = dict(params)
    params["lm_head"] = jnp.zeros_like(params["lm_head"])  # emits 0s
    prompt = [7] + [0] * 10
    got, _ = _spec_run(
        params, cfg, prompt, 16, key := jax.random.key(0), 0.0, 1.0,
        eos_id=0, draft_k=3, gram=2, n_steps=4,
    )
    assert got == [0]  # first emitted token IS eos -> stop


def test_spec_capacity_guard(tiny):
    """pos can never overrun the KV ring: chunks stop emitting instead."""
    cfg, params = tiny  # max_cache = 64
    prompt = list(range(3, 40))
    got, _ = _spec_run(
        params, cfg, prompt, 64, jax.random.key(3), 0.0, 1.0, -1,
        draft_k=3, gram=2, n_steps=16,
    )
    # 64-slot ring, 37-token prompt: at most ~27 new tokens fit
    assert 0 < len(got) <= 64 - len(prompt)
    want = _solo_positional(
        params, cfg, prompt, len(got), jax.random.key(3), 0.0, 1.0, -1
    )
    assert got == want


def test_propose_ngram_finds_latest_match():
    buf = jnp.asarray(
        [[1, 2, 9, 9, 1, 2, 7, 7, 1, 2, 0, 0, 0, 0, 0, 0]], jnp.int32
    )
    # current suffix (gram=2) at pos 9 is [1, 2]; latest earlier match
    # starts at j=4 -> drafts = tokens after it: [7, 7, 1]
    drafts = propose_ngram(buf, jnp.asarray([9], jnp.int32), gram=2, k=3)
    assert np.asarray(drafts)[0].tolist() == [7, 7, 1]


def test_spec_batched_rows_diverge(tiny):
    """Rows accept different numbers of drafts yet each stays bit-exact
    vs its own solo decode (per-row positions, keys, cursors)."""
    cfg, params = tiny
    prompts = [[5, 9, 13, 5, 9, 13, 5, 9], [2, 11, 3, 4, 8, 1, 6, 10]]
    key = jax.random.key(21)
    solo = [
        _solo_positional(params, cfg, p, 12, key, 0.7, 0.9, -1)
        for p in prompts
    ]
    t = len(prompts[0])
    cache = init_cache(cfg, 2)
    buf = np.zeros((2, cfg.max_cache), np.int32)
    for i, p in enumerate(prompts):
        buf[i, : len(p)] = p
    lg, cache = decoder_forward(
        params, jnp.asarray(prompts, jnp.int32), cache,
        jnp.zeros((2,), jnp.int32), cfg,
    )
    tok = jnp.stack([
        _sample_one(lg[i, t - 1].astype(jnp.float32), key_at(key, t),
                    jnp.float32(0.7), jnp.float32(0.9))
        for i in range(2)
    ])
    outs = [[int(tok[0])], [int(tok[1])]]
    pos = jnp.full((2,), t, jnp.int32)
    emitted, cnt, *_ = generate_chunk_spec(
        params, cache, jnp.asarray(buf), tok, pos, key, cfg,
        n_steps=11, draft_k=3, gram=2,
        temperature=0.7, top_p=0.9, eos_id=-1,
    )
    for i in range(2):
        outs[i].extend(int(x) for x in np.asarray(emitted)[i, : int(cnt[i])])
        assert outs[i][:12] == solo[i][: min(12, len(outs[i]))]
