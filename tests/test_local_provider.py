"""LocalChatProvider: on-TPU generation behind the provider seam.

With a tiny random decoder the text is gibberish — these tests pin the
*plumbing*: streaming deltas, termination, eos handling, and the full
SSE ask path falling back to the General chain when the local model's
classifier output is unparseable (fail-open contract)."""

import asyncio

import jax
import pytest

from outline_rag_tpu.models.decoder import DecoderConfig, init_decoder_params
from outline_rag_tpu.serve.llm import LocalChatProvider


class StubTok:
    """Reversible-enough tokenizer stub (no HF asset needed)."""

    eos_token_id = 0

    def encode(self, text: str):
        return [1 + (b % 250) for b in text.encode()][:120]

    def decode(self, ids):
        return "".join(chr(97 + (i % 26)) for i in ids)


@pytest.fixture(scope="module")
def provider():
    cfg = DecoderConfig.tiny()
    params = init_decoder_params(jax.random.key(0), cfg)
    return LocalChatProvider(
        params, cfg, StubTok(), chunk_tokens=8, max_new_tokens=24
    )


def test_stream_yields_and_terminates(provider):
    async def run():
        out = []
        async for delta in provider.stream(
            "local", [{"role": "user", "content": "hello"}],
            temperature=0.7, top_p=0.9,
        ):
            assert set(delta) == {"content", "thinking", "model"}
            out.append(delta["content"] or "")
        return "".join(out)

    text = asyncio.run(run())
    assert 0 < len(text) <= 24 * 4


def test_complete_returns_text(provider):
    text = asyncio.run(
        provider.complete(
            "local", [{"role": "user", "content": "classify this"}],
            temperature=0.0, max_tokens=12,
        )
    )
    assert isinstance(text, str)


def test_greedy_deterministic(provider):
    msgs = [{"role": "user", "content": "same prompt"}]

    async def once():
        return await provider.complete("local", msgs, temperature=0.0)

    a = asyncio.run(once())
    b = asyncio.run(once())
    assert a == b


def test_spec_provider_streams_and_is_deterministic():
    """spec_k>0 switches to the speculative loop: same streaming
    contract, greedy runs are repeatable, output length respected."""
    cfg = DecoderConfig.tiny()
    params = init_decoder_params(jax.random.key(0), cfg)
    prov = LocalChatProvider(
        params, cfg, StubTok(), chunk_tokens=4, max_new_tokens=20,
        spec_k=3, spec_gram=2,
    )
    msgs = [{"role": "user", "content": "repeat repeat repeat repeat"}]

    async def once(temp):
        out = []
        async for d in prov.stream("local", msgs, temperature=temp):
            out.append(d["content"] or "")
        return "".join(out)

    a = asyncio.run(once(0.0))
    b = asyncio.run(once(0.0))
    assert a == b and 0 < len(a) <= 20 * 4
    # sampled mode streams too
    assert isinstance(asyncio.run(once(0.9)), str)


def test_spec_with_batcher_streams():
    """spec_k + batch_slots: the batcher runs the speculative step
    (per-row counts); concurrent streams complete and text flows."""
    cfg = DecoderConfig.tiny()
    params = init_decoder_params(jax.random.key(0), cfg)
    prov = LocalChatProvider(
        params, cfg, StubTok(), chunk_tokens=4, max_new_tokens=12,
        spec_k=3, batch_slots=2,
    )
    try:
        assert prov._chunk_spec is None  # single-stream program unused
        assert prov._batcher is not None and prov._batcher.spec_k == 3

        async def one(i):
            out = []
            async for d in prov.stream(
                "local",
                [{"role": "user", "content": f"repeat repeat {i}"}],
                temperature=0.6 + 0.1 * i, top_p=0.9,
            ):
                out.append(d["content"] or "")
            return "".join(out)

        async def run():
            return await asyncio.gather(*[one(i) for i in range(3)])

        texts = asyncio.run(run())
        assert all(isinstance(t, str) and t for t in texts)
    finally:
        prov._batcher.close()


def test_ask_sse_with_local_provider():
    """Full serve path: classifier (gibberish -> General fallback),
    streamed answer, persistence — all on the local decoder."""
    import json

    from outline_rag_tpu.config import load_settings
    from outline_rag_tpu.models.hash_embedder import HashEmbedder
    from outline_rag_tpu.serve.app import build_app
    from outline_rag_tpu.serve.http import TestClient
    from outline_rag_tpu.storage import SqliteMetaStore

    cfg = DecoderConfig.tiny()
    params = init_decoder_params(jax.random.key(1), cfg)
    provider = LocalChatProvider(
        params, cfg, StubTok(), chunk_tokens=8, max_new_tokens=16
    )
    settings = load_settings(
        {"SECRET_KEY": "k", "VECTOR_DIM": "64", "DATA_DIR": ""}
    )
    app = build_app(
        settings,
        provider=provider,
        embedder=HashEmbedder(dim=64),
        meta=SqliteMetaStore(":memory:"),
        start_workers=False,
    )

    async def run():
        client = TestClient(app)
        await client.post(
            "/chat/login", body=b"name=local",
            headers={"content-type": "application/x-www-form-urlencoded"},
        )
        resp = await client.post(
            "/chat/api/conversations", json_body={"title": "local"}
        )
        conv = json.loads(resp.body)
        events = await client.sse(
            "POST", "/chat/api/ask",
            json_body={"conversation_id": conv["id"], "question": "hi there"},
        )
        content = "".join(
            e["choices"][0]["delta"].get("content") or ""
            for e in events
            if isinstance(e, dict) and e.get("choices")
        )
        assert content  # something streamed end-to-end
        msgs = json.loads(
            (await client.get(f"/chat/api/conversations/{conv['id']}/messages")).body
        )["messages"]
        assert msgs[-1]["role"] == "assistant" and msgs[-1]["content"]

    asyncio.run(run())


def test_sampling_params_do_not_recompile(provider):
    """temperature/top_p are traced scalars: distinct user-supplied
    pairs must reuse the one compiled chunk program — a static-arg
    recompile costs 20-70 s through the remote-TPU tunnel (ADVICE r2)."""
    msgs = [{"role": "user", "content": "vary the knobs"}]

    async def once(temp, tp):
        out = []
        async for d in provider.stream(
            "local", msgs, temperature=temp, top_p=tp
        ):
            out.append(d["content"] or "")
        return "".join(out)

    asyncio.run(once(0.31, 0.91))
    n_after_first = provider._chunk._cache_size()
    for temp, tp in [(0.7, 0.9), (1.13, 0.87), (0.0, 1.0)]:
        asyncio.run(once(temp, tp))
    assert provider._chunk._cache_size() == n_after_first == 1


def test_spec_sampling_params_do_not_recompile():
    cfg = DecoderConfig.tiny()
    params = init_decoder_params(jax.random.key(0), cfg)
    prov = LocalChatProvider(
        params, cfg, StubTok(), chunk_tokens=4, max_new_tokens=12,
        spec_k=2, spec_gram=2,
    )
    msgs = [{"role": "user", "content": "knob sweep again"}]

    async def once(temp, tp):
        async for _ in prov.stream("local", msgs, temperature=temp, top_p=tp):
            pass

    asyncio.run(once(0.42, 0.99))
    n = prov._chunk_spec._cache_size()
    asyncio.run(once(0.87, 0.55))
    asyncio.run(once(0.0, 1.0))
    assert prov._chunk_spec._cache_size() == n == 1


# -- pipelined chunk loop: bit-exactness vs the serial oracle -----------


def _serial_plain_text(prov, messages, temperature, top_p):
    """The pre-pipelining serial chunk loop as an oracle: fetch each
    chunk's tokens before dispatching the next. The lookahead loop in
    ``_generate_blocking`` changes only dispatch order, so it must
    produce the identical token stream."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from outline_rag_tpu.models.decoder import sample_token

    ids = prov._encode_prompt(prov._render(messages))
    t = len(ids)
    max_new = min(prov.max_new_tokens, prov.cfg.max_cache - t - 1)
    bucket = next(
        (b for b in prov.prompt_buckets if b >= t), prov.prompt_buckets[-1]
    )
    padded = ids + [0] * (bucket - t)
    cache = prov._init_cache()
    logits, cache = prov._prefill(
        prov.params, jnp.asarray([padded], jnp.int32), cache,
        jnp.zeros((1,), jnp.int32),
    )
    temp = jnp.float32(temperature or 0.0)
    tp = jnp.float32(top_p if top_p is not None else 1.0)
    key = jax.random.key(abs(hash(tuple(ids))) % (2**31))
    tok = sample_token(logits[:, t - 1, :], key, temp, tp)
    if int(tok[0]) == prov.eos_id:
        return ""
    out_ids = [int(tok[0])]
    pos = t
    while len(out_ids) < max_new:
        key, sub = jax.random.split(key)
        toks, cache, tok, _ = prov._chunk(
            prov.params, cache, tok, jnp.full((1,), pos, jnp.int32), sub,
            temperature=temp, top_p=tp,
        )
        pos += prov.chunk_tokens
        chunk = [int(x) for x in np.asarray(toks)[0]]
        stop = prov.eos_id in chunk
        if stop:
            chunk = chunk[: chunk.index(prov.eos_id)]
        room = max_new - len(out_ids)
        if len(chunk) >= room:
            chunk = chunk[:room]
            stop = True
        out_ids.extend(chunk)
        if stop:
            break
    return prov.tokenizer.decode(out_ids)


def _serial_spec_text(prov, messages, temperature, top_p):
    """Serial oracle for the speculative loop (``_generate_spec``)."""
    import jax.numpy as jnp
    import numpy as np

    import jax
    from outline_rag_tpu.models.decoder import _sample_one, key_at

    ids = prov._encode_prompt(prov._render(messages))
    t = len(ids)
    max_new = min(prov.max_new_tokens, prov.cfg.max_cache - t - 1)
    bucket = next(
        (b for b in prov.prompt_buckets if b >= t), prov.prompt_buckets[-1]
    )
    padded = ids + [0] * (bucket - t)
    cache = prov._init_cache()
    logits, cache = prov._prefill(
        prov.params, jnp.asarray([padded], jnp.int32), cache,
        jnp.zeros((1,), jnp.int32),
    )
    temp = jnp.float32(temperature or 0.0)
    tp = jnp.float32(top_p if top_p is not None else 1.0)
    key = jax.random.key(abs(hash(tuple(ids))) % (2**31))
    tok_buf = np.zeros((1, prov.cfg.max_cache), np.int32)
    tok_buf[0, :t] = ids
    tok_buf = jnp.asarray(tok_buf)
    tok = _sample_one(
        logits[0, t - 1].astype(jnp.float32), key_at(key, t), temp, tp
    )[None]
    if int(tok[0]) == prov.eos_id:
        return ""
    out_ids = [int(tok[0])]
    pos = jnp.full((1,), t, jnp.int32)
    while len(out_ids) < max_new:
        chunk_out, cnt, cache, tok_buf, tok, pos = prov._chunk_spec(
            prov.params, cache, tok_buf, tok, pos, key,
            temperature=temp, top_p=tp,
        )
        n = int(cnt[0])
        if n == 0:
            break
        chunk = [int(x) for x in np.asarray(chunk_out)[0, :n]]
        stop = prov.eos_id in chunk
        if stop:
            chunk = chunk[: chunk.index(prov.eos_id)]
        room = max_new - len(out_ids)
        if len(chunk) >= room:
            chunk = chunk[:room]
            stop = True
        out_ids.extend(chunk)
        if stop:
            break
    return prov.tokenizer.decode(out_ids)


def _stream_text(prov, messages, temperature, top_p):
    async def run():
        out = []
        async for d in prov.stream(
            "local", messages, temperature=temperature, top_p=top_p
        ):
            out.append(d["content"] or "")
        return "".join(out)

    return asyncio.run(run())


def test_pipelined_plain_loop_matches_serial_oracle():
    """Lookahead dispatch must not change emitted text — greedy and
    sampled, across a max_new that is not a chunk multiple (the room
    trim discards the speculative in-flight chunk)."""
    cfg = DecoderConfig.tiny()
    params = init_decoder_params(jax.random.key(7), cfg)
    prov = LocalChatProvider(
        params, cfg, StubTok(), chunk_tokens=4, max_new_tokens=10
    )
    for temp, tp in [(0.0, 1.0), (0.9, 0.8)]:
        for prompt in ["compare me", "a much longer prompt " * 6]:
            msgs = [{"role": "user", "content": prompt}]
            assert _stream_text(prov, msgs, temp, tp) == \
                _serial_plain_text(prov, msgs, temp, tp)


def test_pipelined_spec_loop_matches_serial_oracle():
    cfg = DecoderConfig.tiny()
    params = init_decoder_params(jax.random.key(7), cfg)
    prov = LocalChatProvider(
        params, cfg, StubTok(), chunk_tokens=3, max_new_tokens=11,
        spec_k=2, spec_gram=2,
    )
    for temp, tp in [(0.0, 1.0), (0.7, 0.9)]:
        msgs = [{"role": "user", "content": "repeat repeat repeat again"}]
        assert _stream_text(prov, msgs, temp, tp) == \
            _serial_spec_text(prov, msgs, temp, tp)


def test_prompt_bucket_ladder_reaches_max_cache():
    """Prompts longer than the largest configured bucket must still hit
    a bucketed prefill: the ladder is extended to max_cache (a negative
    pad count silently ran an UNBUCKETED width — one fresh remote
    compile per distinct long-prompt length)."""
    cfg = DecoderConfig.tiny()  # max_cache=64
    params = init_decoder_params(jax.random.key(0), cfg)
    prov = LocalChatProvider(
        params, cfg, StubTok(), chunk_tokens=4, max_new_tokens=8,
        prompt_buckets=(8, 16),
    )
    assert prov.prompt_buckets[-1] == cfg.max_cache

    async def run():
        out = []
        async for d in prov.stream(
            "local",
            [{"role": "user", "content": "x" * 50}],  # ~50 tokens > 16
            temperature=0.0,
        ):
            out.append(d["content"] or "")
        return "".join(out)

    assert isinstance(asyncio.run(run()), str)

    from outline_rag_tpu.serve.decode_batcher import DecodeBatcher
    from outline_rag_tpu.models.decoder import (
        cast_decoder_params,
        stack_decoder_params,
    )

    b = DecodeBatcher(
        stack_decoder_params(cast_decoder_params(params, cfg.dtype)),
        cfg, slots=1, chunk_tokens=2, eos_id=0, prompt_buckets=(8, 16),
    )
    try:
        assert b.prompt_buckets[-1] == cfg.max_cache
    finally:
        b.close()
