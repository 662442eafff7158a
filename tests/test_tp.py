"""Tensor-parallel decoder: sharded forward must equal single-device.

Runs on the virtual CPU mesh (conftest forces 8 devices); a 2-device
submesh matches the tiny config's kv_heads=2.
"""

import jax
import jax.numpy as jnp
import numpy as np

from outline_rag_tpu.models.decoder import (
    DecoderConfig,
    decoder_forward,
    generate_chunk,
    init_cache,
    init_decoder_params,
    stack_decoder_params,
)
from outline_rag_tpu.parallel.tp import (
    model_mesh,
    shard_decoder_cache,
    shard_decoder_params,
)


def test_tp_forward_matches_single_device():
    cfg = DecoderConfig.tiny()  # heads 4, kv 2 -> 2-way TP
    params = stack_decoder_params(init_decoder_params(jax.random.key(0), cfg))
    toks = jax.random.randint(jax.random.key(1), (2, 9), 0, cfg.vocab_size)
    start = jnp.zeros((2,), jnp.int32)

    ref_logits, ref_cache = decoder_forward(
        params, toks, init_cache(cfg, 2), start, cfg
    )

    mesh = model_mesh(2)
    p_tp = shard_decoder_params(params, mesh)
    cache_tp = shard_decoder_cache(init_cache(cfg, 2), mesh)
    fwd = jax.jit(lambda p, t, c, s: decoder_forward(p, t, c, s, cfg))
    tp_logits, tp_cache = fwd(p_tp, toks, cache_tp, start)

    np.testing.assert_allclose(
        np.asarray(tp_logits), np.asarray(ref_logits), atol=2e-4, rtol=2e-4
    )
    # the sharded KV ring holds the same values
    np.testing.assert_allclose(
        np.asarray(tp_cache[0]), np.asarray(ref_cache[0]), atol=2e-4, rtol=2e-4
    )
    # and the collective-inserted program actually sharded the big params
    leaf = p_tp["layers"]["wq"]
    assert len(leaf.sharding.device_set) == 2


def test_tp_generation_matches_single_device():
    """Greedy chunked generation end-to-end under TP == single device."""
    cfg = DecoderConfig.tiny()
    params = stack_decoder_params(init_decoder_params(jax.random.key(0), cfg))
    prompt = jax.random.randint(jax.random.key(2), (1, 5), 0, cfg.vocab_size)

    def run(p, cache):
        lg, cache = decoder_forward(
            p, prompt, cache, jnp.zeros((1,), jnp.int32), cfg
        )
        first = jnp.argmax(lg[:, 4], axis=-1).astype(jnp.int32)
        toks, *_ = generate_chunk(
            p, cache, first, jnp.full((1,), 5, jnp.int32), jax.random.key(0),
            cfg, n_steps=8, temperature=0.0, top_p=1.0, eos_id=-1,
        )
        return [int(first[0])] + [int(x) for x in np.asarray(toks)[0]]

    want = run(params, init_cache(cfg, 1))
    mesh = model_mesh(2)
    got = run(
        shard_decoder_params(params, mesh),
        shard_decoder_cache(init_cache(cfg, 1), mesh),
    )
    assert got == want


def test_tp_provider_serving_matches_unsharded():
    """LocalChatProvider(tp_devices=2): Megatron-sharded decode through
    the continuous batcher equals the unsharded provider token-for-token
    (greedy). The forward is untouched — GSPMD partitions the jitted
    step programs from the param shardings alone."""
    import asyncio

    from outline_rag_tpu.models.decoder import (
        DecoderConfig,
        init_decoder_params,
    )
    from outline_rag_tpu.serve.llm import LocalChatProvider

    cfg = DecoderConfig.tiny()  # heads=4, kv_heads=2: divisible by 2
    params = init_decoder_params(jax.random.key(0), cfg)

    class Tok:
        eos_token_id = 0

        def encode(self, text):
            return [1 + (b % 250) for b in text.encode()][:40]

        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    def complete(prov, text):
        return asyncio.run(
            prov.complete(
                "m", [{"role": "user", "content": text}], temperature=0.0
            )
        )

    plain = LocalChatProvider(
        params, cfg, Tok(), chunk_tokens=4, max_new_tokens=10
    )
    tp = LocalChatProvider(
        params, cfg, Tok(), chunk_tokens=4, max_new_tokens=10,
        tp_devices=2, batch_slots=2,
    )
    try:
        for text in ("hello tensor parallel", "second stream"):
            assert complete(tp, text) == complete(plain, text)
    finally:
        if tp._batcher is not None:
            tp._batcher.close()


def test_tp_provider_rejects_bad_configs(monkeypatch):
    import pytest

    from outline_rag_tpu.models import decoder as decoder_mod
    from outline_rag_tpu.models.decoder import (
        DecoderConfig,
        init_decoder_params,
    )
    from outline_rag_tpu.serve.llm import LocalChatProvider

    cfg = DecoderConfig.tiny()
    params = init_decoder_params(jax.random.key(1), cfg)

    class Tok:
        eos_token_id = 0
        encode = staticmethod(lambda t: [1, 2, 3])
        decode = staticmethod(lambda ids: "x")

    with pytest.raises(ValueError, match="divisible"):
        LocalChatProvider(params, cfg, Tok(), tp_devices=3)
    # int8+TP is only lowered for the pure-XLA w8a8 strategy; the
    # in-VMEM dequant kernel is a single-device program
    monkeypatch.setattr(decoder_mod, "_INT8_MODE", "kernel")
    with pytest.raises(ValueError, match="w8a8"):
        LocalChatProvider(params, cfg, Tok(), tp_devices=2, int8_weights=True)


def test_tp_spec_batcher_matches_unsharded():
    """Speculation composes with TP: GSPMD partitions the spec step
    program too; greedy output equals the unsharded spec batcher."""
    from outline_rag_tpu.models.decoder import (
        DecoderConfig,
        init_decoder_params,
        stack_decoder_params,
    )
    from outline_rag_tpu.parallel.tp import model_mesh, shard_decoder_params
    from outline_rag_tpu.serve.decode_batcher import DONE, DecodeBatcher

    cfg = DecoderConfig.tiny()
    params = stack_decoder_params(init_decoder_params(jax.random.key(3), cfg))

    def collect(q):
        out = []
        while True:
            item = q.get(timeout=60)
            if item is DONE:
                return out
            if isinstance(item, Exception):
                raise item
            out.extend(item)

    def run(mesh, p):
        b = DecodeBatcher(
            p, cfg, slots=2, chunk_tokens=4, eos_id=0,
            spec_k=2, spec_gram=2, mesh=mesh,
        )
        try:
            return collect(b.submit([5, 9, 13, 5, 9, 13], 0.0, 1.0, 10))
        finally:
            b.close()

    mesh = model_mesh(2)
    want = run(None, params)
    got = run(mesh, shard_decoder_params(params, mesh))
    assert got == want, (got, want)


def _collect(q):
    from outline_rag_tpu.serve.decode_batcher import DONE

    out = []
    while True:
        item = q.get(timeout=120)
        if item is DONE:
            return out
        if isinstance(item, Exception):
            raise item
        out.extend(item)


def _run_batcher(params, cfg, mesh, prompts, **kw):
    from outline_rag_tpu.serve.decode_batcher import DecodeBatcher

    b = DecodeBatcher(
        params, cfg, slots=2, chunk_tokens=4, eos_id=0, mesh=mesh, **kw
    )
    try:
        qs = [b.submit(p, 0.0, 1.0, 8, seed=7 + i) for i, p in enumerate(prompts)]
        return [_collect(q) for q in qs]
    finally:
        b.close()


def test_tp_paged_batcher_matches_unsharded():
    """TP x paged KV: the page-walk attention runs per-device under
    shard_map on the KvH slice; greedy tokens equal the single-device
    paged batcher (and the pool actually shards)."""
    from outline_rag_tpu.models.decoder import (
        DecoderConfig,
        init_decoder_params,
        stack_decoder_params,
    )
    from outline_rag_tpu.parallel.tp import model_mesh, shard_decoder_params

    cfg = DecoderConfig.tiny()
    params = stack_decoder_params(init_decoder_params(jax.random.key(3), cfg))
    prompts = [[5, 9, 13, 5, 9, 13], [7, 11, 7, 11]]
    paged = dict(kv_pages=12, page_size=16)

    want = _run_batcher(params, cfg, None, prompts, **paged)
    mesh = model_mesh(2)
    got = _run_batcher(
        shard_decoder_params(params, mesh), cfg, mesh, prompts, **paged
    )
    assert got == want, (got, want)


def test_tp_paged_int8kv_batcher_matches_unsharded():
    """TP x paged x int8 KV pool: quantized pages shard on KvH with
    their scale pools; tokens equal the single-device int8-KV batcher."""
    from outline_rag_tpu.models.decoder import (
        DecoderConfig,
        init_decoder_params,
        stack_decoder_params,
    )
    from outline_rag_tpu.parallel.tp import model_mesh, shard_decoder_params

    cfg = DecoderConfig.tiny()
    params = stack_decoder_params(init_decoder_params(jax.random.key(4), cfg))
    prompts = [[5, 9, 13, 5, 9, 13]]
    paged = dict(kv_pages=12, page_size=16, kv_int8=True)

    want = _run_batcher(params, cfg, None, prompts, **paged)
    mesh = model_mesh(2)
    got = _run_batcher(
        shard_decoder_params(params, mesh), cfg, mesh, prompts, **paged
    )
    assert got == want, (got, want)


def test_tp_int8_weights_provider_matches_unsharded():
    """TP x w8a8 int8 weights: quantized {'q','s'} leaves shard with
    their own Megatron layouts; greedy decode equals the single-device
    int8 provider token-for-token."""
    import asyncio

    from outline_rag_tpu.models.decoder import (
        DecoderConfig,
        init_decoder_params,
    )
    from outline_rag_tpu.serve.llm import LocalChatProvider

    cfg = DecoderConfig.tiny()
    params = init_decoder_params(jax.random.key(5), cfg)

    class Tok:
        eos_token_id = 0

        def encode(self, text):
            return [1 + (b % 250) for b in text.encode()][:40]

        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    def complete(prov, text):
        return asyncio.run(
            prov.complete(
                "m", [{"role": "user", "content": text}], temperature=0.0
            )
        )

    plain = LocalChatProvider(
        params, cfg, Tok(), chunk_tokens=4, max_new_tokens=10,
        int8_weights=True,
    )
    tp = LocalChatProvider(
        params, cfg, Tok(), chunk_tokens=4, max_new_tokens=10,
        int8_weights=True, tp_devices=2,
    )
    assert tp.params["layers"]["wq"]["q"].sharding.is_fully_replicated is False
    for text in ("hello int8 tensor parallel", "second"):
        assert complete(tp, text) == complete(plain, text)


def test_tp_spec_paged_batcher_matches_unsharded():
    """The full composition: TP x paged KV x speculative decoding.
    Greedy tokens must equal the single-device spec+paged batcher."""
    from outline_rag_tpu.models.decoder import (
        DecoderConfig,
        init_decoder_params,
        stack_decoder_params,
    )
    from outline_rag_tpu.parallel.tp import model_mesh, shard_decoder_params

    cfg = DecoderConfig.tiny()
    params = stack_decoder_params(init_decoder_params(jax.random.key(6), cfg))
    prompts = [[5, 9, 13, 5, 9, 13, 5, 9]]
    kw = dict(kv_pages=12, page_size=16, spec_k=2, spec_gram=2)

    want = _run_batcher(params, cfg, None, prompts, **kw)
    mesh = model_mesh(2)
    got = _run_batcher(
        shard_decoder_params(params, mesh), cfg, mesh, prompts, **kw
    )
    assert got == want, (got, want)


def test_ask_sse_with_tp_paged_int8_provider():
    """The whole serve path over the fully-composed decoder: TP x paged
    KV x w8a8 int8 through the continuous batcher behind /chat/api/ask.
    Streams SSE frames and persists, on the 8-device CPU mesh."""
    import asyncio
    import json

    from outline_rag_tpu.config import load_settings
    from outline_rag_tpu.models.decoder import (
        DecoderConfig,
        init_decoder_params,
    )
    from outline_rag_tpu.models.hash_embedder import HashEmbedder
    from outline_rag_tpu.serve.app import build_app
    from outline_rag_tpu.serve.http import TestClient
    from outline_rag_tpu.serve.llm import LocalChatProvider
    from outline_rag_tpu.storage import SqliteMetaStore

    class Tok:
        eos_token_id = 0

        def encode(self, text):
            return [1 + (b % 250) for b in text.encode()][:40]

        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    cfg = DecoderConfig.tiny()
    params = init_decoder_params(jax.random.key(8), cfg)
    provider = LocalChatProvider(
        params, cfg, Tok(), chunk_tokens=4, max_new_tokens=8,
        tp_devices=2, batch_slots=2, int8_weights=True,
        kv_pages=12, page_size=16,
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
            "/chat/login", body=b"name=tp",
            headers={"content-type": "application/x-www-form-urlencoded"},
        )
        conv = json.loads((await client.post(
            "/chat/api/conversations", json_body={"title": "tp"}
        )).body)
        events = await client.sse(
            "POST", "/chat/api/ask",
            json_body={"conversation_id": conv["id"], "question": "compose"},
        )
        assert "[DONE]" in events
        msgs = json.loads((await client.get(
            f"/chat/api/conversations/{conv['id']}/messages"
        )).body)["messages"]
        assert [m["role"] for m in msgs] == ["user", "assistant"]
        assert msgs[1]["content"]

    try:
        asyncio.run(run())
    finally:
        if provider._batcher is not None:
            provider._batcher.close()
