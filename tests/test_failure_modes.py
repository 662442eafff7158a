"""Failure-injection tests: the fail-open semantics SURVEY.md section 5
documents in the reference (classifier -> General, reranker -> no context,
stream errors -> graceful interruption + persistence) plus security
hardening of the first-party HTTP stack."""

import asyncio
import json

from outline_rag_tpu.serve.http import (
    App,
    Request,
    Response,
    TestClient,
    sign_session,
    verify_session,
)
from tests.test_serve import drain_tasks, login, make_app


class BrokenClassifierProvider:
    """complete() raises; stream() works — classifier must fail open to
    the General route (reference api.py:720-724)."""

    async def complete(self, *a, **k):
        raise RuntimeError("provider down")

    async def stream(self, model, messages, **k):
        yield {"content": "fallback answer", "thinking": None, "model": model}


class MidStreamFailProvider:
    async def complete(self, model, messages, temperature=0.0, top_p=None,
                       json_mode=False, max_tokens=None):
        if json_mode:
            return json.dumps({"category": "General"})
        return "q"

    async def stream(self, model, messages, **k):
        yield {"content": "partial ", "thinking": None, "model": model}
        raise ConnectionError("upstream died")


def _app_with_provider(provider):
    from outline_rag_tpu.config import load_settings
    from outline_rag_tpu.models.hash_embedder import HashEmbedder
    from outline_rag_tpu.serve.app import build_app
    from outline_rag_tpu.storage import SqliteMetaStore
    from tests.fake_outline import FakeOutline

    settings = load_settings(
        {"SECRET_KEY": "t", "VECTOR_DIM": "64", "DATA_DIR": "",
         "OUTLINE_WEBHOOK_SECRET": "w"}
    )
    fake = FakeOutline()
    return build_app(
        settings,
        provider=provider,
        embedder=HashEmbedder(dim=64),
        meta=SqliteMetaStore(":memory:"),
        outline_transport=fake.transport(),
        start_workers=False,
    )


def test_classifier_failure_routes_general():
    app = _app_with_provider(BrokenClassifierProvider())
    client = TestClient(app)

    async def run():
        await login(client)
        conv = json.loads(
            (await client.post("/chat/api/conversations", json_body={"title": "t"})).body
        )
        events = await client.sse(
            "POST", "/chat/api/ask",
            json_body={"question": "find the docs", "conversation_id": conv["id"]},
        )
        text = "".join(
            e["choices"][0]["delta"].get("content", "")
            for e in events if isinstance(e, dict) and e.get("choices")
        )
        assert "fallback answer" in text
        msgs = json.loads(
            (await client.get(f"/chat/api/conversations/{conv['id']}/messages")).body
        )["messages"]
        assert msgs[-1]["role"] == "assistant"

    asyncio.run(run())


def test_midstream_failure_persists_partial():
    app = _app_with_provider(MidStreamFailProvider())
    client = TestClient(app)

    async def run():
        await login(client)
        conv = json.loads(
            (await client.post("/chat/api/conversations", json_body={"title": "t"})).body
        )
        events = await client.sse(
            "POST", "/chat/api/ask",
            json_body={"question": "hello", "conversation_id": conv["id"]},
        )
        text = "".join(
            e["choices"][0]["delta"].get("content", "")
            for e in events if isinstance(e, dict) and e.get("choices")
        )
        assert "partial" in text and "interrupted" in text
        msgs = json.loads(
            (await client.get(f"/chat/api/conversations/{conv['id']}/messages")).body
        )["messages"]
        # partial answer persisted despite the upstream failure
        assert msgs[-1]["role"] == "assistant"
        assert "partial" in msgs[-1]["content"]

    asyncio.run(run())


def test_reranker_fail_open():
    from outline_rag_tpu.engine.rerank import CrossEncoderReranker
    from outline_rag_tpu.models.encoder import EncoderConfig
    from outline_rag_tpu.models.reranker import init_reranker_params
    from outline_rag_tpu.models.tokenizer import HashTokenizer

    import jax

    cfg = EncoderConfig.tiny()
    rr = CrossEncoderReranker(
        init_reranker_params(jax.random.key(0), cfg), cfg, HashTokenizer(cfg.vocab_size)
    )
    rr._jit = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("device lost"))
    assert rr.rerank("q", ["a", "b"], 2) == []


# ---------------------------------------------------------------------------
# security hardening
# ---------------------------------------------------------------------------


def test_session_tamper_rejected():
    token = sign_session("secret", {"user": {"id": "u1"}}, 3600)
    assert verify_session("secret", token)["user"]["id"] == "u1"
    # flipped payload byte
    raw, sig = token.rsplit(".", 1)
    assert verify_session("secret", raw[:-2] + "xx." + sig) == {}
    # wrong key
    assert verify_session("other", token) == {}
    # expired
    old = sign_session("secret", {"user": {"id": "u1"}}, -10)
    assert verify_session("secret", old) == {}


def test_static_path_traversal_blocked():
    app, _ = make_app()
    client = TestClient(app)

    async def run():
        ok = await client.get("/chat/static/app.js")
        assert ok.status == 200
        for evil in (
            "/chat/static/../app.py",
            "/chat/static/..%2F..%2Fconfig.py",
            "/chat/static/%2e%2e/%2e%2e/etc/passwd",
        ):
            resp = await client.get(evil)
            assert resp.status in (302, 404), evil  # never file contents
            assert b"SECRET" not in resp.body

    asyncio.run(run())


def test_forged_session_cookie_rejected_by_app():
    app, _ = make_app()
    client = TestClient(app)

    async def run():
        # cookie signed with the wrong key
        client.cookies["session"] = sign_session(
            "wrong-key", {"user": {"id": "dev:hacker", "name": "x"}}, 3600
        )
        resp = await client.get("/chat/api/me")
        assert resp.status == 401

    asyncio.run(run())
