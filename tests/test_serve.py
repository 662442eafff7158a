"""End-to-end API tests through the in-process TestClient: the integration
strategy of SURVEY.md section 4 (fakes for Outline + LLM, SSE-consuming
client), covering the full /chat surface."""

import asyncio
import json

import pytest

from outline_rag_tpu.config import load_settings
from outline_rag_tpu.serve.app import build_app
from outline_rag_tpu.serve.http import TestClient
from outline_rag_tpu.serve.llm import FakeChatProvider
from outline_rag_tpu.sync.refresh import TASK_QUEUE
from outline_rag_tpu.utils.hashing import sign_webhook_body
from tests.fake_outline import FakeOutline

DIM = 128


def make_app(thinking=False, cite=False, **env):
    base_env = {
        "SECRET_KEY": "test-secret",
        "VECTOR_DIM": str(DIM),
        "DATA_DIR": "",
        "OUTLINE_WEBHOOK_SECRET": "whsec",
        "REFRESH_BATCH_SIZE": "2",
        "CHUNK_SIZE": "256",
        "CHUNK_OVERLAP": "32",
    }
    base_env.update(env)
    settings = load_settings(base_env)
    fake = FakeOutline()
    fake.put_doc("d1", "Wolves", "wolves hunt in packs across the tundra", "t1")
    fake.put_doc("d2", "Rivers", "rivers carve canyons over millennia", "t1")
    from outline_rag_tpu.models.hash_embedder import HashEmbedder
    from outline_rag_tpu.storage import SqliteMetaStore

    app = build_app(
        settings,
        provider=FakeChatProvider(thinking=thinking, cite=cite),
        embedder=HashEmbedder(dim=DIM),
        meta=SqliteMetaStore(":memory:"),
        outline_transport=fake.transport(),
        start_workers=False,
    )
    return app, fake


async def login(client):
    resp = await client.post(
        "/chat/login",
        body=b"name=tester",
        headers={"content-type": "application/x-www-form-urlencoded"},
    )
    assert resp.status == 302


async def drain_tasks(app):
    ing = app.state["ingestor"]
    bus = app.state["bus"]
    for _ in range(50):
        item = await bus.pop(TASK_QUEUE, timeout=0.01)
        if item is None:
            return
        if item["task"] == "refresh_all":
            await ing.refresh_all()
        elif item["task"] == "process_doc_batch":
            await ing.process_doc_batch(item["ids"])


def test_healthz_and_auth_gates():
    app, _ = make_app()
    client = TestClient(app)

    async def run():
        ok = await client.get("/healthz")
        assert ok.status == 200
        for path in ("/chat/api/me", "/chat/api/conversations"):
            resp = await client.get(path)
            assert resp.status == 401
        home = await client.get("/chat/")
        assert home.status == 302  # redirect to login

    asyncio.run(run())


def test_me_and_model_catalog_beta_gating():
    app, _ = make_app(BETA_AUTHORIZED_USER_IDS="dev:vip")
    client = TestClient(app)

    async def run():
        await login(client)
        data = json.loads((await client.get("/chat/api/me")).body)
        assert data["user"]["name"] == "tester"
        ids = [m["id"] for m in data["models"]]
        assert "deepseek-v3" in ids
        assert "qwen-72b" not in ids  # beta model hidden for non-beta user

    asyncio.run(run())


def test_conversation_crud_and_ownership():
    app, _ = make_app()
    client = TestClient(app)
    intruder = TestClient(app)

    async def run():
        await login(client)
        conv = json.loads(
            (await client.post("/chat/api/conversations", json_body={"title": "t1"})).body
        )
        convs = json.loads((await client.get("/chat/api/conversations")).body)
        assert [c["id"] for c in convs["conversations"]] == [conv["id"]]

        ok = await client.put(
            f"/chat/api/conversations/{conv['id']}", json_body={"title": "renamed"}
        )
        assert ok.status == 200

        # another user cannot touch it
        resp = await intruder.post(
            "/chat/login",
            body=b"name=other",
            headers={"content-type": "application/x-www-form-urlencoded"},
        )
        assert resp.status == 302
        assert (
            await intruder.put(
                f"/chat/api/conversations/{conv['id']}", json_body={"title": "x"}
            )
        ).status == 403
        assert (
            await intruder.delete(f"/chat/api/conversations/{conv['id']}")
        ).status == 403
        assert (
            await intruder.get(f"/chat/api/conversations/{conv['id']}/messages")
        ).status == 403

        assert (await client.delete(f"/chat/api/conversations/{conv['id']}")).status == 200

    asyncio.run(run())


def test_refresh_then_ask_with_citations():
    app, fake = make_app()
    client = TestClient(app)

    async def run():
        await login(client)
        # trigger refresh (NX lock) and drain the queue inline
        r = await client.post("/chat/update/all")
        assert r.status == 202
        r2 = await client.post("/chat/update/all")
        assert r2.status == 429  # lock held
        await drain_tasks(app)
        status = json.loads((await client.get("/chat/api/refresh/status")).body)
        assert status["state"] == "done" and status["success"] == 2

        conv = json.loads(
            (await client.post("/chat/api/conversations", json_body={"title": "t"})).body
        )
        events = await client.sse(
            "POST",
            "/chat/api/ask",
            json_body={
                "question": "how do wolves hunt in the tundra?",
                "conversation_id": conv["id"],
            },
        )
        assert "[DONE]" in events
        text = "".join(
            e["choices"][0]["delta"].get("content", "")
            for e in events
            if isinstance(e, dict) and e.get("choices")
        )
        assert "[SourcesMap]:" in text
        # persisted assistant message carries the map; user msg persisted too
        msgs = json.loads(
            (await client.get(f"/chat/api/conversations/{conv['id']}/messages")).body
        )["messages"]
        assert [m["role"] for m in msgs] == ["user", "assistant"]
        assert "[SourcesMap]:" in msgs[1]["content"]
        smap = json.loads(
            [l for l in msgs[1]["content"].splitlines() if l.startswith("[SourcesMap]:")][0][13:]
        )
        assert smap["1"]["title"] in ("Wolves", "Rivers")

    asyncio.run(run())


def test_ask_thinking_passthrough_and_general_route():
    app, _ = make_app(thinking=True)
    client = TestClient(app)

    async def run():
        await login(client)
        conv = json.loads(
            (await client.post("/chat/api/conversations", json_body={"title": "t"})).body
        )
        events = await client.sse(
            "POST",
            "/chat/api/ask",
            json_body={"question": "hello there!", "conversation_id": conv["id"]},
        )
        thinking = "".join(
            e["choices"][0]["delta"].get("thinking", "")
            for e in events
            if isinstance(e, dict) and e.get("choices")
        )
        assert "considering" in thinking
        msgs = json.loads(
            (await client.get(f"/chat/api/conversations/{conv['id']}/messages")).body
        )["messages"]
        assert "<!--thinking-->" in msgs[1]["content"]
        # General route (greeting) -> no sources map
        assert "[SourcesMap]:" not in msgs[1]["content"]

    asyncio.run(run())


def test_edit_resume_truncation():
    app, _ = make_app()
    client = TestClient(app)

    async def run():
        await login(client)
        conv = json.loads(
            (await client.post("/chat/api/conversations", json_body={"title": "t"})).body
        )
        cid = conv["id"]
        await client.sse("POST", "/chat/api/ask",
                         json_body={"question": "hello!", "conversation_id": cid})
        await client.sse("POST", "/chat/api/ask",
                         json_body={"question": "thanks!", "conversation_id": cid})
        msgs = json.loads(
            (await client.get(f"/chat/api/conversations/{cid}/messages")).body
        )["messages"]
        assert len(msgs) == 4
        first_user_id = msgs[0]["id"]
        # edit the first user message: everything from it onward is replaced
        await client.sse(
            "POST",
            "/chat/api/ask",
            json_body={
                "question": "hello edited!",
                "conversation_id": cid,
                "edit_message_id": first_user_id,
            },
        )
        msgs2 = json.loads(
            (await client.get(f"/chat/api/conversations/{cid}/messages")).body
        )["messages"]
        assert len(msgs2) == 2
        assert msgs2[0]["content"] == "hello edited!"

    asyncio.run(run())


def test_upload_validation():
    app, _ = make_app()
    client = TestClient(app)

    def mp(filename, data: bytes):
        b = b"--BOUND\r\n"
        b += (
            f'Content-Disposition: form-data; name="file"; filename="{filename}"\r\n'
            "Content-Type: text/plain\r\n\r\n"
        ).encode()
        b += data + b"\r\n--BOUND--\r\n"
        return b

    async def run():
        await login(client)
        ok = await client.post(
            "/chat/api/upload",
            body=mp("notes.md", b"hello upload"),
            headers={"content-type": "multipart/form-data; boundary=BOUND"},
        )
        assert ok.status == 201
        bad = await client.post(
            "/chat/api/upload",
            body=mp("evil.exe", b"MZ"),
            headers={"content-type": "multipart/form-data; boundary=BOUND"},
        )
        assert bad.status == 400

    asyncio.run(run())


def test_webhook_signature_and_debounce():
    app, _ = make_app()
    client = TestClient(app)

    async def run():
        body = b'{"event":"documents.update"}'
        bad = await client.post(
            "/chat/update/webhook", body=body,
            headers={"x-outline-signature": "nope", "content-type": "application/json"},
        )
        assert bad.status == 401
        sig = sign_webhook_body("whsec", body)
        ok = await client.post(
            "/chat/update/webhook", body=body,
            headers={"x-outline-signature": sig, "content-type": "application/json"},
        )
        assert ok.status == 202
        timer = await app.state["bus"].get("webhook:refresh_timer_due")
        assert timer is not None

    asyncio.run(run())


def test_deep_link_validation():
    app, _ = make_app()
    client = TestClient(app)

    async def run():
        await login(client)
        conv = json.loads(
            (await client.post("/chat/api/conversations", json_body={"title": "t"})).body
        )
        good = await client.get(f"/chat/{conv['id']}")
        assert good.status == 200
        bad = await client.get("/chat/not-a-uuid")
        assert bad.status == 302
        someone_elses = await client.get(
            "/chat/00000000-0000-4000-8000-000000000000"
        )
        assert someone_elses.status == 302

    asyncio.run(run())


def test_metrics_endpoint():
    app, _ = make_app()
    client = TestClient(app)

    async def run():
        assert (await client.get("/chat/api/metrics")).status == 401
        await login(client)
        conv = json.loads(
            (await client.post("/chat/api/conversations", json_body={"title": "t"})).body
        )
        await client.sse("POST", "/chat/api/ask",
                         json_body={"question": "what are wolves?", "conversation_id": conv["id"]})
        data = json.loads((await client.get("/chat/api/metrics")).body)
        assert "index" in data and "stages" in data
        assert any(k.startswith("http.") for k in data["stages"])

    asyncio.run(run())


def test_hundred_concurrent_asks_batch():
    """BASELINE.md fused-serve rung: 100 concurrent queries coalesce into
    few device batches and all complete."""
    app, _ = make_app()
    client = TestClient(app)

    async def run():
        await login(client)
        await client.post("/chat/update/all")
        await drain_tasks(app)
        convs = []
        for _ in range(4):
            c = json.loads(
                (await client.post("/chat/api/conversations", json_body={"title": "t"})).body
            )
            convs.append(c["id"])

        calls = []
        retrieval = app.state["retrieval"]
        orig = retrieval.retrieve_batch

        def counting(queries):
            calls.append(len(queries))
            return orig(queries)

        app.state["batcher"].retrieve_batch = counting

        async def one(i):
            events = await client.sse(
                "POST",
                "/chat/api/ask",
                json_body={
                    "question": f"what about wolves number {i}?",
                    "conversation_id": convs[i % 4],
                },
            )
            return "[DONE]" in events

        results = await asyncio.gather(*[one(i) for i in range(100)])
        return results, calls

    results, calls = asyncio.run(run())
    assert all(results)
    assert sum(calls) == 100
    # coalescing happened: far fewer device batches than queries
    assert len(calls) < 60

    asyncio.run(app.shutdown())


def test_reference_shaped_route_aliases():
    app, _ = make_app()
    client = TestClient(app)

    async def run():
        await login(client)
        conv = json.loads(
            (await client.post("/chat/api/conversations", json_body={"title": "t"})).body
        )
        cid = conv["id"]
        ok = await client.post(
            f"/chat/api/conversations/{cid}/rename", json_body={"title": "renamed"}
        )
        assert ok.status == 200
        msgs = await client.get(f"/chat/api/messages?conversation_id={cid}")
        assert msgs.status == 200
        assert json.loads(msgs.body)["messages"] == []
        gone = await client.post(f"/chat/api/conversations/{cid}/delete")
        assert gone.status == 200
        assert (await client.get(f"/chat/api/messages?conversation_id={cid}")).status == 403

    asyncio.run(run())


def test_ask_with_f32x2_index():
    """INDEX_DTYPE=f32x2 (compensated bf16 pairs) serves the full ask
    path with citations — the recommended exact mode end-to-end."""
    app, fake = make_app(INDEX_DTYPE="f32x2")
    client = TestClient(app)

    async def run():
        await login(client)
        await client.post("/chat/update/all")
        await drain_tasks(app)
        index = app.state["index"]
        assert index.dtype == "f32x2"
        assert index._shard.state.vectors.shape[1] == 2 * DIM
        conv = json.loads(
            (await client.post("/chat/api/conversations", json_body={"title": "t"})).body
        )
        events = await client.sse(
            "POST",
            "/chat/api/ask",
            json_body={
                "question": "how do wolves hunt?",
                "conversation_id": conv["id"],
            },
        )
        assert "[DONE]" in events
        text = "".join(
            e["choices"][0]["delta"].get("content", "")
            for e in events
            if isinstance(e, dict) and e.get("choices")
        )
        assert "[SourcesMap]:" in text

    asyncio.run(run())


def test_sse_timed_reports_ttfr():
    """sse_timed returns (events, ttfr, total) with ttfr <= total and
    the same parsed frames as sse() — the bench instrumentation for the
    north-star rung's p50/p95 TTFR."""
    app, _ = make_app()
    client = TestClient(app)

    async def run():
        await login(client)
        conv = json.loads(
            (await client.post(
                "/chat/api/conversations", json_body={"title": "t"}
            )).body
        )
        events, ttfr, total = await client.sse_timed(
            "POST",
            "/chat/api/ask",
            json_body={
                "question": "wolves in the tundra",
                "conversation_id": conv["id"],
            },
        )
        assert "[DONE]" in events
        assert 0 < ttfr <= total
        assert any(isinstance(e, dict) and e.get("choices") for e in events)

    asyncio.run(run())


def test_snapshot_restore_and_autosave(tmp_path):
    """Restart path: a saved index snapshot is adopted at startup
    (instant restart, no re-embedding); INDEX_AUTOSAVE_S>0 writes the
    snapshot when the generation changes. The delta-sync protocol
    reconciles staleness on the next refresh (same model as the
    reference's updatedAt re-diff)."""
    import os

    data_dir = str(tmp_path)
    # first life: ingest the fixture wiki, autosave on (tiny interval)
    app, _ = make_app(DATA_DIR=data_dir, INDEX_AUTOSAVE_S="0.2")
    client = TestClient(app)

    async def first_life():
        await app.startup()
        await login(client)
        await client.post("/chat/update/all")
        await drain_tasks(app)
        assert app.state["index"].size > 0
        # autosave loop fires within a few intervals (generous budget:
        # the suite runs on one CPU core and the loop competes with it)
        for _ in range(300):
            await asyncio.sleep(0.1)
            if os.path.exists(os.path.join(data_dir, "index_snapshot.npz")):
                break
        assert os.path.exists(os.path.join(data_dir, "index_snapshot.npz"))
        await app.shutdown()

    asyncio.run(first_life())

    # second life: fresh app + EMPTY meta store (no rebuild source) —
    # only the snapshot can populate the index
    app2, _ = make_app(DATA_DIR=data_dir)
    client2 = TestClient(app2)

    async def second_life():
        await app2.startup()
        idx = app2.state["index"]
        assert idx.size > 0, "snapshot was not adopted at startup"
        await login(client2)
        conv = json.loads(
            (await client2.post(
                "/chat/api/conversations", json_body={"title": "t"}
            )).body
        )
        events = await client2.sse(
            "POST",
            "/chat/api/ask",
            json_body={
                "question": "wolves in the tundra",
                "conversation_id": conv["id"],
            },
        )
        assert "[DONE]" in events

    asyncio.run(second_life())


def test_snapshot_config_mismatch_falls_through(tmp_path):
    """A snapshot with a different dim must not be adopted (the restore
    hook logs and continues to the rebuild path)."""
    from outline_rag_tpu.index import VectorIndex

    other = VectorIndex(dim=64, capacity=1024)
    import numpy as np

    other.add_chunks(
        ["c0"], np.ones((1, 64), np.float32), source_id="s"
    )
    other.save(str(tmp_path / "index_snapshot"))

    app, _ = make_app(DATA_DIR=str(tmp_path))  # DIM=128 != 64

    async def run():
        await app.startup()
        assert app.state["index"].size == 0  # mismatch skipped, no crash

    asyncio.run(run())


def test_list_conversations_limit_validation():
    """?limit=-1 must not bypass the 100-row page cap (SQLite treats
    LIMIT -1 as unbounded); non-numeric limit is a 400, not a 500."""
    app, _ = make_app()
    client = TestClient(app)

    async def run():
        await login(client)
        for i in range(3):
            await client.post(
                "/chat/api/conversations", json_body={"title": f"c{i}"}
            )
        r = await client.get("/chat/api/conversations?limit=-1")
        assert r.status == 200
        assert len(json.loads(r.body)["conversations"]) == 0  # clamped
        r = await client.get("/chat/api/conversations?limit=abc")
        assert r.status == 400
        r = await client.get("/chat/api/conversations?offset=zzz")
        assert r.status == 400

    asyncio.run(run())


def test_ask_rejects_non_numeric_edit_message_id():
    app, _ = make_app()
    client = TestClient(app)

    async def run():
        await login(client)
        conv = json.loads(
            (await client.post(
                "/chat/api/conversations", json_body={"title": "t"}
            )).body
        )
        r = await client.post(
            "/chat/api/ask",
            json_body={
                "conversation_id": conv["id"],
                "question": "q",
                "edit_message_id": "abc",
            },
        )
        assert r.status == 400

    asyncio.run(run())
