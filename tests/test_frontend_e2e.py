"""Full-stack in-process e2e: the SHIPPED frontend against the REAL app.

The jsrt Browser's fetch is adapted onto serve/http.py's TestClient, so
every layer on both sides is the production code: app.js's fetch/SSE
reader parses the actual bytes produced by serve/chat.py's SSE encoder,
auth is the real session cookie, retrieval is the real VectorIndex over
ingested fixture docs, persistence is the real sqlite store. Only the
chat LLM is the FakeChatProvider (a remote API in both systems) and the
embedder is the hash embedder (CPU CI).

This is the closest this environment can get to a browser smoke test —
reference seam: the whole §3.1 hot path driven from the UI end.
"""

import asyncio
import json
import posixpath
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from jsrt.dom import Browser, FakeResponse  # noqa: E402

from outline_rag_tpu.serve.http import TestClient  # noqa: E402
from tests.test_serve import drain_tasks, make_app  # noqa: E402

STATIC = Path(__file__).resolve().parent.parent / \
    "outline_rag_tpu" / "serve" / "static"


class LiveFetch:
    """Adapts Browser fetches onto the in-process TestClient."""

    def __init__(self, client: TestClient, loop):
        self.client = client
        self.loop = loop
        self.log = []

    def __call__(self, url: str, opts: dict) -> FakeResponse:
        method = (opts.get("method") or "GET").upper()
        # app.js builds '/chat/api/../update/all' — normalize like a
        # real fetch would before it hits the server
        path = posixpath.normpath(url)
        body = (opts.get("body") or "").encode() \
            if isinstance(opts.get("body"), str) else b""
        headers = {"content-type": "application/json"} if body else None
        self.log.append((method, path))
        resp = self.loop.run_until_complete(
            self.client.request(method, path, body=body, headers=headers)
        )
        ctype = ""
        for k, v in dict(resp.headers).items():
            if k.lower() == "content-type":
                ctype = v
        if "text/event-stream" in ctype:
            out = FakeResponse.stream(status=resp.status)
            # hand the REAL SSE bytes to the real reader loop, split at
            # arbitrary (non-frame) boundaries to exercise buffering
            raw = resp.body.decode()
            out.chunks.extend([raw[i:i + 97] for i in range(0, len(raw), 97)])
            out.done = True
            return out
        try:
            payload = json.loads(resp.body.decode() or "{}")
        except ValueError:
            payload = {}
        return FakeResponse(status=resp.status, json_body=payload)


@pytest.fixture()
def stack():
    app, fake = make_app(thinking=True, cite=True)
    loop = asyncio.new_event_loop()
    client = TestClient(app)

    async def prepare():
        resp = await client.post(
            "/chat/login",
            body=b"name=e2e",
            headers={"content-type": "application/x-www-form-urlencoded"},
        )
        assert resp.status == 302
        resp = await client.post("/chat/update/all")
        assert resp.status in (200, 202)
        await drain_tasks(app)

    loop.run_until_complete(prepare())
    browser = Browser(html_path=str(STATIC / "index.html"),
                      static_dir=str(STATIC))
    browser.on_fetch = LiveFetch(client, loop)
    try:
        yield browser, app, loop
    finally:
        pending = asyncio.all_tasks(loop)
        for t in pending:
            t.cancel()
        if pending:
            loop.run_until_complete(
                asyncio.gather(*pending, return_exceptions=True))
        loop.close()


def test_boot_against_real_app(stack):
    browser, app, loop = stack
    browser.boot()
    # real /chat/api/me: the dev-login user + the real model catalog
    assert "e2e" in browser.text(".greet-title")
    opts = browser.q("#model-picker").query_all("option")
    assert len(opts) >= 1  # real catalog served


def test_full_ask_flow_against_real_app(stack):
    browser, app, loop = stack
    browser.boot()
    browser.type_text("#input", "do wolves hunt in packs?")
    browser.press("#input", "Enter")

    # the REAL pipeline ran: classifier -> rewrite -> retrieval over the
    # ingested fixture wiki -> streamed SSE -> persisted conversation
    msgs = browser.q("#messages")
    bubble = msgs.query(".msg.assistant .bubble")
    assert bubble is not None, msgs.serialize()[:500]
    text = bubble.text()
    # the fake provider streams a prefix of its (real) system context back
    assert "Answer based on:" in text

    # thinking prelude rendered and folded once content arrived
    think = msgs.query("details.thinking")
    assert think is not None
    assert "considering" in think.text()

    # citations: the server persisted a [SourcesMap]; the post-stream
    # reload linkified [source n] into citation pills with real doc urls
    html = browser.q("#messages").serialize()
    assert 'class="citation"' in html

    # the user message also persisted and re-rendered with an edit button
    assert browser.maybe("#messages .msg.user button.edit") is not None

    # the persisted assistant message re-rendered with its meta line
    # (model id from the real messages API + sqlite created_at)
    meta = browser.maybe("#messages .msg.assistant .msg-meta")
    assert meta is not None and "·" in meta.text()

    # conversation list refreshed with the real persisted conversation
    assert "do wolves hunt in packs?"[:20] in browser.text("#conv-list")


def test_conversation_crud_against_real_app(stack):
    browser, app, loop = stack
    browser.boot()
    browser.type_text("#input", "tell me about rivers")
    browser.press("#input", "Enter")
    def conv_menu_items():
        # the '⋯' actions popover (reference sidebar conv-menu)
        browser.click("#conv-list li button.conv-menu")
        return browser.q("#conv-list li .conv-menu-pop").query_all("button")

    # rename through the real PUT
    browser.dispatch(conv_menu_items()[0], "click")
    field = browser.q(".modal-overlay .modal-input")
    field.props["value"] = "Renamed via UI"
    browser.click(".modal-overlay .modal-btn.primary")
    assert "Renamed via UI" in browser.text("#conv-list")
    # delete through the real DELETE
    browser.dispatch(conv_menu_items()[1], "click")
    browser.click(".modal-overlay .modal-btn.primary")
    assert "Renamed via UI" not in browser.text("#conv-list")


def test_refresh_status_polling_against_real_app(stack):
    browser, app, loop = stack
    browser.boot()
    browser.click("#refresh-kb")
    # the worker isn't running in tests, so drain the queued task, then
    # let the UI's 3s poll pick up the real terminal status
    loop.run_until_complete(drain_tasks(app))
    browser.advance(3100)
    status = browser.text("#refresh-status")
    assert "indexed" in status or "refresh" in status
