"""Whole-system integration over real TCP: build_app + asyncio server +
httpx client driving login -> refresh -> ask(SSE) -> messages, the
docker-compose-style end-to-end of SURVEY.md section 4 (fakes for Outline
and the LLM; CPU backend)."""

import asyncio
import json

import httpx
import pytest

from outline_rag_tpu.serve.http import serve
from tests.test_serve import make_app
from outline_rag_tpu.sync.refresh import TASK_QUEUE


def test_full_stack_over_tcp():
    app, fake = make_app()

    async def run():
        server = await serve(app, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]
        base = f"http://127.0.0.1:{port}"
        try:
            async with httpx.AsyncClient(base_url=base) as client:
                # login via dev form, keep session cookie
                r = await client.post(
                    "/chat/login", data={"name": "sock"}, follow_redirects=False
                )
                assert r.status_code == 302

                # trigger refresh; drain tasks inline (workers disabled)
                r = await client.post("/chat/update/all")
                assert r.status_code == 202
                ing, bus = app.state["ingestor"], app.state["bus"]
                for _ in range(20):
                    item = await bus.pop(TASK_QUEUE, timeout=0.01)
                    if item is None:
                        break
                    if item["task"] == "refresh_all":
                        await ing.refresh_all()
                    else:
                        await ing.process_doc_batch(item["ids"])
                status = (await client.get("/chat/api/refresh/status")).json()
                assert status["state"] == "done"

                conv = (
                    await client.post(
                        "/chat/api/conversations", json={"title": "sock"}
                    )
                ).json()

                frames = []
                async with client.stream(
                    "POST",
                    "/chat/api/ask",
                    json={
                        "question": "how do wolves hunt?",
                        "conversation_id": conv["id"],
                    },
                    timeout=30,
                ) as resp:
                    assert resp.status_code == 200
                    assert "text/event-stream" in resp.headers["content-type"]
                    async for line in resp.aiter_lines():
                        if line.startswith("data:"):
                            frames.append(line[5:].strip())
                assert frames[-1] == "[DONE]"
                text = "".join(
                    json.loads(f)["choices"][0]["delta"].get("content", "")
                    for f in frames
                    if f != "[DONE]"
                )
                assert "[SourcesMap]:" in text

                msgs = (
                    await client.get(
                        f"/chat/api/conversations/{conv['id']}/messages"
                    )
                ).json()["messages"]
                assert [m["role"] for m in msgs] == ["user", "assistant"]
        finally:
            server.close()
            await server.wait_closed()
            await app.shutdown()

    asyncio.run(run())
