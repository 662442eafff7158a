"""OpenAICompatProvider protocol tests against a mock chat-completions
server (streaming SSE frames, JSON mode, TTL answer cache)."""

import asyncio
import json

import httpx

from outline_rag_tpu.serve.llm import OpenAICompatProvider
from outline_rag_tpu.storage import InMemoryBus


class MockLLMServer:
    def __init__(self):
        self.requests: list[dict] = []

    def transport(self):
        return httpx.MockTransport(self._handle)

    def _handle(self, request: httpx.Request) -> httpx.Response:
        payload = json.loads(request.content)
        self.requests.append(payload)
        if payload.get("stream"):
            frames = []
            for tok in ["Hello", " ", "world"]:
                frames.append(
                    "data: "
                    + json.dumps(
                        {
                            "choices": [{"delta": {"content": tok}}],
                            "model": payload["model"],
                        }
                    )
                )
            frames.append(
                "data: "
                + json.dumps(
                    {
                        "choices": [
                            {"delta": {"reasoning_content": "hmm"}}
                        ],
                        "model": payload["model"],
                    }
                )
            )
            frames.append("data: [DONE]")
            body = "\n\n".join(frames) + "\n\n"
            return httpx.Response(
                200, content=body.encode(), headers={"content-type": "text/event-stream"}
            )
        content = json.dumps({"echo": payload["messages"][-1]["content"]})
        return httpx.Response(
            200,
            json={
                "choices": [{"message": {"content": content}}],
                "model": payload["model"],
            },
        )


def test_streaming_parse():
    server = MockLLMServer()
    provider = OpenAICompatProvider(
        "http://llm.test/v1", "key", transport=server.transport()
    )

    async def run():
        out = []
        async for delta in provider.stream("m1", [{"role": "user", "content": "hi"}]):
            out.append(delta)
        await provider.aclose()
        return out

    deltas = asyncio.run(run())
    content = "".join(d["content"] or "" for d in deltas)
    thinking = "".join(d["thinking"] or "" for d in deltas)
    assert content == "Hello world"
    assert thinking == "hmm"
    assert server.requests[0]["stream"] is True


def test_complete_with_cache():
    server = MockLLMServer()
    bus = InMemoryBus()
    provider = OpenAICompatProvider(
        "http://llm.test/v1", "key", bus=bus, transport=server.transport()
    )

    async def run():
        a = await provider.complete("m1", [{"role": "user", "content": "q"}], json_mode=True)
        b = await provider.complete("m1", [{"role": "user", "content": "q"}], json_mode=True)
        c = await provider.complete("m1", [{"role": "user", "content": "other"}], json_mode=True)
        await provider.aclose()
        return a, b, c

    a, b, c = asyncio.run(run())
    assert a == b
    assert json.loads(a)["echo"] == "q"
    assert json.loads(c)["echo"] == "other"
    # identical request served from cache: only 2 upstream calls
    assert len(server.requests) == 2
    assert server.requests[0]["response_format"] == {"type": "json_object"}
