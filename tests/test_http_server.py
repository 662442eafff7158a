"""Socket-level tests of the asyncio HTTP server (serve/http.py): real
bind, keep-alive, chunked SSE streaming, cookies — via httpx over TCP."""

import asyncio
import json

import httpx
import pytest

from outline_rag_tpu.serve.http import App, Request, Response, serve


def _demo_app() -> App:
    app = App(secret_key="sock-test")

    @app.get("/ping")
    async def ping(req: Request) -> Response:
        return Response.json({"pong": True, "q": req.query.get("x")})

    @app.post("/echo")
    async def echo(req: Request) -> Response:
        return Response.json({"body": req.json()})

    @app.get("/session")
    async def session(req: Request) -> Response:
        req.session["n"] = req.session.get("n", 0) + 1
        return Response.json({"n": req.session["n"]})

    @app.get("/stream")
    async def stream(req: Request) -> Response:
        async def gen():
            for i in range(3):
                yield f"data: {i}\n\n".encode()
                await asyncio.sleep(0.01)
            yield b"data: [DONE]\n\n"

        return Response.streaming(gen())

    @app.get("/item/{item_id}")
    async def item(req: Request) -> Response:
        return Response.json({"id": req.path_params["item_id"]})

    return app


def test_real_socket_roundtrip():
    async def run():
        app = _demo_app()
        server = await serve(app, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]
        base = f"http://127.0.0.1:{port}"
        try:
            async with httpx.AsyncClient() as client:
                r = await client.get(base + "/ping?x=7")
                assert r.status_code == 200 and r.json() == {"pong": True, "q": "7"}

                r = await client.post(base + "/echo", json={"a": [1, 2]})
                assert r.json() == {"body": {"a": [1, 2]}}

                r = await client.get(base + "/item/abc")
                assert r.json() == {"id": "abc"}

                r = await client.get(base + "/nope")
                assert r.status_code == 404

                # session cookie round-trip
                r1 = await client.get(base + "/session")
                r2 = await client.get(base + "/session")
                assert r1.json()["n"] == 1 and r2.json()["n"] == 2

                # chunked SSE stream
                events = []
                async with client.stream("GET", base + "/stream") as resp:
                    assert resp.headers.get("transfer-encoding") == "chunked"
                    async for line in resp.aiter_lines():
                        if line.startswith("data:"):
                            events.append(line[5:].strip())
                assert events == ["0", "1", "2", "[DONE]"]

                # keep-alive: several requests on one client (conn reuse)
                for _ in range(3):
                    assert (await client.get(base + "/ping")).status_code == 200
        finally:
            server.close()
            await server.wait_closed()
            await app.shutdown()

    asyncio.run(run())


def test_oversize_body_gets_413():
    async def run():
        app = _demo_app()
        server = await serve(app, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]
        try:
            reader, writer = await asyncio.open_connection("127.0.0.1", port)
            writer.write(
                b"POST /echo HTTP/1.1\r\nhost: x\r\ncontent-type: application/json\r\n"
                b"content-length: 999999999\r\n\r\n"
            )
            await writer.drain()
            line = await reader.readline()
            assert b"413" in line
            writer.close()
        finally:
            server.close()
            await server.wait_closed()
            await app.shutdown()

    asyncio.run(run())


def test_bad_content_length_gets_400():
    async def run():
        app = _demo_app()
        server = await serve(app, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]
        try:
            reader, writer = await asyncio.open_connection("127.0.0.1", port)
            writer.write(
                b"POST /echo HTTP/1.1\r\nhost: x\r\ncontent-length: nope\r\n\r\n"
            )
            await writer.drain()
            line = await reader.readline()
            assert b"400" in line
            writer.close()
        finally:
            server.close()
            await server.wait_closed()
            await app.shutdown()

    asyncio.run(run())
