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


def test_malformed_requests_do_not_kill_the_server():
    """Raw-socket fuzz: garbage bytes, bad request lines, huge header
    lines, truncated bodies — each connection may be rejected, but the
    server must keep serving well-formed requests afterwards."""

    async def run():
        app = _demo_app()
        server = await serve(app, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]

        async def raw(payload: bytes) -> bytes:
            reader, writer = await asyncio.open_connection("127.0.0.1", port)
            try:
                writer.write(payload)
                await writer.drain()
                try:
                    return await asyncio.wait_for(reader.read(256), timeout=3)
                except asyncio.TimeoutError:
                    return b"<timeout>"
            finally:
                writer.close()

        cases = [
            b"\x00\xff\xfe garbage not http\r\n\r\n",
            b"GET\r\n\r\n",  # no path/version
            b"FROB /ping HTTP/1.1\r\nHost: x\r\n\r\n",  # unknown method
            b"GET /ping HTTP/9.9\r\n\r\n",
            b"GET /ping HTTP/1.1\r\n" + b"X-Big: " + b"a" * 100_000 + b"\r\n\r\n",
            b"POST /echo HTTP/1.1\r\nContent-Length: 50\r\n\r\n{\"a\":",  # truncated
            b"GET /ping HTTP/1.1\r\nContent-Length: -5\r\n\r\n",
            b"",  # connect-and-close
        ]
        for payload in cases:
            out = await raw(payload)
            # any outcome except a hang/crash is acceptable; most get an
            # HTTP error status line
            assert out == b"" or out == b"<timeout>" or out.startswith(b"HTTP/1.1"), (
                payload[:30],
                out[:60],
            )

        # the server is still healthy for real clients
        async with httpx.AsyncClient() as client:
            r = await client.get(f"http://127.0.0.1:{port}/ping?x=ok")
            assert r.status_code == 200 and r.json()["q"] == "ok"
        server.close()
        await server.wait_closed()

    asyncio.run(run())


def test_chunked_request_body():
    """Transfer-Encoding: chunked request bodies are decoded (the
    reference's uvicorn accepts these; webhook senders sometimes use
    them). Oversized chunked streams get 413."""

    async def run():
        app = _demo_app()
        server = await serve(app, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]
        try:
            reader, writer = await asyncio.open_connection("127.0.0.1", port)
            payload = json.dumps({"k": "chunked!"}).encode()
            half = len(payload) // 2
            writer.write(
                b"POST /echo HTTP/1.1\r\nhost: x\r\n"
                b"content-type: application/json\r\n"
                b"transfer-encoding: chunked\r\n\r\n"
                + f"{half:x}\r\n".encode() + payload[:half] + b"\r\n"
                + f"{len(payload) - half:x}\r\n".encode() + payload[half:] + b"\r\n"
                + b"0\r\n\r\n"
            )
            await writer.drain()
            status = await reader.readline()
            assert b"200" in status, status
            raw = status
            while True:
                line = await reader.readline()
                raw += line
                if line in (b"\r\n", b""):
                    break
            body = await asyncio.wait_for(reader.read(256), timeout=3)
            assert b"chunked!" in body, (raw, body)
            writer.close()

            # oversized chunked body -> 413, connection survives server
            reader, writer = await asyncio.open_connection("127.0.0.1", port)
            writer.write(
                b"POST /echo HTTP/1.1\r\nhost: x\r\n"
                b"transfer-encoding: chunked\r\n\r\n"
                + b"7fffffff\r\n"  # 2 GB chunk promised
            )
            await writer.drain()
            status = await reader.readline()
            assert b"413" in status, status
            writer.close()
        finally:
            server.close()
            await server.wait_closed()
            await app.shutdown()

    asyncio.run(run())
