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


def test_slowloris_connection_is_reaped():
    """A client that sends half a request and stalls must be disconnected
    after the request timeout — not pin the connection task forever."""
    from outline_rag_tpu.serve.http import ServerLimits

    async def run():
        app = _demo_app()
        limits = ServerLimits(request_timeout=0.3)
        server = await serve(app, "127.0.0.1", 0, limits=limits)
        port = server.sockets[0].getsockname()[1]
        try:
            reader, writer = await asyncio.open_connection("127.0.0.1", port)
            writer.write(b"GET /ping HTTP/1.1\r\nhost: x\r\n")  # half headers
            await writer.drain()
            # trickle a byte to prove trickling can't extend the window
            await asyncio.sleep(0.15)
            writer.write(b"x")
            await writer.drain()
            # server must close within the timeout regardless
            data = await asyncio.wait_for(reader.read(), timeout=2.0)
            assert data == b""  # clean close, no response bytes
            writer.close()
            # and the server still works for a well-behaved client
            async with httpx.AsyncClient() as client:
                r = await client.get(f"http://127.0.0.1:{port}/ping")
                assert r.status_code == 200
        finally:
            server.close()
            await server.wait_closed()

    asyncio.run(run())


def test_max_connections_503():
    """Connections above the cap receive an immediate 503 and close."""
    from outline_rag_tpu.serve.http import ServerLimits

    async def run():
        app = _demo_app()
        limits = ServerLimits(request_timeout=5.0, max_connections=2)
        server = await serve(app, "127.0.0.1", 0, limits=limits)
        port = server.sockets[0].getsockname()[1]
        try:
            # two held-open connections fill the cap
            holders = [
                await asyncio.open_connection("127.0.0.1", port)
                for _ in range(2)
            ]
            await asyncio.sleep(0.05)  # let the server register them
            r3, w3 = await asyncio.open_connection("127.0.0.1", port)
            w3.write(b"GET /ping HTTP/1.1\r\nhost: x\r\n\r\n")
            await w3.drain()
            data = await asyncio.wait_for(r3.readline(), timeout=2.0)
            assert b"503" in data
            w3.close()
            for r, w in holders:
                w.close()
            await asyncio.sleep(0.05)
            # capacity released: a new client is served normally
            async with httpx.AsyncClient() as client:
                resp = await client.get(f"http://127.0.0.1:{port}/ping")
                assert resp.status_code == 200
        finally:
            server.close()
            await server.wait_closed()

    asyncio.run(run())


def test_keepalive_request_cap():
    """A connection is closed after max_keepalive_requests requests."""
    from outline_rag_tpu.serve.http import ServerLimits

    async def run():
        app = _demo_app()
        limits = ServerLimits(request_timeout=5.0, max_keepalive_requests=3)
        server = await serve(app, "127.0.0.1", 0, limits=limits)
        port = server.sockets[0].getsockname()[1]
        try:
            reader, writer = await asyncio.open_connection("127.0.0.1", port)
            req = b"GET /ping HTTP/1.1\r\nhost: x\r\n\r\n"
            for i in range(3):
                writer.write(req)
                await writer.drain()
                line = await reader.readline()
                assert b"200" in line
                # drain this response's headers+body
                while True:
                    h = await reader.readline()
                    if h in (b"\r\n", b""):
                        break
                    if h.lower().startswith(b"content-length:"):
                        n = int(h.split(b":")[1])
                await reader.readexactly(n)
            # 3rd response was marked connection: close -> EOF now
            data = await asyncio.wait_for(reader.read(), timeout=2.0)
            assert data == b""
            writer.close()
        finally:
            server.close()
            await server.wait_closed()

    asyncio.run(run())


def test_stream_cap_503():
    """Concurrent SSE streams beyond max_streams get a 503 JSON error."""
    from outline_rag_tpu.serve.http import Response, ServerLimits

    app = App(secret_key="s")
    release = asyncio.Event()

    @app.get("/slow-stream")
    async def slow_stream(req: Request) -> Response:
        async def gen():
            yield b"data: started\n\n"
            await release.wait()
            yield b"data: [DONE]\n\n"

        return Response.streaming(gen())

    async def run():
        limits = ServerLimits(request_timeout=5.0, max_streams=1)
        server = await serve(app, "127.0.0.1", 0, limits=limits)
        port = server.sockets[0].getsockname()[1]
        base = f"http://127.0.0.1:{port}"
        try:
            async with httpx.AsyncClient(timeout=5.0) as client:

                async def occupy():
                    async with client.stream("GET", base + "/slow-stream") as r:
                        async for _line in r.aiter_lines():
                            if "started" in _line:
                                # stream 1 open; stream 2 must be rejected
                                r2 = await client.get(base + "/slow-stream")
                                assert r2.status_code == 503
                                release.set()

                await occupy()
        finally:
            server.close()
            await server.wait_closed()

    asyncio.run(run())


def test_run_drains_on_sigterm(tmp_path):
    """run(): SIGTERM stops accepting, drains, runs shutdown hooks, and
    exits 0 (the uvicorn-parity graceful path Docker relies on)."""
    import os
    import signal
    import socket
    import subprocess
    import sys
    import time

    marker = tmp_path / "shutdown.txt"
    script = tmp_path / "srv.py"
    script.write_text(
        "import sys\n"
        f"sys.path.insert(0, {repr(os.getcwd())})\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from outline_rag_tpu.serve.http import App, Response, run\n"
        "app = App(secret_key='k')\n"
        "@app.get('/ping')\n"
        "async def ping(req):\n"
        "    return Response.json({'ok': True})\n"
        "async def on_stop():\n"
        f"    open({repr(str(marker))}, 'w').write('done')\n"
        "app.on_shutdown.append(on_stop)\n"
        f"run(app, host='127.0.0.1', port={0}, drain_timeout=3.0)\n"
    )
    # pick a free port first (run() binds it directly)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    script.write_text(script.read_text().replace("port=0", f"port={port}"))

    proc = subprocess.Popen(
        [sys.executable, str(script)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    try:
        deadline = time.time() + 30
        up = False
        while time.time() < deadline:
            try:
                c = socket.create_connection(("127.0.0.1", port), timeout=0.5)
                c.sendall(b"GET /ping HTTP/1.1\r\nhost: x\r\n\r\n")
                if b"200" in c.recv(4096):
                    up = True
                c.close()
                if up:
                    break
            except OSError:
                time.sleep(0.2)
        assert up, "server never came up"
        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=15) == 0
        assert marker.read_text() == "done"
    finally:
        if proc.poll() is None:
            proc.kill()


def test_stream_generator_closed_on_client_disconnect():
    """A client that vanishes mid-SSE must close the response generator
    deterministically (downstream cleanup like decode-slot cancellation
    hangs off its finally)."""
    import asyncio

    from outline_rag_tpu.serve.http import App, Response, serve

    app = App(secret_key="k")
    closed = asyncio.Event()

    @app.get("/sse")
    async def sse(req):
        async def gen():
            try:
                for i in range(10_000):
                    yield f"data: {i}\n\n".encode()
                    await asyncio.sleep(0.01)
            finally:
                closed.set()

        return Response.streaming(gen())

    async def run():
        server = await serve(app, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]
        r, w = await asyncio.open_connection("127.0.0.1", port)
        w.write(b"GET /sse HTTP/1.1\r\nhost: x\r\n\r\n")
        await w.drain()
        await r.read(256)  # headers + first chunks arriving
        w.close()  # vanish mid-stream
        await asyncio.wait_for(closed.wait(), timeout=10)
        server.close()
        await app.shutdown()

    asyncio.run(run())


def test_sigterm_drain_covers_inflight_handler(tmp_path):
    """in_flight must cover the HANDLER, not just the response write: a
    SIGTERM arriving while a slow request executes inside app.handle has
    to hold the drain window open so the response completes before
    shutdown hooks run."""
    import os
    import signal
    import socket
    import subprocess
    import sys
    import threading
    import time

    marker = tmp_path / "shutdown.txt"
    script = tmp_path / "srv.py"
    script.write_text(
        "import sys\n"
        f"sys.path.insert(0, {repr(os.getcwd())})\n"
        "import asyncio\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from outline_rag_tpu.serve.http import App, Response, run\n"
        "app = App(secret_key='k')\n"
        "@app.get('/ping')\n"
        "async def ping(req):\n"
        "    return Response.json({'ok': True})\n"
        "@app.get('/slow')\n"
        "async def slow(req):\n"
        "    await asyncio.sleep(1.5)\n"
        "    return Response.json({'slow': True})\n"
        "async def on_stop():\n"
        f"    open({repr(str(marker))}, 'w').write('done')\n"
        "app.on_shutdown.append(on_stop)\n"
        "run(app, host='127.0.0.1', port=PORT, drain_timeout=8.0)\n"
    )
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    script.write_text(script.read_text().replace("PORT", str(port)))
    proc = subprocess.Popen(
        [sys.executable, str(script)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    try:
        deadline = time.time() + 30
        up = False
        while time.time() < deadline:
            try:
                c = socket.create_connection(("127.0.0.1", port), timeout=0.5)
                c.sendall(b"GET /ping HTTP/1.1\r\nhost: x\r\n\r\n")
                if b"200" in c.recv(4096):
                    up = True
                c.close()
                if up:
                    break
            except OSError:
                time.sleep(0.2)
        assert up, "server never came up"

        got = {}

        def slow_req():
            c = socket.create_connection(("127.0.0.1", port), timeout=10)
            c.sendall(b"GET /slow HTTP/1.1\r\nhost: x\r\nconnection: close\r\n\r\n")
            buf = b""
            try:
                while True:
                    part = c.recv(4096)
                    if not part:
                        break
                    buf += part
            finally:
                c.close()
            got["resp"] = buf

        t = threading.Thread(target=slow_req)
        t.start()
        time.sleep(0.5)  # request is inside the handler's sleep now
        proc.send_signal(signal.SIGTERM)
        t.join(timeout=12)
        assert proc.wait(timeout=15) == 0
        assert b'"slow": true' in got.get("resp", b""), got.get("resp")
        assert marker.read_text() == "done"
    finally:
        if proc.poll() is None:
            proc.kill()
