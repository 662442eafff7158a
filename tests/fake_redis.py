"""Fake Redis server for bus-seam tests.

Speaks enough RESP2 over a real TCP socket to exercise
``storage/bus.py::RedisBus`` end-to-end with the real ``redis.asyncio``
client: LPUSH / BRPOP (actually blocking), GET / SET (with NX and EX) /
DEL / INCRBY, plus benign +OK replies to client-handshake chatter
(CLIENT SETINFO etc.). Key expiry honours EX. Same fake-backend seam
strategy as tests/fake_postgres.py / tests/fake_outline.py
(SURVEY.md section 4).
"""

from __future__ import annotations

import asyncio
import time


class FakeRedisServer:
    def __init__(self):
        self.kv: dict[str, tuple[bytes, float | None]] = {}
        self.lists: dict[str, list[bytes]] = {}
        self._cond: asyncio.Condition | None = None
        self._server: asyncio.AbstractServer | None = None
        self._stopping = False
        self._writers: set = set()
        self.port: int | None = None
        self.commands: list[list[str]] = []  # observed command log

    async def start(self) -> int:
        self._cond = asyncio.Condition()
        self._server = await asyncio.start_server(self._handle, "127.0.0.1", 0)
        self.port = self._server.sockets[0].getsockname()[1]
        return self.port

    async def stop(self) -> None:
        self._stopping = True
        if self._server is not None:
            self._server.close()
            # close live client connections: Python 3.12 wait_closed()
            # waits for every handler, and pooled clients keep theirs open
            for w in list(self._writers):
                try:
                    w.close()
                except Exception:
                    pass
            async with self._cond:
                self._cond.notify_all()  # release parked BRPOPs
            await self._server.wait_closed()

    # -- RESP ----------------------------------------------------------

    async def _read_command(self, reader) -> list[bytes] | None:
        line = await reader.readline()
        if not line:
            return None
        if not line.startswith(b"*"):
            # inline command
            return line.strip().split()
        n = int(line[1:].strip())
        parts = []
        for _ in range(n):
            hdr = await reader.readline()  # $<len>
            ln = int(hdr[1:].strip())
            data = await reader.readexactly(ln + 2)
            parts.append(data[:-2])
        return parts

    @staticmethod
    def _bulk(value: bytes | None) -> bytes:
        if value is None:
            return b"$-1\r\n"
        return b"$" + str(len(value)).encode() + b"\r\n" + value + b"\r\n"

    def _live(self, key: str) -> bytes | None:
        item = self.kv.get(key)
        if item is None:
            return None
        value, exp = item
        if exp is not None and time.monotonic() > exp:
            del self.kv[key]
            return None
        return value

    async def _handle(self, reader, writer) -> None:
        self._writers.add(writer)
        try:
            while True:
                parts = await self._read_command(reader)
                if parts is None:
                    break
                cmd = parts[0].decode().upper()
                args = parts[1:]
                self.commands.append([cmd] + [a.decode() for a in args])
                writer.write(await self._dispatch(cmd, args))
                await writer.drain()
        except (ConnectionError, asyncio.IncompleteReadError):
            pass
        finally:
            self._writers.discard(writer)
            writer.close()

    async def _dispatch(self, cmd: str, args: list[bytes]) -> bytes:
        if cmd == "LPUSH":
            key = args[0].decode()
            lst = self.lists.setdefault(key, [])
            for v in args[1:]:
                lst.insert(0, v)
            async with self._cond:
                self._cond.notify_all()
            return b":" + str(len(lst)).encode() + b"\r\n"
        if cmd == "BRPOP":
            key = args[0].decode()
            timeout = float(args[1]) if len(args) > 1 else 0.0
            deadline = time.monotonic() + timeout if timeout else None
            while True:
                if self._stopping:
                    return b"*-1\r\n"
                lst = self.lists.get(key)
                if lst:
                    value = lst.pop()
                    return (
                        b"*2\r\n"
                        + self._bulk(key.encode())
                        + self._bulk(value)
                    )
                async with self._cond:
                    try:
                        remain = (
                            None
                            if deadline is None
                            else max(deadline - time.monotonic(), 0.001)
                        )
                        await asyncio.wait_for(self._cond.wait(), remain)
                    except asyncio.TimeoutError:
                        return b"*-1\r\n"
        if cmd == "SET":
            key = args[0].decode()
            value = args[1]
            nx = False
            ex: float | None = None
            i = 2
            while i < len(args):
                opt = args[i].decode().upper()
                if opt == "NX":
                    nx = True
                    i += 1
                elif opt == "EX":
                    ex = float(args[i + 1])
                    i += 2
                else:
                    i += 1
            if nx and self._live(key) is not None:
                return b"$-1\r\n"  # NX conflict -> nil
            self.kv[key] = (
                value,
                time.monotonic() + ex if ex else None,
            )
            return b"+OK\r\n"
        if cmd == "GET":
            return self._bulk(self._live(args[0].decode()))
        if cmd == "DEL":
            n = 0
            for a in args:
                k = a.decode()
                n += int(self.kv.pop(k, None) is not None)
                n += int(self.lists.pop(k, None) is not None)
            return b":" + str(n).encode() + b"\r\n"
        if cmd == "INCRBY":
            key = args[0].decode()
            cur = self._live(key)
            val = int(cur or b"0") + int(args[1])
            self.kv[key] = (str(val).encode(), self.kv.get(key, (b"", None))[1])
            return b":" + str(val).encode() + b"\r\n"
        if cmd == "PING":
            return b"+PONG\r\n"
        # handshake chatter (CLIENT SETINFO, HELLO fallback, ...) — accept
        return b"+OK\r\n"
