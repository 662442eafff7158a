"""Fake PostgreSQL server for wire-protocol tests.

Speaks enough of the v3 frontend/backend protocol to exercise
``storage/pgwire.py`` end-to-end over a real TCP socket: startup,
trust / cleartext / MD5 / SCRAM-SHA-256 authentication, and the extended
query protocol (Parse/Bind/Describe/Execute/Sync). Statements execute
against an in-memory sqlite database through a small dialect rewrite
($N params, BIGSERIAL, BYTEA, advisory locks), which is enough for the
MetaStore's fixed query surface.

This is the same fake-backend seam strategy as tests/fake_outline.py
(SURVEY.md section 4).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os
import re
import socket
import sqlite3
import struct
import threading


def _msg(type_: bytes, payload: bytes) -> bytes:
    return type_ + struct.pack(">I", len(payload) + 4) + payload


class PgFramingError(Exception):
    """Client message violated exact-length framing (pq_getmsgend)."""


def _rewrite(sql: str) -> str:
    sql = re.sub(r"\$(\d+)", r"?\1", sql)
    sql = sql.replace("BIGSERIAL PRIMARY KEY", "INTEGER PRIMARY KEY AUTOINCREMENT")
    sql = sql.replace("BYTEA", "BLOB")
    sql = re.sub(r"SELECT pg_advisory_(un)?lock\(\d+\)", "SELECT 1", sql)
    return sql


def _oid_for(value) -> int:
    if isinstance(value, bool):
        return 16
    if isinstance(value, int):
        return 20
    if isinstance(value, float):
        return 701
    if isinstance(value, (bytes, memoryview)):
        return 17
    return 25


def _encode_text(value) -> bytes:
    if isinstance(value, bool):
        return b"t" if value else b"f"
    if isinstance(value, (bytes, memoryview)):
        return b"\\x" + bytes(value).hex().encode()
    return str(value).encode()


def make_self_signed_context():
    """Server SSLContext with a fresh self-signed cert (cryptography)."""
    import datetime
    import ssl
    import tempfile

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "fakepg")])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now)
        .not_valid_after(now + datetime.timedelta(days=1))
        .sign(key, hashes.SHA256())
    )
    with tempfile.NamedTemporaryFile(delete=False, suffix=".pem") as f:
        f.write(cert.public_bytes(serialization.Encoding.PEM))
        f.write(
            key.private_bytes(
                serialization.Encoding.PEM,
                serialization.PrivateFormat.TraditionalOpenSSL,
                serialization.NoEncryption(),
            )
        )
        path = f.name
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(path)
    return ctx


class _Conn:
    """Buffered socket wrapper (recv can return partial/merged frames)."""

    def __init__(self, sock):
        self.sock = sock
        self.buf = b""

    def starttls(self, ctx) -> None:
        assert not self.buf, "TLS upgrade with buffered plaintext"
        self.sock = ctx.wrap_socket(self.sock, server_side=True)

    def read_exact(self, n: int) -> bytes:
        while len(self.buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("client gone")
            self.buf += chunk
        out, self.buf = self.buf[:n], self.buf[n:]
        return out

    def sendall(self, data: bytes) -> None:
        self.sock.sendall(data)

    def close(self) -> None:
        self.sock.close()


class FakePostgresServer:
    """auth: "trust" | "cleartext" | "md5" | "scram"."""

    def __init__(
        self,
        auth: str = "trust",
        user: str = "u",
        password: str = "pw",
        ssl: str = "off",  # off (no SSLRequest expected) | refuse | on
    ):
        self.auth = auth
        self.user = user
        self.password = password
        self.ssl = ssl
        self.ssl_ctx = make_self_signed_context() if ssl == "on" else None
        # autocommit (isolation_level=None): explicit BEGIN/COMMIT from the
        # client pass through natively instead of fighting the implicit-
        # transaction machinery
        self.db = sqlite3.connect(
            ":memory:", check_same_thread=False, isolation_level=None
        )
        self.db_lock = threading.Lock()
        self._srv = socket.create_server(("127.0.0.1", 0))
        self.port = self._srv.getsockname()[1]
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def close(self) -> None:
        self._stop.set()
        try:
            self._srv.close()
        except OSError:
            pass

    # -- accept loop ------------------------------------------------------

    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(
                target=self._handle, args=(_Conn(conn),), daemon=True
            ).start()

    def _read_exact(self, conn: _Conn, n: int) -> bytes:
        return conn.read_exact(n)

    def _read_startup(self, conn) -> dict:
        while True:
            (length,) = struct.unpack(">I", self._read_exact(conn, 4))
            body = self._read_exact(conn, length - 4)
            (proto,) = struct.unpack(">I", body[:4])
            if proto == 80877103:  # SSLRequest
                if self.ssl == "on":
                    conn.sendall(b"S")
                    conn.starttls(self.ssl_ctx)
                else:
                    conn.sendall(b"N")
                continue
            break
        assert proto == 196608, proto
        parts = body[4:].split(b"\x00")
        params = {}
        for i in range(0, len(parts) - 1, 2):
            if parts[i]:
                params[parts[i].decode()] = parts[i + 1].decode()
        return params

    def _read_message(self, conn) -> tuple[bytes, bytes]:
        head = self._read_exact(conn, 5)
        (length,) = struct.unpack(">I", head[1:5])
        return head[:1], self._read_exact(conn, length - 4)

    # -- auth -------------------------------------------------------------

    def _authenticate(self, conn) -> bool:
        if self.auth == "trust":
            conn.sendall(_msg(b"R", struct.pack(">I", 0)))
            return True
        if self.auth == "cleartext":
            conn.sendall(_msg(b"R", struct.pack(">I", 3)))
            t, body = self._read_message(conn)
            ok = t == b"p" and body.rstrip(b"\x00").decode() == self.password
        elif self.auth == "md5":
            salt = os.urandom(4)
            conn.sendall(_msg(b"R", struct.pack(">I", 5) + salt))
            t, body = self._read_message(conn)
            inner = hashlib.md5(
                self.password.encode() + self.user.encode()
            ).hexdigest()
            want = "md5" + hashlib.md5(inner.encode() + salt).hexdigest()
            ok = t == b"p" and body.rstrip(b"\x00").decode() == want
        elif self.auth == "scram":
            ok = self._scram(conn)
        else:
            raise AssertionError(self.auth)
        if ok:
            conn.sendall(_msg(b"R", struct.pack(">I", 0)))
            return True
        conn.sendall(
            _msg(b"E", b"SFATAL\x00C28P01\x00Mpassword authentication failed\x00\x00")
        )
        return False

    def _scram(self, conn) -> bool:
        conn.sendall(_msg(b"R", struct.pack(">I", 10) + b"SCRAM-SHA-256\x00\x00"))
        t, body = self._read_message(conn)
        assert t == b"p"
        zero = body.index(b"\x00")
        (rlen,) = struct.unpack(">I", body[zero + 1 : zero + 5])
        client_first = body[zero + 5 : zero + 5 + rlen].decode()
        client_first_bare = client_first.split(",", 2)[2]
        client_nonce = dict(
            p.split("=", 1) for p in client_first_bare.split(",")
        )["r"]
        salt = os.urandom(16)
        iters = 4096
        server_nonce = client_nonce + base64.b64encode(os.urandom(9)).decode()
        server_first = (
            f"r={server_nonce},s={base64.b64encode(salt).decode()},i={iters}"
        )
        conn.sendall(
            _msg(b"R", struct.pack(">I", 11) + server_first.encode())
        )
        t, body = self._read_message(conn)
        assert t == b"p"
        client_final = body.decode()
        parts = dict(p.split("=", 1) for p in client_final.split(","))
        client_final_bare = client_final.rsplit(",p=", 1)[0]
        auth_message = ",".join(
            [client_first_bare, server_first, client_final_bare]
        ).encode()
        salted = hashlib.pbkdf2_hmac(
            "sha256", self.password.encode(), salt, iters
        )
        client_key = hmac.new(salted, b"Client Key", hashlib.sha256).digest()
        stored_key = hashlib.sha256(client_key).digest()
        client_sig = hmac.new(stored_key, auth_message, hashlib.sha256).digest()
        want_proof = bytes(a ^ b for a, b in zip(client_key, client_sig))
        got_proof = base64.b64decode(parts["p"])
        if not hmac.compare_digest(want_proof, got_proof):
            return False
        server_key = hmac.new(salted, b"Server Key", hashlib.sha256).digest()
        server_sig = hmac.new(server_key, auth_message, hashlib.sha256).digest()
        final = b"v=" + base64.b64encode(server_sig)
        conn.sendall(_msg(b"R", struct.pack(">I", 12) + final))
        return True

    # -- session ----------------------------------------------------------

    def _handle(self, conn) -> None:
        try:
            self._read_startup(conn)
            if not self._authenticate(conn):
                conn.close()
                return
            conn.sendall(
                _msg(b"S", b"server_version\x00fake-16.0\x00") + _msg(b"Z", b"I")
            )
            sql = ""
            params: list = []
            while True:
                t, body = self._read_message(conn)
                if t == b"X":
                    break
                if t == b"P":
                    # Strict framing, like pq_getmsgend: name cstring +
                    # sql cstring + int16 count + int32[count], no slack.
                    zero = body.index(b"\x00")
                    rest = body[zero + 1 :]
                    sql_end = rest.index(b"\x00")
                    sql = rest[:sql_end].decode()
                    tail = rest[sql_end + 1 :]
                    if len(tail) < 2:
                        raise PgFramingError("Parse: missing param-type count")
                    (ntypes,) = struct.unpack(">H", tail[:2])
                    if len(tail) != 2 + 4 * ntypes:
                        raise PgFramingError(
                            f"Parse: invalid message format "
                            f"({len(tail) - 2 - 4 * ntypes:+d} bytes)"
                        )
                    conn.sendall(_msg(b"1", b""))  # ParseComplete
                elif t == b"B":
                    params = self._parse_bind(body)
                    conn.sendall(_msg(b"2", b""))
                elif t == b"D":
                    pass  # RowDescription emitted with the result set
                elif t == b"E":
                    self._execute(conn, sql, params)
                elif t == b"S":
                    conn.sendall(_msg(b"Z", b"I"))
        except PgFramingError as exc:
            # Real PostgreSQL: FATAL 08P01 protocol_violation, then close.
            try:
                conn.sendall(
                    _msg(
                        b"E",
                        b"SFATAL\x00C08P01\x00M" + str(exc).encode() + b"\x00\x00",
                    )
                )
            except OSError:
                pass
        except (ConnectionError, OSError, struct.error):
            pass
        finally:
            conn.close()

    def _parse_bind(self, body: bytes) -> list:
        off = body.index(b"\x00") + 1
        off = body.index(b"\x00", off) + 1
        (nfmt,) = struct.unpack(">H", body[off : off + 2])
        off += 2 + 2 * nfmt
        (nparams,) = struct.unpack(">H", body[off : off + 2])
        off += 2
        params = []
        for _ in range(nparams):
            (length,) = struct.unpack(">i", body[off : off + 4])
            off += 4
            if length == -1:
                params.append(None)
                continue
            raw = body[off : off + length]
            off += length
            text = raw.decode()
            if text.startswith("\\x") and re.fullmatch(r"\\x[0-9a-fA-F]*", text):
                params.append(bytes.fromhex(text[2:]))
            else:
                params.append(text)
        return params

    @staticmethod
    def _expand_any(sql: str, params: list) -> tuple[str, list]:
        """Translate `col = ANY($N::text[])` (the array param must be the
        LAST parameter) into a sqlite IN (...) list."""
        m = re.search(r"=\s*ANY\(\$(\d+)::text\[\]\)", sql)
        if not m:
            return sql, params
        idx = int(m.group(1)) - 1
        assert idx == len(params) - 1, "ANY(array) must be the last param"
        lit = params[idx]
        items = [
            i.replace('\\"', '"').replace("\\\\", "\\")
            for i in re.findall(r'"((?:[^"\\]|\\.)*)"', lit)
        ]
        ph = ",".join(f"${idx + 1 + j}" for j in range(len(items))) or "NULL"
        sql = sql[: m.start()] + f"IN ({ph})" + sql[m.end():]
        return sql, params[:idx] + items

    def _execute(self, conn, sql: str, params: list) -> None:
        sql, params = self._expand_any(sql, params)
        try:
            with self.db_lock:
                cur = self.db.execute(_rewrite(sql), params)
                rows = cur.fetchall()
                if not self.db.in_transaction:
                    self.db.commit()  # no-op in autocommit; explicit txs own it
                rowcount = max(cur.rowcount, 0)
        except sqlite3.Error as e:
            conn.sendall(
                _msg(
                    b"E",
                    b"SERROR\x00C42601\x00M" + str(e).encode() + b"\x00\x00",
                )
            )
            return
        verb = sql.strip().split()[0].upper()
        if rows or verb == "SELECT" or "RETURNING" in sql.upper():
            ncols = len(rows[0]) if rows else 1
            oids = [25] * ncols
            for r in rows:
                for i, v in enumerate(r):
                    if v is not None and oids[i] == 25:
                        oids[i] = _oid_for(v)
            desc = struct.pack(">H", ncols)
            for i, oid in enumerate(oids):
                desc += (
                    f"c{i}".encode()
                    + b"\x00"
                    + struct.pack(">IHIhih", 0, 0, oid, -1, -1, 0)
                )
            conn.sendall(_msg(b"T", desc))
            for r in rows:
                dr = struct.pack(">H", len(r))
                for v in r:
                    if v is None:
                        dr += struct.pack(">i", -1)
                    else:
                        enc = _encode_text(v)
                        dr += struct.pack(">I", len(enc)) + enc
                conn.sendall(_msg(b"D", dr))
            rowcount = len(rows) if verb == "SELECT" else rowcount
        tag = {
            "INSERT": f"INSERT 0 {rowcount}",
            "UPDATE": f"UPDATE {rowcount}",
            "DELETE": f"DELETE {rowcount}",
            "SELECT": f"SELECT {len(rows)}",
        }.get(verb, verb)
        conn.sendall(_msg(b"C", tag.encode() + b"\x00"))
