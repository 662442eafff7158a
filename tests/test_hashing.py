"""HMAC webhook signature tests (reference: app/outline_client.py:130-140)."""

from outline_rag_tpu.utils.hashing import (
    embedding_cache_key,
    sign_webhook_body,
    stable_chunk_id,
    verify_webhook_signature,
)


def test_roundtrip_signature():
    body = b'{"event":"documents.update"}'
    sig = sign_webhook_body("s3cret", body)
    assert verify_webhook_signature("s3cret", body, sig)
    assert verify_webhook_signature("s3cret", body, "sha256=" + sig)
    assert verify_webhook_signature("s3cret", body, "Bearer " + sig)


def test_rejects_bad_signature():
    body = b"payload"
    sig = sign_webhook_body("s3cret", body)
    assert not verify_webhook_signature("s3cret", b"tampered", sig)
    assert not verify_webhook_signature("wrong", body, sig)
    assert not verify_webhook_signature("s3cret", body, None)
    assert not verify_webhook_signature("", body, sig)


def test_cache_key_scheme():
    k = embedding_cache_key("bge-m3", "hello")
    assert k.startswith("emb:bge-m3:")
    assert len(k.split(":")[-1]) == 64


def test_stable_chunk_id_deterministic():
    a = stable_chunk_id("doc1", 0, "text")
    b = stable_chunk_id("doc1", 0, "text")
    c = stable_chunk_id("doc1", 1, "text")
    assert a == b != c
