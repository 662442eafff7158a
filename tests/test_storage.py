"""Bus + sqlite metadata store tests (reference semantics from SURVEY.md
section 2c: NX locks, queues, counters, idempotent KV)."""

import asyncio

from outline_rag_tpu.storage import InMemoryBus, SqliteMetaStore


def test_bus_nx_lock_and_expiry():
    async def run():
        bus = InMemoryBus()
        assert await bus.set_nx("lock", 1, ex=0.05)
        assert not await bus.set_nx("lock", 1, ex=0.05)
        await asyncio.sleep(0.08)
        assert await bus.set_nx("lock", 1, ex=10)
        await bus.delete("lock")
        assert await bus.set_nx("lock", 1)

    asyncio.run(run())


def test_bus_queue_and_counters():
    async def run():
        bus = InMemoryBus()
        await bus.push("q", {"task": "a"})
        await bus.push("q", {"task": "b"})
        assert (await bus.pop("q"))["task"] == "a"
        assert (await bus.pop("q"))["task"] == "b"
        assert await bus.pop("q", timeout=0.01) is None
        assert await bus.incr("n") == 1
        assert await bus.incr("n", 4) == 5
        assert await bus.get_counter("n") == 5

    asyncio.run(run())


def test_meta_users_conversations_messages():
    m = SqliteMetaStore(":memory:")
    m.upsert_user("u1", "Alice", "a@x")
    m.upsert_user("u1", "Alice2", "a@x")
    assert m.get_user("u1")["name"] == "Alice2"

    conv = m.create_conversation("c1", "u1", "hello")
    assert m.list_conversations("u1")[0]["id"] == "c1"
    assert m.rename_conversation("c1", "u1", "renamed")
    assert not m.rename_conversation("c1", "u2", "hax")  # ownership scoped

    m1 = m.add_message("c1", "user", "hi")
    m2 = m.add_message("c1", "assistant", "hello!")
    m3 = m.add_message("c1", "user", "more")
    assert [x["id"] for x in m.list_messages("c1")] == [m1, m2, m3]
    # edit-branch truncation (reference api.py:626-629)
    assert m.delete_messages_after("c1", m1) == 2
    assert len(m.list_messages("c1")) == 1

    assert not m.delete_conversation("c1", "u2")
    assert m.delete_conversation("c1", "u1")
    assert m.list_messages("c1") == []


def test_meta_kv_idempotent():
    m = SqliteMetaStore(":memory:")
    m.kv_mset("ns", [("k1", b"v1")])
    m.kv_mset("ns", [("k1", b"DIFFERENT")])  # idempotent: first write wins
    assert m.kv_mget("ns", ["k1", "k2"]) == [b"v1", None]
    m.kv_mdelete("ns", ["k1"])
    assert m.kv_mget("ns", ["k1"]) == [None]


def test_meta_documents_chunks():
    m = SqliteMetaStore(":memory:")
    m.upsert_document("d1", "Doc 1", "/doc/d1", "2026-01-01", "full text")
    m.replace_chunks("d1", [("ch1", 0, "full text", 0)])
    assert m.local_doc_versions() == {"d1": "2026-01-01"}
    assert m.get_chunk("ch1")["source_id"] == "d1"
    m.upsert_document("d1", "Doc 1", "/doc/d1", "2026-02-02", "new text")
    m.replace_chunks("d1", [("ch2", 0, "new text", 0)])
    assert m.get_chunk("ch1") is None
    assert m.local_doc_versions() == {"d1": "2026-02-02"}
    m.delete_document("d1")
    assert m.local_doc_versions() == {}
    assert m.get_chunk("ch2") is None
