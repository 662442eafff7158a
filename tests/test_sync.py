"""Delta-sync protocol tests: webhook -> debounce -> diff -> batch ingest ->
query (SURVEY.md sections 3.3/3.4), with the fake Outline server."""

import asyncio
import time

import pytest

from outline_rag_tpu.config import load_settings
from outline_rag_tpu.index import VectorIndex
from outline_rag_tpu.models.hash_embedder import HashEmbedder
from outline_rag_tpu.storage import InMemoryBus, SqliteMetaStore
from outline_rag_tpu.sync.outline import OutlineClient
from outline_rag_tpu.sync.refresh import (
    REFRESH_LOCK,
    TASK_QUEUE,
    WEBHOOK_TIMER,
    Ingestor,
    refresh_status,
)
from tests.fake_outline import FakeOutline

DIM = 128


def _settings():
    return load_settings(
        {
            "VECTOR_DIM": str(DIM),
            "REFRESH_BATCH_SIZE": "2",
            "CHUNK_SIZE": "256",
            "CHUNK_OVERLAP": "32",
        }
    )


@pytest.fixture
def world():
    fake = FakeOutline()
    fake.put_doc("d1", "Wolves", "wolves hunt in packs across the tundra", "t1")
    fake.put_doc("d2", "Rivers", "rivers carve canyons over millennia", "t1")
    fake.put_doc("d3", "Stars", "stars fuse hydrogen into helium", "t1")
    settings = _settings()
    client = OutlineClient("http://fake", "tok", transport=fake.transport())
    meta = SqliteMetaStore(":memory:")
    index = VectorIndex(dim=DIM, capacity=4096)
    bus = InMemoryBus()
    ing = Ingestor(client, meta, index, HashEmbedder(dim=DIM), bus, settings)
    return fake, ing, meta, index, bus


async def _drain_tasks(ing, bus):
    """Run queued tasks to completion (bounded, test-only drainer)."""
    for _ in range(50):
        item = await bus.pop(TASK_QUEUE, timeout=0.01)
        if item is None:
            return
        if item["task"] == "refresh_all":
            await ing.refresh_all()
        elif item["task"] == "process_doc_batch":
            await ing.process_doc_batch(item["ids"])


def test_initial_refresh_ingests_all(world):
    fake, ing, meta, index, bus = world

    async def run():
        await ing.refresh_all()
        await _drain_tasks(ing, bus)
        return await refresh_status(bus)

    status = asyncio.run(run())
    assert status["state"] == "done"
    assert status["success"] == 3
    assert meta.doc_count() == 3
    assert index.size >= 3
    ids, _ = index.query(HashEmbedder(dim=DIM).embed(["wolves pack tundra"]), k=1)
    assert meta.get_chunk(ids[0][0])["source_id"] == "d1"


def test_delta_update_and_delete(world):
    fake, ing, meta, index, bus = world

    async def run():
        await ing.refresh_all()
        await _drain_tasks(ing, bus)
        size_before = index.size
        # remote changes: d2 updated, d3 deleted, d4 added
        fake.put_doc("d2", "Rivers", "rivers flood the plains in spring", "t2")
        fake.delete_doc("d3")
        fake.put_doc("d4", "Moons", "moons orbit planets in resonance", "t1")
        fake.calls.clear()
        await ing.refresh_all()
        await _drain_tasks(ing, bus)
        return size_before

    asyncio.run(run())
    versions = meta.local_doc_versions()
    assert versions == {"d1": "t1", "d2": "t2", "d4": "t1"}
    # only changed docs were exported (delta, not full re-ingest)
    assert fake.calls.count("documents.export") == 2
    ids, _ = index.query(HashEmbedder(dim=DIM).embed(["rivers flood spring"]), k=1)
    assert meta.get_chunk(ids[0][0])["source_id"] == "d2"
    # d3 gone from index
    ids3, scores3 = index.query(
        HashEmbedder(dim=DIM).embed(["stars fuse hydrogen"]), k=3
    )
    srcs = {meta.get_chunk(c)["source_id"] for c in ids3[0] if meta.get_chunk(c)}
    assert "d3" not in srcs


def test_failed_doc_counts_skipped(world):
    fake, ing, meta, index, bus = world

    async def run():
        await ing.refresh_all()
        # sabotage one doc: remove from fake after listing
        fake.delete_doc("d2")
        await _drain_tasks(ing, bus)
        return await refresh_status(bus)

    status = asyncio.run(run())
    assert status["state"] == "done"
    assert status["success"] == 2
    assert status["skipped"] == 1


def test_webhook_debounce_triggers_refresh(world):
    fake, ing, meta, index, bus = world

    async def run():
        # simulate a webhook that set the timer in the past
        await bus.set(WEBHOOK_TIMER, time.time() - 1)
        task = asyncio.create_task(ing.webhook_watcher(poll_s=0.01))
        await asyncio.sleep(0.1)
        task.cancel()
        try:
            await task
        except asyncio.CancelledError:
            pass
        item = await bus.pop(TASK_QUEUE, timeout=0.01)
        return item, await bus.get(WEBHOOK_TIMER)

    item, timer = asyncio.run(run())
    assert item == {"task": "refresh_all"}
    assert timer is None  # consumed


def test_refresh_lock_released_when_no_work(world):
    fake, ing, meta, index, bus = world

    async def run():
        await ing.refresh_all()
        await _drain_tasks(ing, bus)
        # second refresh with no remote changes: no work enqueued, lock freed
        await bus.set_nx(REFRESH_LOCK, 1, ex=3600)
        await ing.refresh_all()
        return await bus.get(REFRESH_LOCK)

    lock = asyncio.run(run())
    assert lock is None


def test_embedding_cache_hit(world):
    fake, ing, meta, index, bus = world

    calls = []
    inner = ing.embedder.inner
    orig = inner.embed

    def counting(texts):
        calls.append(len(texts))
        return orig(texts)

    inner.embed = counting

    async def run():
        await ing.refresh_all()
        await _drain_tasks(ing, bus)
        first = sum(calls)
        calls.clear()
        # force re-ingest of an unchanged doc: cache must serve all chunks
        ing.ingest_document("d1", "Wolves",
                            "/doc/d1", "t1",
                            "wolves hunt in packs across the tundra")
        return first, sum(calls)

    first, second = asyncio.run(run())
    assert first > 0
    assert second == 0  # all embeddings served from the KV cache


def test_rebuild_from_store(world):
    """Restart semantics: a fresh (empty) index is reconstructed from the
    document table; the embedding cache serves all vectors."""
    fake, ing, meta, index, bus = world

    async def run():
        await ing.refresh_all()
        await _drain_tasks(ing, bus)

    asyncio.run(run())
    assert index.size > 0

    # simulate restart: new empty index, same meta store
    from outline_rag_tpu.index import VectorIndex
    from outline_rag_tpu.models.hash_embedder import HashEmbedder
    from outline_rag_tpu.sync.refresh import Ingestor

    fresh_index = VectorIndex(dim=DIM, capacity=4096)
    ing2 = Ingestor(ing.outline, meta, fresh_index, HashEmbedder(dim=DIM), bus, ing.s)
    calls = []
    inner = ing2.embedder.inner
    orig = inner.embed
    inner.embed = lambda texts: (calls.append(len(texts)), orig(texts))[1]
    n = ing2.rebuild_from_store()
    assert n == 3
    assert fresh_index.size == index.size
    assert sum(calls) == 0  # all embeddings came from the KV cache
    ids, _ = fresh_index.query(HashEmbedder(dim=DIM).embed(["stars fuse hydrogen"]), k=1)
    assert meta.get_chunk(ids[0][0])["source_id"] == "d3"


def test_collections_discovery_and_dedup():
    """With no OUTLINE_COLLECTIONS configured, the client enumerates
    collections.list and walks each collection (reference
    outline_client.py:64-88), deduplicating documents that appear in the
    listing more than once."""
    import httpx

    from outline_rag_tpu.sync.outline import OutlineClient

    fake = FakeOutline()
    fake.put_doc("a1", "Alpha", "alpha body", "t1", collection="col-a")
    fake.put_doc("a2", "Alpha2", "alpha two", "t1", collection="col-a")
    fake.put_doc("b1", "Beta", "beta body", "t2", collection="col-b")

    client = OutlineClient("http://fake", "tok", transport=fake.transport())

    async def run():
        return await client.list_docs()

    docs = asyncio.run(run())
    assert set(docs) == {"a1", "a2", "b1"}
    # discovery really went through collections.list + per-collection walks
    assert "collections.list" in fake.calls
    assert fake.calls.count("documents.list") == 2

    # configured collections skip discovery and restrict visibility
    fake.calls.clear()
    scoped = OutlineClient(
        "http://fake", "tok", collections=("col-b",), transport=fake.transport()
    )
    docs_b = asyncio.run(scoped.list_docs())
    assert set(docs_b) == {"b1"}
    assert "collections.list" not in fake.calls


def test_collections_discovery_empty():
    """No visible collections -> no documents (reference warns + returns
    empty, outline_client.py:77-79)."""
    from outline_rag_tpu.sync.outline import OutlineClient

    fake = FakeOutline()  # no docs -> no collections
    client = OutlineClient("http://fake", "tok", transport=fake.transport())
    docs = asyncio.run(client.list_docs())
    assert docs == {}


def test_failed_index_landing_is_retried_next_refresh(world):
    """meta must record the new updatedAt only AFTER the index landing:
    otherwise a failed add_chunks leaves the doc 'current' forever (the
    delta diff never retries it) while its old index rows dangle."""
    fake, ing, meta, index, bus = world

    async def run():
        await ing.refresh_all()
        await _drain_tasks(ing, bus)
        await refresh_status(bus)  # clear state
        # remote edit + an index that fails THIS landing
        fake.put_doc("d1", "Wolves", "updated wolf text entirely new", "t2")
        orig = index.add_chunks
        calls = {"n": 0}

        def failing(*a, **k):
            calls["n"] += 1
            raise RuntimeError("device failure")

        index.add_chunks = failing
        await ing.refresh_all()
        await _drain_tasks(ing, bus)
        await refresh_status(bus)
        assert calls["n"] == 1
        # updatedAt must NOT have advanced: the doc stays dirty
        assert meta.local_doc_versions()["d1"] == "t1"
        index.add_chunks = orig
        # next refresh retries and succeeds
        await ing.refresh_all()
        await _drain_tasks(ing, bus)
        assert meta.local_doc_versions()["d1"] == "t2"

    asyncio.run(run())


def test_refresh_lock_released_by_worker_without_status_poll(world):
    """Completing the queued batches must release REFRESH_LOCK from the
    worker side — webhook-driven refreshes finish with no UI polling."""
    fake, ing, meta, index, bus = world

    async def run():
        assert await bus.set_nx(REFRESH_LOCK, 1, ex=3600)
        await ing.refresh_all()
        await _drain_tasks(ing, bus)  # NO refresh_status() poll here
        assert await bus.get(REFRESH_LOCK) is None, "worker must unlock"
        st = await bus.get("refresh:status")
        assert st and st["state"] == "done"

    asyncio.run(run())


def test_webhook_timer_survives_running_refresh(world):
    """A due webhook timer must NOT be consumed while another refresh
    holds REFRESH_LOCK — the edit would be silently dropped."""
    fake, ing, meta, index, bus = world

    async def run():
        await bus.set(WEBHOOK_TIMER, time.time() - 1)  # due now
        assert await bus.set_nx(REFRESH_LOCK, 1, ex=3600)  # refresh running
        task = asyncio.create_task(ing.webhook_watcher(poll_s=0.01))
        await asyncio.sleep(0.1)
        task.cancel()
        try:
            await task
        except asyncio.CancelledError:
            pass
        assert await bus.get(WEBHOOK_TIMER) is not None, "timer dropped"
        assert await bus.pop(TASK_QUEUE, timeout=0.01) is None

    asyncio.run(run())


def test_outline_client_http2_tracks_h2_availability():
    """Reference parity nit (app/outline_client.py:27-28): the client
    requests HTTP/2 when the optional h2 package exists and must fall
    back to HTTP/1.1 (not crash) when it doesn't — httpx hard-errors on
    http2=True without h2."""
    from outline_rag_tpu.sync.outline import OutlineClient

    try:
        import h2  # noqa: F401

        have_h2 = True
    except ImportError:
        have_h2 = False

    client = OutlineClient("https://wiki.example", "tok")
    try:
        assert client.http2 is have_h2
    finally:
        asyncio.run(client.aclose())
