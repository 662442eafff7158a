"""Serving-while-updating stress: concurrent reader/writer threads on the
VectorIndex must never error or return tombstoned/foreign rows (the
single-writer + donated-buffer discipline of index/store.py)."""

import threading

import numpy as np

from outline_rag_tpu.index import VectorIndex

DIM = 64


def _vecs(rng, n):
    v = rng.standard_normal((n, DIM)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def test_concurrent_updates_and_queries():
    rng = np.random.default_rng(0)
    idx = VectorIndex(dim=DIM, capacity=8192)
    base = _vecs(rng, 50)
    idx.add_chunks([f"base{i}" for i in range(50)], base, source_id="base")

    errors: list[Exception] = []
    stop = threading.Event()

    def writer():
        wrng = np.random.default_rng(1)
        gen = 0
        try:
            while not stop.is_set():
                vecs = _vecs(wrng, 8)
                idx.add_chunks(
                    [f"d{gen}:{i}" for i in range(8)], vecs, source_id=f"doc{gen % 5}"
                )
                if gen % 3 == 0:
                    idx.delete_source(f"doc{(gen + 2) % 5}")
                gen += 1
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def reader():
        qrng = np.random.default_rng(2)
        try:
            for _ in range(40):
                q = _vecs(qrng, 2)
                ids, scores = idx.query(q, k=8)
                for row in ids:
                    for cid in row:
                        assert cid, "empty id returned"
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer)] + [
        threading.Thread(target=reader) for _ in range(3)
    ]
    for t in threads[1:]:
        t.start()
    threads[0].start()
    for t in threads[1:]:
        t.join()
    stop.set()
    threads[0].join()
    assert not errors, errors

    # index still consistent: base docs retrievable
    ids, scores = idx.query(base[7:8], k=1)
    assert ids[0][0] == "base7"


def test_readers_run_concurrently():
    """Two queries may hold read sections at the same time (queries no
    longer serialize behind one another)."""
    idx = VectorIndex(dim=DIM, capacity=2048)
    inside = threading.Event()
    proceed = threading.Event()
    overlapped = []

    def holder():
        with idx.read_section():
            inside.set()
            proceed.wait(timeout=10)

    def prober():
        inside.wait(timeout=10)
        with idx.read_section():
            overlapped.append(True)
        proceed.set()

    t1, t2 = threading.Thread(target=holder), threading.Thread(target=prober)
    t1.start(); t2.start()
    t1.join(timeout=15); t2.join(timeout=15)
    assert overlapped, "second reader blocked behind the first"


def test_writer_waits_for_readers_then_excludes():
    """A writer must drain in-flight readers before donating buffers, and
    a reader arriving during the write must see the post-write state."""
    rng = np.random.default_rng(0)
    idx = VectorIndex(dim=DIM, capacity=2048)
    idx.add_chunks(["a"], _vecs(rng, 1), source_id="s")

    reading = threading.Event()
    release = threading.Event()
    wrote = threading.Event()

    def reader():
        with idx.read_section():
            reading.set()
            release.wait(timeout=10)

    def writer():
        idx.add_chunks(["b"], _vecs(rng, 1), source_id="s2")
        wrote.set()

    rt = threading.Thread(target=reader)
    rt.start()
    reading.wait(timeout=10)
    wt = threading.Thread(target=writer)
    wt.start()
    # writer must be blocked while the reader is in-section
    assert not wrote.wait(timeout=0.3)
    release.set()
    assert wrote.wait(timeout=10)
    rt.join(); wt.join()
    assert idx.size == 2


def test_append_host_prep_does_not_block_queries(monkeypatch):
    """The expensive host-side part of a large append (normalization /
    quantization) happens OUTSIDE the write section: a concurrent query
    must complete while it runs (VERDICT round 1 item 5)."""
    import time

    import outline_rag_tpu.index.store as store_mod

    rng = np.random.default_rng(0)
    idx = VectorIndex(dim=DIM, capacity=16384)
    idx.add_chunks([f"w{i}" for i in range(32)], _vecs(rng, 32), source_id="warm")
    idx.query(_vecs(rng, 1), k=4)  # compile/warm the query program

    real = store_mod._normalize_rows
    in_prep = threading.Event()

    def slow_normalize(x):
        if x.shape[0] >= 1000:  # only the bulk ingest path
            in_prep.set()
            time.sleep(1.0)
        return real(x)

    monkeypatch.setattr(store_mod, "_normalize_rows", slow_normalize)

    done_query_at = []
    t0 = time.perf_counter()

    def writer():
        idx.add_chunks(
            [f"big{i}" for i in range(10_000)],
            rng.standard_normal((10_000, DIM)).astype(np.float32),
            source_id="big",
        )

    def reader():
        in_prep.wait(timeout=10)
        idx.query(_vecs(rng, 1), k=4)
        done_query_at.append(time.perf_counter() - t0)

    wt, rt = threading.Thread(target=writer), threading.Thread(target=reader)
    wt.start(); rt.start()
    rt.join(timeout=20); wt.join(timeout=30)
    assert done_query_at, "query never completed"
    # the query finished while the writer was still in its >=1.0 s prep
    # (not queued behind the whole append)
    assert done_query_at[0] < 1.0, done_query_at
    assert idx.size == 32 + 10_000
