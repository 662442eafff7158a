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
