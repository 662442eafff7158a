"""Randomized stress of the paged-KV pool allocator (decode_batcher).

The allocator's invariants are load-bearing for serving correctness
(CLAUDE.md): page 0 is reserved scratch; a page on the free list must
never remain content-addressed in ``_prefix_map``; cached pages leave
the free list only via ``_evict_one``; refcounts never go negative; and
at quiescence every non-scratch page is accounted for exactly once
(free or cached — no leaks, no double-frees). The unit tests pin these
on hand-built scenarios; this test drives a small pool through ~12
random waves of concurrent submits sharing prefixes, mid-stream
cancellations, evictions, and admission backpressure (rollback of
already-ref'd shared pages), checking every invariant between waves.
"""

import time

import jax
import numpy as np
import pytest

from outline_rag_tpu.models.decoder import (
    DecoderConfig,
    cast_decoder_params,
    init_decoder_params,
    stack_decoder_params,
)
from outline_rag_tpu.serve.decode_batcher import DONE, DecodeBatcher


def _check_pool_invariants(b: DecodeBatcher) -> None:
    free = b._free_pages
    assert 0 not in free, "scratch page 0 on the free list"
    assert len(set(free)) == len(free), "duplicate page on the free list"
    assert b._page_ref[0] == 0 and 0 not in b._page_hash
    # _prefix_map and _page_hash must be inverse bijections
    assert {pg: h for h, pg in b._prefix_map.items()} == b._page_hash
    # a free page must never remain content-addressed (CLAUDE.md)
    assert not set(free) & set(b._page_hash), "free page still cached"
    assert all(r >= 0 for r in b._page_ref), "negative page refcount"


def _quiesce(b: DecodeBatcher, timeout: float = 120.0) -> None:
    deadline = time.time() + timeout
    while time.time() < deadline:
        s = b.stats()
        if s["active"] == 0 and s["queued"] == 0:
            time.sleep(0.05)  # let the worker park on its wake event
            return
        time.sleep(0.01)
    raise AssertionError("batcher never quiesced")


def _check_conservation(b: DecodeBatcher) -> None:
    """At quiescence: no refs held, and free ∪ cached = all pages."""
    assert all(r == 0 for r in b._page_ref)
    assert set(b._free_pages) | set(b._page_hash) == set(
        range(1, b.kv_pages)
    ), "page leaked (or double-freed) across a wave"


def test_paged_pool_random_waves_hold_invariants():
    cfg = DecoderConfig.tiny()
    params = stack_decoder_params(
        cast_decoder_params(init_decoder_params(jax.random.key(0), cfg), cfg.dtype)
    )
    # pool sized so two concurrent worst-case requests overcommit it:
    # admission backpressure (incl. shared-ref rollback) gets exercised
    batcher = DecodeBatcher(
        params, cfg, slots=2, chunk_tokens=4, eos_id=-1,
        kv_pages=12, page_size=8,
    )
    rng = np.random.default_rng(0)
    # shared prefixes of 2 and 4 full pages -> real cache hits across waves
    prefixes = [
        [int(x) for x in rng.integers(1, 200, size=16)],
        [int(x) for x in rng.integers(1, 200, size=32)],
        [],
    ]
    try:
        for wave in range(12):
            n_req = int(rng.integers(1, 4))
            streams = []
            for _ in range(n_req):
                prompt = list(prefixes[int(rng.integers(0, 3))]) + [
                    int(x) for x in rng.integers(1, 200, size=rng.integers(1, 21))
                ]
                max_new = int(rng.integers(2, 9))
                q = batcher.submit(prompt, 0.0, 1.0, max_new)
                streams.append((q, rng.random() < 0.3))
            for q, do_cancel in streams:
                if do_cancel:
                    item = q.get(timeout=60)  # consume at most one chunk
                    if item is not DONE:
                        if isinstance(item, Exception):
                            raise item
                        batcher.cancel(q)
                        while (nxt := q.get(timeout=60)) is not DONE:
                            if isinstance(nxt, Exception):
                                raise nxt
                else:
                    while (item := q.get(timeout=60)) is not DONE:
                        if isinstance(item, Exception):
                            raise item
            _quiesce(batcher)
            _check_pool_invariants(batcher)
            _check_conservation(batcher)
        assert batcher.prefix_hits > 0, "waves never shared a prefix"
    finally:
        batcher.close()
