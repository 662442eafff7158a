"""Continuous-batching tests: batched decoding must equal solo decoding
exactly for greedy requests (row isolation + per-row positions), under
concurrent admission, staggered joins, and slot reuse."""

import asyncio
import queue as _q
import threading

import jax
import numpy as np
import pytest

from outline_rag_tpu.models.decoder import DecoderConfig, init_decoder_params
from outline_rag_tpu.serve.decode_batcher import DONE, DecodeBatcher
from outline_rag_tpu.serve.llm import LocalChatProvider


class StubTok:
    eos_token_id = 0

    def encode(self, text: str):
        return [1 + (b % 250) for b in text.encode()][:60]

    def decode(self, ids):
        return "".join(chr(97 + (i % 26)) for i in ids)


@pytest.fixture(scope="module")
def setup():
    cfg = DecoderConfig.tiny()
    params = init_decoder_params(jax.random.key(0), cfg)
    return cfg, params


def collect(q):
    out = []
    while True:
        item = q.get(timeout=60)
        if item is DONE:
            return out
        if isinstance(item, Exception):
            raise item
        out.extend(item)


def solo_greedy(cfg, params, prompt_ids, max_new):
    """Reference: single-request greedy via the unbatched provider path."""
    prov = LocalChatProvider(
        params, cfg, StubTok(), chunk_tokens=4, max_new_tokens=max_new
    )
    ids = []

    class Cap:
        eos_token_id = 0

        def encode(self, t):
            return prompt_ids

        def decode(self, got):
            ids.clear()
            ids.extend(got)
            return "".join(chr(97 + (i % 26)) for i in got)

    prov.tokenizer = Cap()
    asyncio.run(prov.complete("m", [{"role": "user", "content": "x"}], temperature=0.0))
    return list(ids)


def test_batched_greedy_matches_solo(setup):
    cfg, params = setup
    from outline_rag_tpu.models.decoder import stack_decoder_params, cast_decoder_params

    stacked = stack_decoder_params(cast_decoder_params(params, cfg.dtype))
    batcher = DecodeBatcher(stacked, cfg, slots=3, chunk_tokens=4, eos_id=0)
    prompts = [
        [5, 9, 13, 2, 7],
        [100, 101, 102],
        [40, 41, 42, 43, 44, 45, 46],
    ]
    queues = [batcher.submit(p, 0.0, 1.0, 12) for p in prompts]
    got = [collect(q) for q in queues]
    for p, g in zip(prompts, got):
        want = solo_greedy(cfg, params, p, 12)
        assert g == want, (p, g, want)
    batcher.close()


def test_staggered_admission_and_slot_reuse(setup):
    cfg, params = setup
    from outline_rag_tpu.models.decoder import stack_decoder_params, cast_decoder_params

    stacked = stack_decoder_params(cast_decoder_params(params, cfg.dtype))
    batcher = DecodeBatcher(stacked, cfg, slots=2, chunk_tokens=4, eos_id=0)

    qa = batcher.submit([5, 9, 13], 0.0, 1.0, 10)
    first_a = qa.get(timeout=60)  # A mid-flight
    assert first_a is not DONE

    # B joins while A decodes; C queues behind the 2 slots and reuses one
    qb = batcher.submit([77, 78], 0.0, 1.0, 10)
    qc = batcher.submit([200, 201, 202, 203], 0.0, 1.0, 10)

    rest_a = collect(qa)
    got_a = (first_a if isinstance(first_a, list) else []) + rest_a
    got_b = collect(qb)
    got_c = collect(qc)

    assert got_a == solo_greedy(cfg, params, [5, 9, 13], 10)
    assert got_b == solo_greedy(cfg, params, [77, 78], 10)
    assert got_c == solo_greedy(cfg, params, [200, 201, 202, 203], 10)
    batcher.close()


def test_provider_batched_stream_parity(setup):
    """LocalChatProvider(batch_slots=2): two concurrent greedy streams
    must equal their sequential unbatched outputs."""
    cfg, params = setup
    prov_b = LocalChatProvider(
        params, cfg, StubTok(), chunk_tokens=4, max_new_tokens=10, batch_slots=2
    )
    prov_s = LocalChatProvider(
        params, cfg, StubTok(), chunk_tokens=4, max_new_tokens=10
    )

    async def run(prov, text):
        out = []
        async for d in prov.stream(
            "m", [{"role": "user", "content": text}], temperature=0.0, top_p=1.0
        ):
            out.append(d["content"])
        return "".join(out)

    async def both(prov):
        return await asyncio.gather(run(prov, "alpha"), run(prov, "beta"))

    batched = asyncio.run(both(prov_b))
    solo = [asyncio.run(run(prov_s, "alpha")), asyncio.run(run(prov_s, "beta"))]
    assert batched == solo
    prov_b._batcher.close()


def test_close_releases_waiters(setup):
    """close() must unblock in-flight and queued requests."""
    cfg, params = setup
    from outline_rag_tpu.models.decoder import (
        cast_decoder_params,
        stack_decoder_params,
    )

    stacked = stack_decoder_params(cast_decoder_params(params, cfg.dtype))
    batcher = DecodeBatcher(stacked, cfg, slots=1, chunk_tokens=2, eos_id=0)
    q1 = batcher.submit([5, 9], 0.0, 1.0, 1000)  # long-running
    q2 = batcher.submit([7, 7], 0.0, 1.0, 1000)  # queued behind 1 slot
    q1.get(timeout=30)  # first token flowing
    batcher.close()

    def drain(q):
        while True:
            item = q.get(timeout=10)
            if item is DONE:
                return True

    assert drain(q1) and drain(q2)


def test_worker_crash_fails_fast(setup):
    """A device/runtime error in the step loop must surface the exception
    to every in-flight request (not hang), mark the batcher dead, and make
    later submits fail fast."""
    cfg, params = setup
    from outline_rag_tpu.models.decoder import (
        cast_decoder_params,
        stack_decoder_params,
    )

    stacked = stack_decoder_params(cast_decoder_params(params, cfg.dtype))
    batcher = DecodeBatcher(stacked, cfg, slots=2, chunk_tokens=2, eos_id=0)

    boom = RuntimeError("simulated TPU runtime failure")

    def exploding_step(*a, **k):
        raise boom

    q1 = batcher.submit([5, 9, 13], 0.0, 1.0, 1000)
    q1.get(timeout=60)  # admitted, first token flowing
    batcher._step_chunk = exploding_step

    got = []
    while True:
        item = q1.get(timeout=30)
        if item is DONE:
            break
        got.append(item)
    assert any(isinstance(i, RuntimeError) for i in got)
    assert batcher.dead is boom

    with pytest.raises(RuntimeError, match="dead"):
        batcher.submit([1, 2], 0.0, 1.0, 10)
    batcher.close()


def test_spec_batcher_greedy_matches_solo(setup):
    """Speculative batcher (spec_k>0): greedy output must be bit-exact
    with solo greedy decoding — acceptance only changes how many
    forwards the tokens cost, never the tokens (per-row counts)."""
    cfg, params = setup
    from outline_rag_tpu.models.decoder import (
        cast_decoder_params,
        stack_decoder_params,
    )

    stacked = stack_decoder_params(cast_decoder_params(params, cfg.dtype))
    batcher = DecodeBatcher(
        stacked, cfg, slots=3, chunk_tokens=4, eos_id=0, spec_k=3,
        spec_gram=2,
    )
    prompts = [
        [5, 9, 13, 5, 9, 13, 5],  # repetitive: drafts fire
        [100, 101, 102],
        [40, 41, 42, 43, 44, 45, 46],
    ]
    queues = [batcher.submit(p, 0.0, 1.0, 12) for p in prompts]
    got = [collect(q) for q in queues]
    for p, g in zip(prompts, got):
        want = solo_greedy(cfg, params, p, 12)
        assert g == want, (p, g, want)
    # acceptance observability: tokens emitted per verify step across
    # the run (1.0 = drafts never accepted; spec_k+1 = ceiling)
    st = batcher.stats()
    assert st["spec_tokens_per_step"] is not None
    assert 0 < st["spec_tokens_per_step"] <= 3 + 1
    batcher.close()


def test_spec_batcher_staggered_admission(setup):
    """Admission mid-flight with speculation on: the token buffer row
    insert and per-row cursors keep rows isolated."""
    cfg, params = setup
    from outline_rag_tpu.models.decoder import (
        cast_decoder_params,
        stack_decoder_params,
    )

    stacked = stack_decoder_params(cast_decoder_params(params, cfg.dtype))
    batcher = DecodeBatcher(
        stacked, cfg, slots=2, chunk_tokens=4, eos_id=0, spec_k=2,
        spec_gram=2,
    )
    qa = batcher.submit([5, 9, 13], 0.0, 1.0, 10)
    first_a = qa.get(timeout=60)
    assert first_a is not DONE
    qb = batcher.submit([77, 78], 0.0, 1.0, 10)
    qc = batcher.submit([200, 201, 202, 203], 0.0, 1.0, 10)
    got_a = (first_a if isinstance(first_a, list) else []) + collect(qa)
    assert got_a == solo_greedy(cfg, params, [5, 9, 13], 10)
    assert collect(qb) == solo_greedy(cfg, params, [77, 78], 10)
    assert collect(qc) == solo_greedy(cfg, params, [200, 201, 202, 203], 10)
    batcher.close()


def test_paged_batcher_greedy_matches_solo(setup):
    """Paged-KV batcher (kv_pages>0): page-table indirection + pooled
    storage must not change a single token vs solo ring decoding."""
    cfg, params = setup  # tiny: max_cache=64
    from outline_rag_tpu.models.decoder import (
        cast_decoder_params,
        stack_decoder_params,
    )

    stacked = stack_decoder_params(cast_decoder_params(params, cfg.dtype))
    batcher = DecodeBatcher(
        stacked, cfg, slots=3, chunk_tokens=4, eos_id=0,
        kv_pages=16, page_size=16,
    )
    prompts = [
        [5, 9, 13, 2, 7],
        [100, 101, 102],
        [40, 41, 42, 43, 44, 45, 46],
    ]
    queues = [batcher.submit(p, 0.0, 1.0, 12) for p in prompts]
    got = [collect(q) for q in queues]
    for p, g in zip(prompts, got):
        assert g == solo_greedy(cfg, params, p, 12), (p, g)
    batcher.close()


def test_paged_batcher_backpressure_and_reuse(setup):
    """A pool too small for all requests at once: the third request is
    held until a finish frees its pages, then completes correctly on
    reused pages."""
    cfg, params = setup
    from outline_rag_tpu.models.decoder import (
        cast_decoder_params,
        stack_decoder_params,
    )

    stacked = stack_decoder_params(cast_decoder_params(params, cfg.dtype))
    # each request needs ceil((len+12+1)/16) = 2 pages; pool has page 0
    # reserved + 4 allocatable -> two concurrent requests max
    batcher = DecodeBatcher(
        stacked, cfg, slots=3, chunk_tokens=4, eos_id=0,
        kv_pages=5, page_size=16,
    )
    prompts = [[5, 9, 13], [77, 78, 79], [200, 201, 202, 203]]
    # the first two run long enough (6+ decode chunks) that they still
    # hold their pages when the third's admission is attempted — the
    # deferral itself must happen, not just resolve
    max_news = [24, 24, 12]
    queues = [
        batcher.submit(p, 0.0, 1.0, mn) for p, mn in zip(prompts, max_news)
    ]
    got = [collect(q) for q in queues]
    for p, mn, g in zip(prompts, max_news, got):
        assert g == solo_greedy(cfg, params, p, mn), (p, g)
    # all pages reclaimed after the last finish, and the deferral was
    # counted (the stats() signal the on-chip backpressure rung reads)
    assert len(batcher._free_pages) == 4
    assert batcher.stats()["backpressure_waits"] >= 1
    batcher.close()


def test_paged_spec_batcher_greedy_matches_solo(setup):
    """Paging composes with speculation (page-table writes + drafts)."""
    cfg, params = setup
    from outline_rag_tpu.models.decoder import (
        cast_decoder_params,
        stack_decoder_params,
    )

    stacked = stack_decoder_params(cast_decoder_params(params, cfg.dtype))
    batcher = DecodeBatcher(
        stacked, cfg, slots=2, chunk_tokens=4, eos_id=0,
        kv_pages=8, page_size=16, spec_k=2, spec_gram=2,
    )
    prompts = [[5, 9, 13, 5, 9, 13], [100, 101, 102]]
    queues = [batcher.submit(p, 0.0, 1.0, 10) for p in prompts]
    got = [collect(q) for q in queues]
    for p, g in zip(prompts, got):
        assert g == solo_greedy(cfg, params, p, 10), (p, g)
    batcher.close()


def test_prefix_cache_warm_equals_cold(setup):
    """Automatic prefix caching: a request repeating an earlier prompt's
    full pages skips their prefill yet produces bit-identical output,
    including when only the prefix (not the whole prompt) matches."""
    cfg, params = setup  # tiny: max_cache=64
    from outline_rag_tpu.models.decoder import (
        cast_decoder_params,
        stack_decoder_params,
    )

    stacked = stack_decoder_params(cast_decoder_params(params, cfg.dtype))
    prefix = [(7 * i) % 200 + 1 for i in range(16)]  # one full 16-token page
    pa = prefix + [5, 9, 13, 2]
    pc = prefix + [100, 101]  # same first page, different tail

    def cold(p):
        b = DecodeBatcher(
            stacked, cfg, slots=2, chunk_tokens=4, eos_id=0,
            kv_pages=16, page_size=16,
        )
        try:
            return collect(b.submit(p, 0.0, 1.0, 10))
        finally:
            b.close()

    batcher = DecodeBatcher(
        stacked, cfg, slots=2, chunk_tokens=4, eos_id=0,
        kv_pages=16, page_size=16,
    )
    try:
        got_a = collect(batcher.submit(pa, 0.0, 1.0, 10))
        assert batcher.prefix_hits == 0  # first sight: nothing to share
        got_b = collect(batcher.submit(pa, 0.0, 1.0, 10))  # exact repeat
        assert batcher.prefix_hits == 1
        got_c = collect(batcher.submit(pc, 0.0, 1.0, 10))  # prefix repeat
        assert batcher.prefix_hits == 2
    finally:
        batcher.close()
    assert got_b == got_a
    assert got_a == cold(pa)
    assert got_c == cold(pc)


def test_prefix_cache_eviction_under_pressure(setup):
    """Cached ref-0 pages are reclaimed (LRU) when a new request needs
    them; the evicted entries disappear and decoding stays correct."""
    cfg, params = setup
    from outline_rag_tpu.models.decoder import (
        cast_decoder_params,
        stack_decoder_params,
    )

    stacked = stack_decoder_params(cast_decoder_params(params, cfg.dtype))
    # pool: page 0 scratch + 4 allocatable (= maxp, the minimum legal)
    batcher = DecodeBatcher(
        stacked, cfg, slots=2, chunk_tokens=4, eos_id=0,
        kv_pages=5, page_size=16,
    )
    try:
        prefix = [(3 * i) % 150 + 1 for i in range(16)]
        collect(batcher.submit(prefix + [5], 0.0, 1.0, 8))
        assert len(batcher._prefix_map) == 1  # block 0 cached, ref 0
        # needs ceil((40+8+1)/16)=4 pages -> must evict the cached one
        big = [(11 * i) % 150 + 1 for i in range(40)]
        got = collect(batcher.submit(big, 0.0, 1.0, 8))
        assert got == solo_greedy(cfg, params, big, 8)
        # old entry evicted; the big prompt's own 2 full pages now cached
        assert len(batcher._prefix_map) == 2
        assert all(r == 0 for r in batcher._page_ref[1:])
    finally:
        batcher.close()


def test_prefix_cache_disabled(setup):
    """prefix_cache=False: no sharing, no registration, exact decoding."""
    cfg, params = setup
    from outline_rag_tpu.models.decoder import (
        cast_decoder_params,
        stack_decoder_params,
    )

    stacked = stack_decoder_params(cast_decoder_params(params, cfg.dtype))
    batcher = DecodeBatcher(
        stacked, cfg, slots=2, chunk_tokens=4, eos_id=0,
        kv_pages=16, page_size=16, prefix_cache=False,
    )
    try:
        p = [(7 * i) % 200 + 1 for i in range(20)]
        a = collect(batcher.submit(p, 0.0, 1.0, 10))
        b = collect(batcher.submit(p, 0.0, 1.0, 10))
        assert a == b
        assert batcher.prefix_hits == 0
        assert not batcher._prefix_map
    finally:
        batcher.close()


def test_per_request_seeds_diverge_and_reproduce(setup):
    """Batched sampling randomness is per-request: identical prompts with
    different seeds diverge; the same (seed, prompt) reproduces exactly;
    and the plain and speculative step programs emit identical streams
    (shared positional-key convention key_at(fold_in(KEY0, seed), q))."""
    cfg, params = setup
    from outline_rag_tpu.models.decoder import (
        cast_decoder_params,
        stack_decoder_params,
    )

    stacked = stack_decoder_params(cast_decoder_params(params, cfg.dtype))
    prompt = [5, 9, 13, 2, 7, 40, 41]

    def run(spec_k, seed):
        b = DecodeBatcher(
            stacked, cfg, slots=2, chunk_tokens=4, eos_id=0,
            spec_k=spec_k, spec_gram=2,
        )
        try:
            return collect(b.submit(prompt, 1.5, 0.95, 12, seed=seed))
        finally:
            b.close()

    plain_s1 = run(0, 1)
    plain_s2 = run(0, 2)
    assert plain_s1 != plain_s2  # different seeds -> different streams
    assert plain_s1 == run(0, 1)  # same seed reproduces
    assert plain_s1 == run(3, 1)  # spec == plain, same (seed, prompt)
    assert plain_s2 == run(3, 2)

    # concurrent identical prompts with different seeds in ONE batch
    b = DecodeBatcher(stacked, cfg, slots=2, chunk_tokens=4, eos_id=0)
    try:
        q1 = b.submit(prompt, 1.5, 0.95, 12, seed=1)
        q2 = b.submit(prompt, 1.5, 0.95, 12, seed=2)
        got1, got2 = collect(q1), collect(q2)
    finally:
        b.close()
    assert got1 == plain_s1
    assert got2 == plain_s2


def test_paged_rejects_indivisible_page_size(setup):
    cfg, params = setup  # max_cache=64
    from outline_rag_tpu.models.decoder import (
        cast_decoder_params,
        stack_decoder_params,
    )

    stacked = stack_decoder_params(cast_decoder_params(params, cfg.dtype))
    with pytest.raises(ValueError, match="not divisible"):
        DecodeBatcher(stacked, cfg, slots=2, eos_id=0,
                      kv_pages=8, page_size=24)


def test_kv_int8_batcher_generates_and_reproduces(setup):
    """int8 paged pool: the batcher serves requests end-to-end (right
    counts, eos handling) and a (seed, prompt) pair reproduces exactly —
    quantized KV is deterministic, so the whole stream is too. Token-level
    parity with the f32 ring is NOT asserted (quantization error can flip
    near-tie argmaxes on a random-init model); logits-level quality is
    pinned in tests/test_paged_attention.py."""
    cfg, params = setup
    from outline_rag_tpu.models.decoder import (
        cast_decoder_params,
        stack_decoder_params,
    )

    stacked = stack_decoder_params(cast_decoder_params(params, cfg.dtype))

    def run():
        b = DecodeBatcher(
            stacked, cfg, slots=2, chunk_tokens=4, eos_id=0,
            kv_pages=16, page_size=16, kv_int8=True,
        )
        try:
            qs = [
                b.submit([5, 9, 13, 2, 7], 0.0, 1.0, 12, seed=1),
                b.submit([(7 * i) % 200 + 1 for i in range(20)], 1.2, 0.95, 10, seed=2),
            ]
            out = [collect(q) for q in qs]
            assert b.stats()["kv_dtype"] == "int8"
            return out
        finally:
            b.close()

    first = run()
    assert len(first[0]) <= 12 and len(first[1]) <= 10
    assert len(first[0]) > 0 and len(first[1]) > 0
    assert first == run()  # deterministic given (seed, prompt)


def test_paged_multichunk_prefill_matches_solo(setup):
    """Prompts longer than the prefill-chunk width run several chunked
    paged prefills (positions advance across calls); output must still
    match solo ring decoding exactly, cold and warm."""
    cfg, params = setup  # max_cache=64
    from outline_rag_tpu.models.decoder import (
        cast_decoder_params,
        stack_decoder_params,
    )

    stacked = stack_decoder_params(cast_decoder_params(params, cfg.dtype))
    batcher = DecodeBatcher(
        stacked, cfg, slots=2, chunk_tokens=4, eos_id=0,
        kv_pages=16, page_size=16, prefill_chunk=16,  # force chunking
    )
    prompt = [(7 * i) % 200 + 1 for i in range(40)]  # 3 prefill chunks
    try:
        cold = collect(batcher.submit(prompt, 0.0, 1.0, 10))
        warm = collect(batcher.submit(prompt, 0.0, 1.0, 10))
        assert batcher.prefix_hits >= 2  # 2 full pages shared on repeat
    finally:
        batcher.close()
    want = solo_greedy(cfg, params, prompt, 10)
    assert cold == want, (cold, want)
    assert warm == cold


def test_paged_interleaved_admission_under_load(setup):
    """A long multi-chunk prompt admits while another stream decodes:
    chunked prefill interleaves with decode steps (bounded stall) and
    both streams still match solo decoding exactly."""
    cfg, params = setup
    from outline_rag_tpu.models.decoder import (
        cast_decoder_params,
        stack_decoder_params,
    )

    stacked = stack_decoder_params(cast_decoder_params(params, cfg.dtype))
    batcher = DecodeBatcher(
        stacked, cfg, slots=2, chunk_tokens=2, eos_id=0,
        kv_pages=16, page_size=16, prefill_chunk=16,
    )
    short = [5, 9, 13]
    long_p = [(3 * i) % 190 + 1 for i in range(44)]  # 3 prefill chunks
    try:
        qa = batcher.submit(short, 0.0, 1.0, 14)
        first = qa.get(timeout=60)  # A is decoding
        assert first is not DONE and not isinstance(first, Exception)
        qb = batcher.submit(long_p, 0.0, 1.0, 10)  # admits mid-decode
        got_a = (first if isinstance(first, list) else []) + collect(qa)
        got_b = collect(qb)
    finally:
        batcher.close()
    assert got_a == solo_greedy(cfg, params, short, 14)
    assert got_b == solo_greedy(cfg, params, long_p, 10)


def test_kv_int8_requires_paged_pool(setup):
    cfg, params = setup
    from outline_rag_tpu.models.decoder import (
        cast_decoder_params,
        stack_decoder_params,
    )

    stacked = stack_decoder_params(cast_decoder_params(params, cfg.dtype))
    with pytest.raises(ValueError, match="kv_int8 requires"):
        DecodeBatcher(stacked, cfg, slots=2, eos_id=0, kv_int8=True)


def test_all_features_compose(setup):
    """Speculation + paged pool + int8 KV + prefix cache in one batcher:
    serves, reproduces per (seed, prompt), and shares prefix pages."""
    cfg, params = setup
    from outline_rag_tpu.models.decoder import (
        cast_decoder_params,
        stack_decoder_params,
    )

    stacked = stack_decoder_params(cast_decoder_params(params, cfg.dtype))
    p = [(7 * i) % 200 + 1 for i in range(20)]

    def run():
        b = DecodeBatcher(
            stacked, cfg, slots=2, chunk_tokens=4, eos_id=0,
            spec_k=2, spec_gram=2, kv_pages=16, page_size=16,
            kv_int8=True, prefill_chunk=16,
        )
        try:
            a = collect(b.submit(p, 0.8, 0.95, 10, seed=7))
            c = collect(b.submit(p, 0.8, 0.95, 10, seed=7))  # warm
            assert b.prefix_hits >= 1
            return a, c
        finally:
            b.close()

    a1, c1 = run()
    assert a1 == c1  # warm == cold (quantized writes are deterministic)
    a2, _ = run()
    assert a1 == a2  # reproducible across batcher instances
    assert 0 < len(a1) <= 10


def test_cancel_reclaims_slot_and_pages(setup):
    """cancel(out): an abandoned stream's slot (and paged pool pages)
    are reclaimed at the next scheduling point; the queue still ends
    with DONE; pending cancels never get admitted."""
    import time as _time

    cfg, params = setup
    from outline_rag_tpu.models.decoder import (
        cast_decoder_params,
        stack_decoder_params,
    )

    stacked = stack_decoder_params(cast_decoder_params(params, cfg.dtype))
    b = DecodeBatcher(
        stacked, cfg, slots=1, chunk_tokens=2, eos_id=0,
        kv_pages=8, page_size=16,
    )
    try:
        q1 = b.submit([5, 9, 13], 0.0, 1.0, 40)
        first = q1.get(timeout=60)
        assert isinstance(first, list)
        q2 = b.submit([7, 8], 0.0, 1.0, 10)  # waits behind the 1 slot
        b.cancel(q1)
        got2 = collect(q2)  # can only complete if q1's slot was freed
        assert got2 == solo_greedy(cfg, params, [7, 8], 10)
        # q1 ended with DONE without producing all 40 tokens
        drained = []
        while True:
            item = q1.get(timeout=10)
            if item is DONE:
                break
            drained.extend(item)
        assert len(drained) < 40 - 1
        deadline = _time.time() + 10
        while _time.time() < deadline and b.stats()["pages_free"] != 7:
            _time.sleep(0.05)
        assert b.stats()["pages_free"] == 7  # all but scratch reclaimed
        assert b.stats()["active"] == 0
    finally:
        b.close()


def test_provider_stream_close_cancels_row(setup):
    """Closing the provider's async stream mid-generation frees the
    batcher slot (the abandoned-request path a client disconnect takes)."""
    import time as _time

    cfg, params = setup
    prov = LocalChatProvider(
        params, cfg, StubTok(), chunk_tokens=2, max_new_tokens=50,
        batch_slots=2,
    )

    async def run():
        gen = prov.stream("m", [{"role": "user", "content": "hello"}],
                          temperature=0.0)
        async for _ in gen:
            break  # take one piece, then abandon
        await gen.aclose()

    try:
        asyncio.run(run())
        deadline = _time.time() + 15
        while _time.time() < deadline and prov._batcher.stats()["active"]:
            _time.sleep(0.05)
        assert prov._batcher.stats()["active"] == 0
    finally:
        prov._batcher.close()


def test_concurrent_submit_cancel_fuzz(setup):
    """Many threads submitting and cancelling at random: every stream
    terminates with DONE, no deadlock, all slots and pages reclaimed."""
    import random
    import time as _time

    cfg, params = setup
    from outline_rag_tpu.models.decoder import (
        cast_decoder_params,
        stack_decoder_params,
    )

    stacked = stack_decoder_params(cast_decoder_params(params, cfg.dtype))
    b = DecodeBatcher(
        stacked, cfg, slots=2, chunk_tokens=2, eos_id=0,
        kv_pages=8, page_size=16,
    )
    results: list[bool] = []
    lock = threading.Lock()

    def one(seed):
        rng = random.Random(seed)
        q = b.submit(
            [rng.randrange(1, 200) for _ in range(rng.randrange(2, 30))],
            0.8, 0.95, rng.randrange(1, 20), seed=seed,
        )
        if rng.random() < 0.5:
            _time.sleep(rng.random() * 0.1)
            b.cancel(q)
        ok = False
        deadline = _time.time() + 120
        while _time.time() < deadline:
            try:
                item = q.get(timeout=1.0)
            except _q.Empty:
                continue
            if item is DONE:
                ok = True
                break
            assert not isinstance(item, Exception), item
        with lock:
            results.append(ok)

    try:
        threads = [
            threading.Thread(target=one, args=(i,)) for i in range(16)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        assert all(not t.is_alive() for t in threads)
        assert len(results) == 16 and all(results)
        deadline = _time.time() + 15
        while _time.time() < deadline and (
            b.stats()["active"]
            or b.stats()["pages_free"] + b.stats()["pages_cached"] != 7
        ):
            _time.sleep(0.05)
        st = b.stats()
        assert st["active"] == 0 and st["queued"] == 0
        # every page is either free or resident in the prefix cache
        assert st["pages_free"] + st["pages_cached"] == 7, st
        assert not b._live and not b._cancelled
    finally:
        b.close()


def test_burst_admissions_ramp_to_full_concurrency(setup):
    """A burst of paged arrivals must reach high decode concurrency
    fast: the worker burns idle-slot capacity on staged prefills (up to
    min(8, idle) chunks per iteration) instead of one chunk per decode
    step. With one-chunk-per-step ramp, 8 burst arrivals with 4-chunk
    prompts never overlap more than ~3 active rows while every step
    pays 8-row compute (the measured slot-scaling inversion)."""
    cfg, params = setup
    from outline_rag_tpu.models.decoder import (
        cast_decoder_params,
        stack_decoder_params,
    )

    stacked = stack_decoder_params(cast_decoder_params(params, cfg.dtype))
    b = DecodeBatcher(
        stacked, cfg, slots=8, chunk_tokens=1, eos_id=-1,
        kv_pages=48, page_size=8, prefill_chunk=8,
    )
    peak = [0]
    orig = b._step_chunk

    def counting_step(*a, **k):
        peak[0] = max(peak[0], sum(r is not None for r in b.active))
        return orig(*a, **k)

    b._step_chunk = counting_step
    try:
        qs = [
            b.submit(
                [(5 * i + 13 * j) % 190 + 1 for i in range(32)],
                0.0, 1.0, 8, seed=j + 1,
            )
            for j in range(8)
        ]
        outs = [collect(q) for q in qs]
    finally:
        b.close()
    assert all(len(o) == 8 for o in outs)
    assert peak[0] >= 6, f"burst only reached {peak[0]} concurrent rows"


def test_submit_after_close_raises(setup):
    """A submit racing (or following) a clean close() must fail fast —
    an enqueued request would never be drained and the caller would
    block forever on its queue."""
    cfg, params = setup
    from outline_rag_tpu.models.decoder import (
        cast_decoder_params,
        stack_decoder_params,
    )

    stacked = stack_decoder_params(cast_decoder_params(params, cfg.dtype))
    b = DecodeBatcher(stacked, cfg, slots=2, chunk_tokens=2, eos_id=0)
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit([5, 9], 0.0, 1.0, 4)
