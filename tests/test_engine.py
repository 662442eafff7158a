"""Engine tests: staged retrieval, the fused single-program path, and the
micro-batcher (SURVEY.md section 7 step 4)."""

import asyncio

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from outline_rag_tpu.engine.batcher import QueryBatcher
from outline_rag_tpu.engine.embedder import EncoderEmbedder
from outline_rag_tpu.engine.rerank import CrossEncoderReranker, NoopReranker
from outline_rag_tpu.engine.service import RetrievalService
from outline_rag_tpu.index import VectorIndex
from outline_rag_tpu.models.encoder import EncoderConfig, init_encoder_params
from outline_rag_tpu.models.hash_embedder import HashEmbedder
from outline_rag_tpu.models.reranker import init_reranker_params
from outline_rag_tpu.models.tokenizer import HashTokenizer

DOCS = {
    "alpha": "the alpha wolf leads the pack through the snowy forest",
    "beta": "beta testing of the new release starts on monday",
    "gamma": "gamma radiation is measured with a geiger counter",
    "delta": "the river delta spreads into many small channels",
}


def _build_hash_service(rerank=False):
    emb = HashEmbedder(dim=256)
    idx = VectorIndex(dim=256, capacity=2048)
    texts = {}
    for name, text in DOCS.items():
        cid = f"{name}:0"
        texts[cid] = text
        idx.add_chunks([cid], emb.embed([text]), source_id=name)
    svc = RetrievalService(
        idx,
        emb,
        NoopReranker(),
        top_k=4,
        rerank_k=2,
        chunk_text_lookup=texts.get,
    )
    return svc


def test_staged_retrieval_finds_right_doc():
    svc = _build_hash_service()
    res = svc.retrieve("wolf pack in the forest")
    assert res, "expected results"
    assert res[0].chunk_id == "alpha:0"


def test_staged_empty_index():
    emb = HashEmbedder(dim=128)
    idx = VectorIndex(dim=128, capacity=2048)
    svc = RetrievalService(idx, emb, top_k=4, rerank_k=2)
    assert svc.retrieve("anything") == []


@pytest.fixture(scope="module")
def tiny_models():
    cfg = EncoderConfig.tiny()
    enc_params = init_encoder_params(jax.random.key(0), cfg)
    rr_params = init_reranker_params(jax.random.key(1), cfg)
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    emb = EncoderEmbedder(
        enc_params, cfg, tok, max_tokens=64, seq_buckets=(32, 64), name="tiny"
    )
    rr = CrossEncoderReranker(rr_params, cfg, tok, max_tokens=128)
    return emb, rr


def test_fused_engine_end_to_end(tiny_models):
    emb, rr = tiny_models
    idx = VectorIndex(dim=emb.dim, capacity=2048, token_width=32)
    for name, text in DOCS.items():
        cid = f"{name}:0"
        vec = emb.embed([text])
        tb = emb.tokenizer.batch([text], 32, buckets=(32,))
        idx.add_chunks(
            [cid], vec, source_id=name,
            token_ids=tb.input_ids, token_mask=tb.attention_mask,
        )
    svc = RetrievalService(idx, emb, rr, top_k=4, rerank_k=2)
    assert svc.fused
    out = svc.retrieve_batch(["alpha wolf pack forest", "geiger counter radiation"])
    assert len(out) == 2
    # fused path returns at most rerank_k live candidates
    assert 1 <= len(out[0]) <= 2
    all_ids = {c.chunk_id for row in out for c in row}
    assert all_ids <= {f"{n}:0" for n in DOCS}


def test_fused_retrieval_stage_matches_staged(tiny_models):
    """The retrieval (pre-rerank) stage of the fused program must agree
    with the staged path's index query."""
    emb, rr = tiny_models
    idx = VectorIndex(dim=emb.dim, capacity=2048, token_width=32)
    for name, text in DOCS.items():
        cid = f"{name}:0"
        tb = emb.tokenizer.batch([text], 32, buckets=(32,))
        idx.add_chunks(
            [cid], emb.embed([text]), source_id=name,
            token_ids=tb.input_ids, token_mask=tb.attention_mask,
        )
    q = "beta release testing monday"
    staged_ids, _ = idx.query(emb.embed([q]), k=4)

    from outline_rag_tpu.engine.fused import FusedEngine

    fe = FusedEngine(emb, rr, idx, top_k=4, rerank_k=4)
    fused_out = fe.query([q])[0]
    fused_ids = {cid for cid, _rr, _dense in fused_out}
    assert fused_ids == set(staged_ids[0])


def test_batcher_coalesces():
    svc = _build_hash_service()
    calls = []

    def batch_fn(queries):
        calls.append(list(queries))
        return svc.retrieve_batch(queries)

    async def run():
        b = QueryBatcher(batch_fn, window_ms=50, max_batch=8)
        await b.start()
        res = await asyncio.gather(
            b.retrieve("wolf forest"),
            b.retrieve("geiger counter"),
            b.retrieve("river channels"),
        )
        await b.stop()
        return res

    res = asyncio.run(run())
    assert len(res) == 3
    assert res[0][0].chunk_id == "alpha:0"
    assert res[1][0].chunk_id == "gamma:0"
    assert res[2][0].chunk_id == "delta:0"
    # all three arrived within the window -> fewer batches than queries
    assert len(calls) < 3


def test_fused_query_warm_covers_post_growth_queries(tiny_models):
    """The engine registers itself as the index's capacity warm hook:
    after a growth, queries at already-served batch sizes hit the
    pre-compiled fused program (no new jit-cache entry inside the
    post-growth read section)."""
    from outline_rag_tpu.engine import fused as fused_mod
    from outline_rag_tpu.engine.fused import FusedEngine

    emb, rr = tiny_models
    idx = VectorIndex(dim=emb.dim, capacity=1024, token_width=32)
    texts = [f"document number {i} about subject {i % 5}" for i in range(1000)]
    tb = emb.tokenizer.batch(texts, 32, buckets=(32,))
    idx.add_chunks(
        [f"d{i}" for i in range(1000)],
        emb.embed(texts),
        source_id="bulk",
        token_ids=tb.input_ids,
        token_mask=tb.attention_mask,
    )
    fe = FusedEngine(emb, rr, idx, top_k=4, rerank_k=2)
    fe.query(["subject 3"])  # records batch size 1
    assert fe._seen_batches == {1}

    # trigger growth (pre-lock warm runs the fused program at 2048)
    more = [f"extra document {i}" for i in range(200)]
    tb2 = emb.tokenizer.batch(more, 32, buckets=(32,))
    idx.add_chunks(
        [f"e{i}" for i in range(200)],
        emb.embed(more),
        source_id="extra",
        token_ids=tb2.input_ids,
        token_mask=tb2.attention_mask,
    )
    assert idx._shard.capacity == 2048
    n = fused_mod.fused_query._cache_size()
    out = fe.query(["extra document"])
    assert out and out[0], out
    assert fused_mod.fused_query._cache_size() == n, (
        "post-growth query recompiled despite the warm hook"
    )


def test_fused_query_pads_to_power_of_two_buckets(tiny_models):
    """Concurrent serving produces many distinct batch sizes; the fused
    engine pads each to a power-of-two bucket so the program-variant
    count stays log2(max_batch) (a compile through the remote tunnel is
    20-70 s — an unbucketed busy burst is a compile storm). Results for
    the real rows must be unaffected."""
    from outline_rag_tpu.engine.fused import FusedEngine

    emb, rr = tiny_models
    idx = VectorIndex(dim=emb.dim, capacity=2048, token_width=32)
    for name, text in DOCS.items():
        tb = emb.tokenizer.batch([text], 32, buckets=(32,))
        idx.add_chunks(
            [f"{name}:0"], emb.embed([text]), source_id=name,
            token_ids=tb.input_ids, token_mask=tb.attention_mask,
        )
    fe = FusedEngine(emb, rr, idx, top_k=4, rerank_k=2)
    out3 = fe.query(["alpha wolf pack", "geiger radiation", "river delta"])
    assert len(out3) == 3 and all(row for row in out3)
    assert fe._seen_batches == {4}
    out1 = fe.query(["alpha wolf pack"])
    assert len(out1) == 1
    assert fe._seen_batches == {1, 4}
    # the padded batch returns the same ids as the exact-size batch
    assert [c for c, *_ in out3[0]] == [c for c, *_ in out1[0]]


def test_fused_query_empty_batch(tiny_models):
    from outline_rag_tpu.engine.fused import FusedEngine

    emb, rr = tiny_models
    idx = VectorIndex(dim=emb.dim, capacity=2048, token_width=32)
    tb = emb.tokenizer.batch(["doc"], 32, buckets=(32,))
    idx.add_chunks(
        ["d:0"], emb.embed(["doc"]), source_id="d",
        token_ids=tb.input_ids, token_mask=tb.attention_mask,
    )
    fe = FusedEngine(emb, rr, idx, top_k=4, rerank_k=2)
    assert fe.query([]) == []


def test_replaced_engine_hook_is_pruned(tiny_models):
    """The index holds engine warm hooks weakly: rebuilding the engine
    over a long-lived index must not pin the old engine (and its param
    trees) or run its warm compiles forever."""
    import gc

    from outline_rag_tpu.engine.fused import FusedEngine

    emb, rr = tiny_models
    idx = VectorIndex(dim=emb.dim, capacity=2048, token_width=32)
    tb = emb.tokenizer.batch(["doc"], 32, buckets=(32,))
    idx.add_chunks(
        ["d:0"], emb.embed(["doc"]), source_id="d",
        token_ids=tb.input_ids, token_mask=tb.attention_mask,
    )
    fe1 = FusedEngine(emb, rr, idx, top_k=4, rerank_k=2)
    fe2 = FusedEngine(emb, rr, idx, top_k=4, rerank_k=2)
    assert len(idx._warm_hooks) == 2
    del fe1
    gc.collect()
    idx.warm_capacity(4096)  # prunes the dead hook, warms via fe2
    assert len(idx._warm_hooks) == 1
    assert idx._warm_hooks[0]() is not None and fe2 is not None


def test_query_batcher_pipelines_batches():
    """Two batches may execute concurrently (queries are concurrent
    index readers): while one batch is on device, the next dispatches
    instead of idling behind it — bounded by max_in_flight."""
    import threading
    import time as _time

    peak = [0]
    live = [0]
    lock = threading.Lock()

    def slow_retrieve(queries):
        with lock:
            live[0] += 1
            peak[0] = max(peak[0], live[0])
        _time.sleep(0.15)
        with lock:
            live[0] -= 1
        return [[("c", 1.0, 1.0)] for _ in queries]

    async def run():
        qb = QueryBatcher(
            slow_retrieve, window_ms=1.0, max_batch=4, max_in_flight=2
        )
        t0 = _time.perf_counter()
        out = await asyncio.gather(*[qb.retrieve(f"q{i}") for i in range(16)])
        dt = _time.perf_counter() - t0
        await qb.stop()
        return out, dt

    out, dt = asyncio.run(run())
    assert len(out) == 16 and all(out)
    assert peak[0] == 2, f"expected 2 concurrent batches, saw {peak[0]}"
    # 16 queries / batches of 4 = 4 batches; serial would be >= 0.6s
    assert dt < 0.55, dt


def test_query_batcher_stop_completes_inflight():
    import time as _time

    def slow_retrieve(queries):
        _time.sleep(0.1)
        return [[("c", 1.0, 1.0)] for _ in queries]

    async def run():
        qb = QueryBatcher(slow_retrieve, window_ms=1.0, max_batch=2)
        futs = [asyncio.create_task(qb.retrieve(f"q{i}")) for i in range(2)]
        await asyncio.sleep(0.03)  # batch dispatched, in flight
        await qb.stop()
        return await asyncio.gather(*futs)

    out = asyncio.run(run())
    assert len(out) == 2 and all(out)


def test_aux_heads_bucket_batch_shapes():
    """token_weights/colbert_cache must pad the batch dim to the bucket
    ladder like embed(): per-document chunk counts vary, and unbucketed
    shapes compile one fresh (20-70s remote) program per distinct count."""
    import jax
    import numpy as np

    from outline_rag_tpu.engine.embedder import EncoderEmbedder
    from outline_rag_tpu.models.encoder import (
        EncoderConfig,
        init_colbert_head,
        init_encoder_params,
        init_sparse_head,
    )
    from outline_rag_tpu.models.tokenizer import HashTokenizer

    cfg = EncoderConfig.tiny()
    params = init_encoder_params(jax.random.key(0), cfg)
    params["sparse"] = init_sparse_head(jax.random.key(1), cfg)
    params["colbert"] = init_colbert_head(jax.random.key(2), cfg, out_dim=32)
    emb = EncoderEmbedder(
        params, cfg, HashTokenizer(), max_tokens=32,
        batch_buckets=(8, 32),
    )
    width = 16
    for n in (3, 5, 7):  # all pad to the 8-bucket -> ONE executable
        ids = np.full((n, width), 2, np.int32)
        mask = np.ones((n, width), np.int32)
        w = emb.token_weights(ids, mask)
        assert w.shape == (n, width)
        codes, scales = emb.colbert_cache(ids, mask, rank=16)
        assert codes.shape[0] == n and scales.shape == (n, width)
    assert emb._sparse_jit._cache_size() == 1
    assert emb._colbert_jit._cache_size() == 1


def test_fused_failure_falls_back_staged_then_disables():
    """A failing fused program must not fail the ask (chat fails open to
    NO retrieval otherwise) and must stop being re-attempted after the
    strike limit — jit caches only successful compiles, so a program the
    remote compiler deterministically rejects would otherwise be re-paid
    as a multi-second failing compile on every ask (northstar_1m_int8r
    forensics: 174 failed compiles in one serve run)."""
    svc = _build_hash_service()
    assert svc._fused is None  # hash embedder: no fused engine

    calls = {"n": 0}

    class Boom:
        def query(self, queries):
            calls["n"] += 1
            raise RuntimeError("remote_compile: HTTP 500")

    svc._fused = Boom()
    for _ in range(svc._FUSED_STRIKE_LIMIT):
        out = svc.retrieve_batch(["alpha wolves?"])
        # every strike still serves the batch via the staged path
        assert out and out[0] and out[0][0].chunk_id == "alpha:0"
    assert svc._fused is None  # disabled at the limit
    n_at_disable = calls["n"]
    out = svc.retrieve_batch(["alpha wolves?"])
    assert out[0][0].chunk_id == "alpha:0"
    assert calls["n"] == n_at_disable  # never attempted again


def test_fused_transient_failure_resets_strikes():
    svc = _build_hash_service()

    class Flaky:
        def __init__(self):
            self.fail_next = True

        def query(self, queries):
            if self.fail_next:
                self.fail_next = False
                raise RuntimeError("transient tunnel error")
            # minimal fused-shaped output: (chunk_id, rerank, dense)
            return [[("alpha:0", 1.0, 0.9)] for _ in queries]

    svc._fused = Flaky()
    assert svc.retrieve_batch(["q"])[0][0].chunk_id == "alpha:0"  # strike 1
    assert svc.retrieve_batch(["q"])[0][0].chunk_id == "alpha:0"  # success
    assert svc._fused_strikes == 0  # reset on success
    svc._fused.fail_next = True
    assert svc.retrieve_batch(["q"])[0][0].chunk_id == "alpha:0"
    assert svc._fused is not None  # one strike after a reset: still on
