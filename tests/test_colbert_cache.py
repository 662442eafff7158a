"""Cached-ColBERT path: projected int8 per-token vectors on the index.

The cache replaces per-query candidate re-encoding (the 35% QPS cost
measured in docs/BENCHMARKS.md) with a row gather. At rank == Hc the
projection is exactly orthogonal, so cached scores must match the
recompute path up to int8 quantization; at lower rank the scores are
JL approximations whose ranking agreement is pinned here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from outline_rag_tpu.engine.embedder import EncoderEmbedder
from outline_rag_tpu.engine.rerank import CrossEncoderReranker
from outline_rag_tpu.index import VectorIndex
from outline_rag_tpu.models.encoder import (
    EncoderConfig,
    colbert_cache_codes,
    colbert_projection,
    colbert_token_vectors,
    init_colbert_head,
    init_encoder_params,
)
from outline_rag_tpu.models.reranker import init_reranker_params
from outline_rag_tpu.models.tokenizer import HashTokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = EncoderConfig.tiny()
    params = init_encoder_params(jax.random.key(0), cfg)
    params["colbert"] = init_colbert_head(jax.random.key(1), cfg)
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    emb = EncoderEmbedder(params, cfg, tok, max_tokens=32, seq_buckets=(32,))
    rr_params = init_reranker_params(jax.random.key(2), cfg)
    rr = CrossEncoderReranker(rr_params, cfg, tok, max_tokens=64)
    return cfg, params, tok, emb, rr


def test_projection_full_rank_preserves_dots():
    p = colbert_projection(16, 16)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 16)).astype(np.float32)
    y = rng.standard_normal((7, 16)).astype(np.float32)
    got = np.asarray(jnp.asarray(x) @ p) @ np.asarray(jnp.asarray(y) @ p).T
    np.testing.assert_allclose(got, x @ y.T, atol=1e-4, rtol=1e-4)


def test_cache_codes_zero_positions(setup):
    """CLS/pad positions must quantize to scale 0 (MaxSim floor kept)."""
    cfg, params, tok, *_ = setup
    rng = np.random.default_rng(1)
    ids = rng.integers(3, cfg.vocab_size, size=(2, 12)).astype(np.int32)
    ids[:, 0] = 0
    mask = np.ones((2, 12), np.int32)
    mask[0, 8:] = 0
    proj = colbert_projection(cfg.hidden, 8)
    codes, scales = colbert_cache_codes(
        params, jnp.asarray(ids), jnp.asarray(mask), cfg, proj
    )
    codes, scales = np.asarray(codes), np.asarray(scales)
    assert codes.shape == (2, 12, 8) and codes.dtype == np.int8
    assert np.all(scales[:, 0] == 0.0) and np.all(codes[:, 0] == 0)
    assert np.all(scales[0, 8:] == 0.0)
    assert np.all(scales[1, 1:] > 0.0)


def _build_index(cfg, tok, emb, rank, texts, sharding=None, capacity=2048):
    idx = VectorIndex(
        dim=cfg.hidden, capacity=capacity, token_width=32,
        colbert_rank=rank, sharding=sharding,
    )
    for name, text in texts.items():
        tb = tok.batch([text], 32, buckets=(32,))
        vecs = emb.embed([text])
        cb_codes = cb_scales = None
        if rank:
            cb_codes, cb_scales = emb.colbert_cache(
                tb.input_ids, tb.attention_mask, rank,
                proj=idx.colbert_projection_for(cfg.hidden),
            )
        idx.add_chunks(
            [name], vecs, source_id=name,
            token_ids=tb.input_ids, token_mask=tb.attention_mask,
            colbert_codes=cb_codes, colbert_scales=cb_scales,
        )
    return idx


TEXTS = {
    "wolves": "wolves hunt in packs across the northern forest",
    "geiger": "a geiger counter clicks when it detects radiation",
    "cook": "simmer the onions until translucent then add garlic",
    "moon": "the moon orbits the earth every twenty seven days",
}


def test_cached_full_rank_matches_recompute(setup):
    """rank == Hc: cached-path retrieval scores track the recompute path
    (difference is int8 rounding only) and the ranking is identical."""
    from outline_rag_tpu.engine.fused import FusedEngine

    cfg, params, tok, emb, rr = setup
    queries = ["wolves hunt in the forest", "detecting radiation clicks"]

    idx_rec = _build_index(cfg, tok, emb, 0, TEXTS)
    eng_rec = FusedEngine(emb, rr, idx_rec, top_k=4, rerank_k=4,
                          q_width=32, colbert_weight=1.0)
    idx_cb = _build_index(cfg, tok, emb, cfg.hidden, TEXTS)
    eng_cb = FusedEngine(emb, rr, idx_cb, top_k=4, rerank_k=4,
                         q_width=32, colbert_weight=1.0)
    assert eng_cb._colbert_proj is not None

    want = eng_rec.query(queries)
    got = eng_cb.query(queries)
    for w_row, g_row in zip(want, got):
        assert [g[0] for g in g_row] == [w[0] for w in w_row]
        for w_it, g_it in zip(w_row, g_row):
            # retrieval score (dense + colbert blend): int8 rounding band
            assert abs(w_it[2] - g_it[2]) < 0.05


def test_cached_low_rank_ranks_match(setup):
    """rank < Hc (the production shape): top-1 must agree with the exact
    recompute path on well-separated texts."""
    from outline_rag_tpu.engine.fused import FusedEngine

    cfg, params, tok, emb, rr = setup
    idx_rec = _build_index(cfg, tok, emb, 0, TEXTS)
    eng_rec = FusedEngine(emb, rr, idx_rec, top_k=4, rerank_k=4,
                          q_width=32, colbert_weight=2.0)
    idx_cb = _build_index(cfg, tok, emb, cfg.hidden // 2, TEXTS)
    eng_cb = FusedEngine(emb, rr, idx_cb, top_k=4, rerank_k=4,
                         q_width=32, colbert_weight=2.0)
    queries = [
        "wolves hunt in the forest",
        "simmer onions and garlic",
        "the moon orbits the earth",
    ]
    want = eng_rec.query(queries)
    got = eng_cb.query(queries)
    for w_row, g_row in zip(want, got):
        assert g_row[0][0] == w_row[0][0]


def test_cached_colbert_mesh_matches_single_device(setup):
    """Mesh fused query with the ColBERT cache: the cached vectors ride
    the per-shard gather + all-gather merge; results must equal the
    single-device cached program exactly (same cache, same projection)."""
    from outline_rag_tpu.engine.fused import FusedEngine
    from outline_rag_tpu.parallel.mesh import data_mesh, row_sharding

    cfg, params, tok, emb, rr = setup
    rank = cfg.hidden // 2
    single = _build_index(cfg, tok, emb, rank, TEXTS)
    eng_s = FusedEngine(emb, rr, single, top_k=4, rerank_k=4,
                        q_width=32, colbert_weight=2.0)
    sharded = _build_index(
        cfg, tok, emb, rank, TEXTS,
        sharding=row_sharding(data_mesh(len(jax.devices()))),
    )
    assert sharded.mesh is not None
    eng_m = FusedEngine(emb, rr, sharded, top_k=4, rerank_k=4,
                        q_width=32, colbert_weight=2.0)
    queries = ["wolves in the north", "radiation detector clicks"]
    want = eng_s.query(queries)
    got = eng_m.query(queries)
    for w_row, g_row in zip(want, got):
        assert [g[0] for g in g_row] == [w[0] for w in w_row]
        for w_it, g_it in zip(w_row, g_row):
            assert abs(w_it[2] - g_it[2]) < 1e-4


def test_save_load_roundtrip_with_colbert(tmp_path, setup):
    cfg, params, tok, emb, rr = setup
    idx = _build_index(cfg, tok, emb, 8, TEXTS)
    path = str(tmp_path / "snap.npz")
    idx.save(path)
    loaded = VectorIndex.load(path)
    assert loaded.colbert_rank == 8 and loaded.tokens.colbert is not None
    np.testing.assert_array_equal(
        np.asarray(idx.tokens.colbert.codes),
        np.asarray(loaded.tokens.colbert.codes),
    )
    np.testing.assert_array_equal(
        np.asarray(idx.tokens.colbert.scales),
        np.asarray(loaded.tokens.colbert.scales),
    )
    # the ingest-time projection travels with the snapshot, so a serve
    # process on a different backend provably scores with the same
    # matrix the cached codes were projected with (ADVICE r2)
    assert loaded.colbert_proj is not None
    np.testing.assert_array_equal(loaded.colbert_proj, idx.colbert_proj)
    np.testing.assert_array_equal(
        loaded.colbert_projection_for(cfg.hidden), idx.colbert_proj
    )


def test_projection_for_rejects_mismatched_encoder(setup):
    cfg, params, tok, emb, rr = setup
    idx = _build_index(cfg, tok, emb, 8, TEXTS)
    idx.colbert_projection_for(cfg.hidden)
    with pytest.raises(ValueError):
        idx.colbert_projection_for(cfg.hidden + 1)


def test_compact_keeps_colbert_rows(setup):
    cfg, params, tok, emb, rr = setup
    idx = _build_index(cfg, tok, emb, 8, TEXTS)
    before = np.asarray(idx.tokens.colbert.codes)[
        [idx._by_chunk["geiger"]]
    ].copy()
    idx.delete_source("wolves")
    idx.compact()
    after = np.asarray(idx.tokens.colbert.codes)[[idx._by_chunk["geiger"]]]
    np.testing.assert_array_equal(before, after)


def test_colbert_cache_defaults_on_with_colbert_weight():
    """VERDICT r2 weak #8: enabling COLBERT_WEIGHT without reading the
    benchmarks must not buy the -34% re-encode path — the cache defaults
    to r=128 unless COLBERT_CACHE_RANK is set explicitly (0 opts out)."""
    from outline_rag_tpu.config import load_settings

    s = load_settings({"COLBERT_WEIGHT": "0.3"})
    assert s.colbert_cache_rank == 128
    s = load_settings({"COLBERT_WEIGHT": "0.3", "COLBERT_CACHE_RANK": "0"})
    assert s.colbert_cache_rank == 0
    s = load_settings({"COLBERT_WEIGHT": "0.3", "COLBERT_CACHE_RANK": "64"})
    assert s.colbert_cache_rank == 64
    s = load_settings({})
    assert s.colbert_cache_rank == 0


def test_legacy_snapshot_without_proj_pins_unnormalized_matrix(tmp_path, setup):
    """Snapshots saved before projection persistence carry codes made
    with the UN-normalized fixed-seed QR matrix; load must pin that
    legacy matrix (not the new sign-normalized one) or cached scores
    silently flip sign on ~half the rank columns."""
    import jax.numpy as jnp

    cfg, params, tok, emb, rr = setup
    idx = _build_index(cfg, tok, emb, 8, TEXTS)
    path = str(tmp_path / "legacy.npz")
    idx.save(path)
    # strip the persisted projection to simulate a pre-persistence file
    arrays = dict(np.load(path))
    del arrays["colbert_proj"]
    np.savez(path, **arrays)

    loaded = VectorIndex.load(path)
    assert loaded.colbert_proj is None
    got = loaded.colbert_projection_for(cfg.hidden)
    g = jax.random.normal(
        jax.random.key(0x0C01BE47), (cfg.hidden, 8), jnp.float32
    )
    q, _ = jnp.linalg.qr(g)
    legacy = np.asarray(q * jnp.sqrt(jnp.float32(cfg.hidden) / 8.0))
    np.testing.assert_array_equal(got, legacy)


def test_engine_repins_projection_after_snapshot_adopt(tmp_path, setup):
    """serve startup order: engine built on an empty index, THEN the
    snapshot is adopted. The engine must score with the adopted
    (ingest-time) matrix, not its construction-time one."""
    from outline_rag_tpu.engine.fused import FusedEngine

    cfg, params, tok, emb, rr = setup
    src = _build_index(cfg, tok, emb, 8, TEXTS)
    path = str(tmp_path / "snap.npz")
    # perturb the source's pinned matrix so adopt provably differs from
    # what a fresh engine would pin (simulates a legacy/foreign snapshot)
    src.colbert_proj = src.colbert_proj * np.float32(1.0)  # distinct object
    src.save(path)

    empty = VectorIndex(
        dim=cfg.hidden, capacity=2048, token_width=32, colbert_rank=8
    )
    eng = FusedEngine(emb, rr, empty, top_k=4, rerank_k=4,
                      q_width=32, colbert_weight=1.0)
    pinned_at_init = eng._colbert_proj_src
    empty.adopt(VectorIndex.load(path))
    out = eng.query(["wolves hunt in the forest"])
    assert out and out[0]
    assert eng._colbert_proj_src is empty.colbert_proj
    assert eng._colbert_proj_src is not pinned_at_init
    np.testing.assert_array_equal(eng._colbert_proj_src, src.colbert_proj)
