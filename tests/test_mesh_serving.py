"""Mesh-sharded SERVING path tests (VERDICT round 1 item 1).

The library pieces (parallel/query.py) were already oracle-tested in
isolation; these tests pin that the *serving* objects actually route
through them on a multi-device mesh:

- a row-sharded ``VectorIndex.query`` dispatches the per-shard kernel +
  all-gather merge (``sharded_topk``), not a GSPMD full-score fallback,
  and matches the unsharded index exactly;
- ``FusedEngine`` on a sharded index runs the one-program mesh variant
  (``fused_query_mesh``) whose compiled HLO provably contains the
  all-gather collective, with results identical to the single-device
  program (including the lexical + ColBERT rescoring stages);
- the full HTTP app serves an ask with citations through a sharded index
  (reference seam ``app/rag.py:85-87`` at scale).

Runs on the 8-virtual-CPU-device mesh from conftest.
"""

import asyncio
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from outline_rag_tpu.index import VectorIndex
from outline_rag_tpu.parallel import data_mesh, row_sharding

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs a multi-device mesh"
)


def _fill(idx: VectorIndex, n: int, dim: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    ids = [f"c{i}" for i in range(n)]
    # several sources so tombstones appear
    for s in range(4):
        lo, hi = s * n // 4, (s + 1) * n // 4
        idx.add_chunks(ids[lo:hi], vecs[lo:hi], source_id=f"s{s}")
    return ids, vecs


def test_sharded_index_query_routes_through_shard_map(monkeypatch):
    mesh = data_mesh()
    dim, n, k = 64, 4096, 12
    sharded = VectorIndex(dim=dim, capacity=8192, sharding=row_sharding(mesh))
    plain = VectorIndex(dim=dim, capacity=8192)
    _fill(sharded, n, dim)
    _fill(plain, n, dim)
    sharded.delete_source("s1")
    plain.delete_source("s1")

    import outline_rag_tpu.parallel.query as pq

    calls = []
    real = pq.sharded_topk

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(pq, "sharded_topk", spy)

    rng = np.random.default_rng(7)
    q = rng.standard_normal((5, dim)).astype(np.float32)
    ids_s, vals_s = sharded.query(q, k)
    ids_p, vals_p = plain.query(q, k)
    assert calls, "sharded index must dispatch parallel.query.sharded_topk"
    assert ids_s == ids_p
    np.testing.assert_allclose(vals_s, vals_p, rtol=0, atol=1e-6)


def test_sharded_index_int8_query(monkeypatch):
    mesh = data_mesh()
    dim, n, k = 64, 4096, 8
    sharded = VectorIndex(
        dim=dim, capacity=8192, dtype="int8", sharding=row_sharding(mesh)
    )
    plain = VectorIndex(dim=dim, capacity=8192, dtype="int8")
    _fill(sharded, n, dim)
    _fill(plain, n, dim)

    import outline_rag_tpu.parallel.query as pq

    calls = []
    real = pq.sharded_topk_int8

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(pq, "sharded_topk_int8", spy)

    rng = np.random.default_rng(3)
    q = rng.standard_normal((4, dim)).astype(np.float32)
    ids_s, vals_s = sharded.query(q, k)
    ids_p, vals_p = plain.query(q, k)
    assert calls
    assert ids_s == ids_p
    np.testing.assert_allclose(vals_s, vals_p, rtol=0, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_models():
    from outline_rag_tpu.engine.embedder import EncoderEmbedder
    from outline_rag_tpu.engine.rerank import CrossEncoderReranker
    from outline_rag_tpu.models.encoder import EncoderConfig, init_encoder_params
    from outline_rag_tpu.models.reranker import init_reranker_params
    from outline_rag_tpu.models.tokenizer import HashTokenizer

    cfg = EncoderConfig.tiny()
    enc_params = init_encoder_params(jax.random.key(0), cfg)
    rr_params = init_reranker_params(jax.random.key(1), cfg)
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    emb = EncoderEmbedder(
        enc_params, cfg, tok, max_tokens=64, seq_buckets=(32, 64), name="tiny"
    )
    rr = CrossEncoderReranker(rr_params, cfg, tok, max_tokens=128)
    return emb, rr


DOCS = {
    "alpha": "the alpha wolf leads the pack through the snowy forest",
    "beta": "beta testing of the new release starts on monday",
    "gamma": "gamma radiation is measured with a geiger counter",
    "delta": "the river delta spreads into many small channels",
    "epsilon": "epsilon greedy exploration balances reward and novelty",
    "zeta": "the zeta function encodes the primes in its zeros",
    "eta": "eta reductions simplify lambda calculus terms",
    "theta": "theta waves appear in light sleep on the eeg",
}


def _fill_fused(idx: VectorIndex, emb):
    for name, text in DOCS.items():
        tb = emb.tokenizer.batch([text], 32, buckets=(32,))
        idx.add_chunks(
            [f"{name}:0"], emb.embed([text]), source_id=name,
            token_ids=tb.input_ids, token_mask=tb.attention_mask,
        )


def test_fused_engine_mesh_matches_single_device(tiny_models):
    from outline_rag_tpu.engine.fused import FusedEngine

    emb, rr = tiny_models
    mesh = data_mesh()
    kw = dict(dim=emb.dim, capacity=2048, token_width=32)
    sharded = VectorIndex(sharding=row_sharding(mesh), **kw)
    plain = VectorIndex(**kw)
    _fill_fused(sharded, emb)
    _fill_fused(plain, emb)

    queries = ["alpha wolf pack forest", "geiger counter radiation"]
    # exercise the full tail: lexical + ColBERT rescoring stages too
    for weights in (dict(), dict(lex_weight=0.3, colbert_weight=0.2)):
        fe_s = FusedEngine(emb, rr, sharded, top_k=4, rerank_k=3, **weights)
        fe_p = FusedEngine(emb, rr, plain, top_k=4, rerank_k=3, **weights)
        out_s = fe_s.query(queries)
        out_p = fe_p.query(queries)
        assert [[c[0] for c in row] for row in out_s] == [
            [c[0] for c in row] for row in out_p
        ]
        for row_s, row_p in zip(out_s, out_p):
            for (_, rr_s, dv_s), (_, rr_p, dv_p) in zip(row_s, row_p):
                assert abs(rr_s - rr_p) < 1e-4
                assert abs(dv_s - dv_p) < 1e-4


def test_fused_mesh_program_contains_allgather(tiny_models):
    """The compiled mesh program must contain the per-shard merge
    all-gather — proof the executed program is the shard_map path, not a
    GSPMD full-score fallback."""
    from outline_rag_tpu.engine.fused import fused_query_mesh

    emb, rr = tiny_models
    mesh = data_mesh()
    idx = VectorIndex(
        dim=emb.dim, capacity=2048, token_width=32, sharding=row_sharding(mesh)
    )
    _fill_fused(idx, emb)
    tb = emb.tokenizer.batch(["alpha wolf"], 32, buckets=(32,))
    state = idx._shard.state
    lowered = fused_query_mesh.lower(
        emb.params, rr.params,
        jnp.asarray(tb.input_ids), jnp.asarray(tb.attention_mask),
        state.vectors, state.scales, state.penalty,
        idx.tokens.state.ids, idx.tokens.state.mask, idx.tokens.state.weights,
        enc_cfg=emb.cfg, rr_cfg=rr.cfg, top_k=4, rerank_k=2,
        mesh=mesh,
    )
    hlo = lowered.compile().as_text()
    assert "all-gather" in hlo or "all-gather-start" in hlo


def test_app_serves_ask_through_sharded_index():
    """Full HTTP surface over a row-sharded index: refresh -> ask -> SSE
    citations, with the index provably mesh-sharded."""
    from outline_rag_tpu.config import load_settings
    from outline_rag_tpu.models.hash_embedder import HashEmbedder
    from outline_rag_tpu.serve.app import build_app
    from outline_rag_tpu.serve.http import TestClient
    from outline_rag_tpu.serve.llm import FakeChatProvider
    from outline_rag_tpu.storage import SqliteMetaStore
    from outline_rag_tpu.sync.refresh import TASK_QUEUE
    from tests.fake_outline import FakeOutline

    dim = 128
    settings = load_settings(
        {
            "SECRET_KEY": "s",
            "VECTOR_DIM": str(dim),
            "DATA_DIR": "",
            "OUTLINE_WEBHOOK_SECRET": "whsec",
            "SHARD_CAPACITY": str(8192),
            "MESH_DATA_AXIS": "0",  # all local devices
        }
    )
    fake = FakeOutline()
    fake.put_doc("d1", "Wolves", "wolves hunt in packs across the tundra", "t1")
    fake.put_doc("d2", "Rivers", "rivers carve canyons over millennia", "t1")
    app = build_app(
        settings,
        provider=FakeChatProvider(),
        embedder=HashEmbedder(dim=dim),
        meta=SqliteMetaStore(":memory:"),
        outline_transport=fake.transport(),
        start_workers=False,
    )
    index = app.state["index"]
    assert index.mesh is not None and index.mesh.size == len(jax.devices())
    client = TestClient(app)

    async def run():
        await client.post(
            "/chat/login",
            body=b"name=tester",
            headers={"content-type": "application/x-www-form-urlencoded"},
        )
        await client.post("/chat/update/all")
        ing, bus = app.state["ingestor"], app.state["bus"]
        for _ in range(20):
            item = await bus.pop(TASK_QUEUE, timeout=0.01)
            if item is None:
                break
            if item["task"] == "refresh_all":
                await ing.refresh_all()
            else:
                await ing.process_doc_batch(item["ids"])
        conv = json.loads(
            (
                await client.post(
                    "/chat/api/conversations", json_body={"title": "t"}
                )
            ).body
        )
        events = await client.sse(
            "POST",
            "/chat/api/ask",
            json_body={
                "question": "how do wolves hunt in the tundra?",
                "conversation_id": conv["id"],
            },
        )
        assert "[DONE]" in events
        text = "".join(
            e["choices"][0]["delta"].get("content", "")
            for e in events
            if isinstance(e, dict) and e.get("choices")
        )
        assert "[SourcesMap]:" in text

    asyncio.run(run())


def test_sharded_f32x2_index_query():
    """The compensated bf16x2 layout works through the mesh serving path
    (auto-detected inside the shard_map body)."""
    mesh = data_mesh()
    dim, n, k = 64, 4096, 10
    sharded = VectorIndex(
        dim=dim, capacity=8192, dtype="f32x2", sharding=row_sharding(mesh)
    )
    plain = VectorIndex(dim=dim, capacity=8192)  # fp32 reference
    _fill(sharded, n, dim)
    _fill(plain, n, dim)
    sharded.delete_source("s2")
    plain.delete_source("s2")

    rng = np.random.default_rng(5)
    q = rng.standard_normal((4, dim)).astype(np.float32)
    ids_s, vals_s = sharded.query(q, k)
    ids_p, vals_p = plain.query(q, k)
    assert ids_s == ids_p
    np.testing.assert_allclose(vals_s, vals_p, atol=1e-5)


def test_fused_engine_mesh_runs_int8_trunks():
    """ENCODER_INT8 x mesh serving: the quantized {'q','s'} trunk leaves
    replicate through fused_query_mesh (encoder + reranker run
    replicated next to the row-sharded corpus) and the mesh program
    returns the same candidates as the single-device int8 program."""
    from outline_rag_tpu.engine.embedder import EncoderEmbedder
    from outline_rag_tpu.engine.fused import FusedEngine
    from outline_rag_tpu.engine.rerank import CrossEncoderReranker
    from outline_rag_tpu.models.encoder import EncoderConfig, init_encoder_params
    from outline_rag_tpu.models.reranker import init_reranker_params
    from outline_rag_tpu.models.tokenizer import HashTokenizer

    cfg = EncoderConfig.tiny()
    enc_params = init_encoder_params(jax.random.key(0), cfg)
    rr_params = init_reranker_params(jax.random.key(1), cfg)
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    emb = EncoderEmbedder(
        enc_params, cfg, tok, max_tokens=64, seq_buckets=(32, 64),
        name="tiny", int8=True,
    )
    rr = CrossEncoderReranker(rr_params, cfg, tok, max_tokens=128, int8=True)

    mesh = data_mesh()
    kw = dict(dim=emb.dim, capacity=2048, token_width=32)
    sharded = VectorIndex(sharding=row_sharding(mesh), **kw)
    plain = VectorIndex(**kw)
    _fill_fused(sharded, emb)
    _fill_fused(plain, emb)

    queries = ["alpha wolf pack forest", "zeta function prime zeros"]
    fe_s = FusedEngine(emb, rr, sharded, top_k=4, rerank_k=3)
    fe_p = FusedEngine(emb, rr, plain, top_k=4, rerank_k=3)
    out_s, out_p = fe_s.query(queries), fe_p.query(queries)
    assert [[c[0] for c in row] for row in out_s] == [
        [c[0] for c in row] for row in out_p
    ]
