"""Mesh-sharded query tests on the 8-virtual-device CPU backend
(SURVEY.md section 4 "multi-node without a cluster")."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from outline_rag_tpu.ops.topk import NEG
from outline_rag_tpu.parallel import data_mesh, row_sharding, sharded_topk


def _normalize(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    return data_mesh()


def test_sharded_matches_oracle(mesh, rng=None):
    rng = np.random.default_rng(11)
    n, d, b, k = 1024, 64, 4, 12
    corpus = _normalize(rng.standard_normal((n, d), dtype=np.float32))
    queries = _normalize(rng.standard_normal((b, d), dtype=np.float32))
    sharded_corpus = jax.device_put(jnp.asarray(corpus), row_sharding(mesh))
    vals, idx = sharded_topk(jnp.asarray(queries), sharded_corpus, k, mesh=mesh)
    scores = queries @ corpus.T
    oidx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(np.asarray(idx), oidx)
    np.testing.assert_allclose(
        np.asarray(vals), np.take_along_axis(scores, oidx, 1), rtol=1e-5, atol=1e-5
    )


def test_sharded_with_tombstones(mesh):
    rng = np.random.default_rng(12)
    n, d, b, k = 512, 64, 2, 8
    corpus = _normalize(rng.standard_normal((n, d), dtype=np.float32))
    queries = _normalize(rng.standard_normal((b, d), dtype=np.float32))
    invalid = np.zeros(n, dtype=bool)
    invalid[100:300] = True  # spans shard boundaries
    penalty = np.where(invalid, NEG, 0.0).astype(np.float32)
    sharded_corpus = jax.device_put(jnp.asarray(corpus), row_sharding(mesh))
    sharded_pen = jax.device_put(jnp.asarray(penalty), row_sharding(mesh))
    vals, idx = sharded_topk(
        jnp.asarray(queries), sharded_corpus, k, sharded_pen, mesh=mesh
    )
    idx = np.asarray(idx)
    assert not np.any(invalid[idx])
    scores = queries @ corpus.T
    scores[:, invalid] = -np.inf
    oidx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(idx, oidx)


def test_sharded_index_store(mesh):
    """VectorIndex with a row-sharded state still answers correctly."""
    from outline_rag_tpu.index import VectorIndex

    rng = np.random.default_rng(13)
    idx = VectorIndex(dim=64, capacity=8192, sharding=row_sharding(mesh))
    vecs = _normalize(rng.standard_normal((40, 64), dtype=np.float32))
    idx.add_chunks([f"c{i}" for i in range(40)], vecs, source_id="d")
    got_ids, scores = idx.query(vecs[17:18], k=3)
    assert got_ids[0][0] == "c17"
    assert scores[0, 0] == pytest.approx(1.0, abs=1e-4)


def test_sharded_encoder(mesh):
    from outline_rag_tpu.models.encoder import EncoderConfig, init_encoder_params, pooled_embeddings
    from outline_rag_tpu.parallel.encode import make_sharded_encoder

    cfg = EncoderConfig.tiny()
    params = init_encoder_params(jax.random.key(5), cfg)
    rng = np.random.default_rng(5)
    b, s = 16, 12  # divisible by 8 devices
    ids = rng.integers(3, cfg.vocab_size, size=(b, s)).astype(np.int32)
    mask = np.ones((b, s), np.int32)
    encode = make_sharded_encoder(cfg, mesh)
    sharded = np.asarray(encode(params, ids, mask))
    single = np.asarray(pooled_embeddings(params, jnp.asarray(ids), jnp.asarray(mask), cfg))
    np.testing.assert_allclose(sharded, single, rtol=2e-5, atol=2e-5)


def test_sharded_int8_index(mesh):
    from outline_rag_tpu.index import VectorIndex

    rng = np.random.default_rng(21)
    idx = VectorIndex(dim=64, capacity=8192, dtype="int8", sharding=row_sharding(mesh))
    vecs = _normalize(rng.standard_normal((24, 64), dtype=np.float32))
    idx.add_chunks([f"c{i}" for i in range(24)], vecs, source_id="d")
    got_ids, scores = idx.query(vecs[5:6], k=3)
    assert got_ids[0][0] == "c5"


def test_sharded_int8r_index_matches_fp32(mesh):
    """Row-sharded int8r: the residual plane shards with the corpus and
    each device rescores its own candidates — the merged top-12 must
    equal an (unsharded) float32 index's sets exactly."""
    from outline_rag_tpu.index import VectorIndex

    rng = np.random.default_rng(22)
    n = 2048
    vecs = _normalize(rng.standard_normal((n, 64), dtype=np.float32))
    qs = _normalize(
        vecs[:8] + 0.35 * rng.standard_normal((8, 64), dtype=np.float32)
    )
    ref = VectorIndex(dim=64, capacity=4096, dtype="float32")
    ref.add_chunks([f"c{i}" for i in range(n)], vecs, source_id="d")
    ref_ids, _ = ref.query(qs, k=12)
    idx = VectorIndex(
        dim=64, capacity=8192, dtype="int8r", sharding=row_sharding(mesh)
    )
    idx.add_chunks([f"c{i}" for i in range(n)], vecs, source_id="d")
    got_ids, _ = idx.query(qs, k=12)
    assert all(set(a) == set(b) for a, b in zip(got_ids, ref_ids))


def test_two_level_mesh_matches_oracle():
    """Multi-slice topology: 2 slices x 4 devices, hierarchical ICI-then-DCN
    merge must equal the flat oracle."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from outline_rag_tpu.parallel.query import sharded_topk_2d

    rng = np.random.default_rng(31)
    n, d, b, k = 1024, 64, 4, 10
    corpus = _normalize(rng.standard_normal((n, d), dtype=np.float32))
    queries = _normalize(rng.standard_normal((b, d), dtype=np.float32))
    mesh2d = Mesh(np.array(jax.devices()).reshape(2, 4), ("dcn", "ici"))
    sharded = jax.device_put(
        jnp.asarray(corpus), NamedSharding(mesh2d, P(("dcn", "ici"), None))
    )
    vals, idx = sharded_topk_2d(jnp.asarray(queries), sharded, k, mesh=mesh2d)
    scores = queries @ corpus.T
    oidx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    np.testing.assert_array_equal(np.asarray(idx), oidx)
