"""Host rescore tier (ops/hostres.py + ops/quant.py::int8_topk_candidates):
the 10M exact-ranking design — q1 scan + q1-part rescore on device,
residual correction + final top-k on the host over a numpy q2 plane.
Must match the TRUE fp32 oracle exactly, like the all-device int8r path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from outline_rag_tpu.ops.hostres import host_residual_topk
from outline_rag_tpu.ops.quant import (
    int8_topk,
    int8_topk_candidates,
    quantize_rows_int8,
    quantize_rows_int8_residual,
)

NEG = np.float32(-1e9)


def _normalize(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _oracle_topk(q, c, k, invalid=None):
    scores = q.astype(np.float32) @ c.astype(np.float32).T
    if invalid is not None:
        scores[:, invalid] = -np.inf
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(42)
    corpus = _normalize(rng.standard_normal((512, 128), dtype=np.float32))
    queries = _normalize(rng.standard_normal((8, 128), dtype=np.float32))
    return queries, corpus


def _host_tier(q, c, k, penalty=None, m=64):
    qq, qs = quantize_rows_int8(jnp.asarray(q))
    cq, cs, cr = quantize_rows_int8_residual(jnp.asarray(c))
    sc, idx, scl = int8_topk_candidates(
        qq, qs, cq, cs, m, rescore_queries=jnp.asarray(q), penalty=penalty
    )
    return host_residual_topk(
        np.asarray(sc), np.asarray(idx), np.asarray(scl),
        q, np.asarray(cr), k,
    )


def test_host_tier_matches_fp32_oracle(data):
    """The split-rescore ranking equals the TRUE fp32 oracle's — the same
    exactness contract the all-device int8r path carries."""
    q, c = data
    vals, idx = _host_tier(q, c, 12)
    ovals, oidx = _oracle_topk(q, c, 12)
    np.testing.assert_array_equal(idx, oidx)
    np.testing.assert_allclose(vals, ovals, rtol=1e-3, atol=2e-3)


def test_host_tier_matches_device_int8r_ranking(data):
    """Same candidates, same math, different placement: the host tier's
    top-12 indices equal the all-device rescore's."""
    q, c = data
    qq, qs = quantize_rows_int8(jnp.asarray(q))
    cq, cs, cr = quantize_rows_int8_residual(jnp.asarray(c))
    _, didx = int8_topk(
        qq, qs, cq, cs, 12,
        rescore_queries=jnp.asarray(q), rescore_m=64, rescore_residual=cr,
    )
    _, hidx = _host_tier(q, c, 12)
    np.testing.assert_array_equal(hidx, np.asarray(didx))


def test_host_tier_respects_penalty(data):
    q, c = data
    invalid = np.zeros(c.shape[0], dtype=bool)
    invalid[1::3] = True
    penalty = jnp.asarray(np.where(invalid, NEG, 0.0).astype(np.float32))
    _, idx = _host_tier(q, c, 12, penalty=penalty)
    assert not np.any(invalid[idx])


def test_host_tier_tie_break_lowest_index():
    """Duplicate corpus rows: exact ties must resolve to the lowest
    corpus index (the lax.top_k / index-store contract)."""
    rng = np.random.default_rng(7)
    base = _normalize(rng.standard_normal((64, 128), dtype=np.float32))
    corpus = np.concatenate([base, base])  # every row duplicated
    q = base[:4]
    _, idx = _host_tier(q, corpus, 8)
    # each query's own row appears once, at its LOW index (< 64)
    assert (idx[:, 0] == np.arange(4)).all()
    for b in range(4):
        dup_pairs = {i % 64 for i in idx[b]}
        # the duplicate partner (i + 64) may also rank, but whenever a
        # pair member is present the low one must come first
        seen = list(idx[b])
        for i in seen:
            if i >= 64 and (i - 64) in seen:
                assert seen.index(i - 64) < seen.index(i)
        assert dup_pairs  # sanity


def test_candidates_are_ascending_and_scores_match_q1_rescore(data):
    """int8_topk_candidates' contract: ascending candidate indices and
    scores equal to the q1-only dequant dot (HIGHEST f32)."""
    q, c = data
    qq, qs = quantize_rows_int8(jnp.asarray(q))
    cq, cs, cr = quantize_rows_int8_residual(jnp.asarray(c))
    sc, idx, scl = int8_topk_candidates(
        qq, qs, cq, cs, 64, rescore_queries=jnp.asarray(q)
    )
    idx = np.asarray(idx)
    assert (np.diff(idx, axis=1) > 0).all()
    deq = np.asarray(cq, np.float32) * np.asarray(cs)[:, None]
    want = np.einsum("bd,bmd->bm", q.astype(np.float32), deq[idx])
    np.testing.assert_allclose(np.asarray(sc), want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(scl), np.asarray(cs)[idx])
