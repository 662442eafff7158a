"""Host-resident plane ops (ops/hostmem.py) — the >HBM index design.

The pinned_host GATHER path runs on the CPU backend (probe stage 2),
so the product path — int8r rescore reading a host-resident q2 plane —
is pinned here end-to-end. The host-space-output APPEND requires the
annotate_device_placement custom call (TPU-only); its capability probe
is tools/probe_hostres.py stage host_append.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outline_rag_tpu.ops.hostmem import (
    gather_rows,
    is_host_resident,
    to_pinned_host,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_gather_rows_device_plane_matches_take(rng):
    plane = jnp.asarray(rng.integers(-127, 128, size=(64, 16), dtype=np.int8))
    idx = jnp.asarray(rng.integers(0, 64, size=(4, 5)).astype(np.int32))
    out = gather_rows(plane, idx)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(jnp.take(plane, idx, axis=0))
    )


def test_gather_rows_host_plane_inside_jit(rng):
    plane_np = rng.integers(-127, 128, size=(128, 32), dtype=np.int8)
    plane = to_pinned_host(plane_np)
    assert is_host_resident(plane)
    idx_np = rng.integers(0, 128, size=(8, 6)).astype(np.int32)

    @jax.jit
    def f(p, idx):
        return jnp.sum(gather_rows(p, idx).astype(jnp.int32), axis=-1)

    got = np.asarray(f(plane, jnp.asarray(idx_np)))
    want = plane_np[idx_np].astype(np.int32).sum(axis=-1)
    np.testing.assert_array_equal(got, want)


def test_int8r_rescore_with_host_residual_matches_device(rng):
    """The product path: int8_topk's two-plane rescore must rank
    identically whether q2 lives in HBM or in host memory — the host
    placement changes bytes' location, never the math."""
    from outline_rag_tpu.ops.quant import (
        int8_topk,
        quantize_rows_int8,
        quantize_rows_int8_residual,
    )

    n, d, b, k = 512, 64, 4, 12
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    q1, s, q2 = quantize_rows_int8_residual(jnp.asarray(corpus))
    qq, qs = quantize_rows_int8(jnp.asarray(q))

    v_dev, i_dev = int8_topk(
        qq, qs, q1, s, k, impl="xla",
        rescore_queries=jnp.asarray(q), rescore_m=64, rescore_residual=q2,
    )
    v_host, i_host = int8_topk(
        qq, qs, q1, s, k, impl="xla",
        rescore_queries=jnp.asarray(q), rescore_m=64,
        rescore_residual=to_pinned_host(np.asarray(q2)),
    )
    np.testing.assert_array_equal(np.asarray(i_dev), np.asarray(i_host))
    np.testing.assert_allclose(
        np.asarray(v_dev), np.asarray(v_host), rtol=0, atol=0
    )
