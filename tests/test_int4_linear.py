"""Pallas w4a16 kernel (ops/int4_linear.py) vs the XLA grouped oracle.

The kernel runs interpret-mode on the CPU backend (Mosaic logic without
a chip); the oracle is models/decoder.py::_mm_int4's grouped-dot path —
the two must agree to f32 reassociation noise because they implement
one numerics contract (unpack -> dt upcast -> group scale -> dot).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outline_rag_tpu.models.decoder import (
    _mm_int4,
    quantize_decoder_params_int4,
)
from outline_rag_tpu.ops.int4_linear import w4a16_matmul


def _quant(w, gsz):
    qp = quantize_decoder_params_int4(
        {"layers": {"wq": w}, "embed": w[:1], "final_norm": w[0]},
        group_size=gsz,
    )
    return qp["layers"]["wq"]["q4"], qp["layers"]["wq"]["s4"]


@pytest.mark.parametrize(
    "m,k,n,gsz",
    [
        (1, 512, 256, 128),  # single-stream decode
        (4, 1024, 512, 128),
        (9, 512, 384, 256),  # gsz=256: one group per packed chunk
        (16, 2048, 512, 512),  # gsz>256: chunk well inside a group
        (32, 2048, 1280, 128),  # batcher-full decode, uneven N blocks
    ],
)
def test_kernel_matches_xla_grouped_path(m, k, n, gsz):
    w = jax.random.normal(jax.random.key(0), (k, n), jnp.float32)
    q4, s4 = _quant(w, gsz)
    x = jax.random.normal(jax.random.key(1), (m, k), jnp.float32)
    want = np.asarray(_mm_int4(x, q4, s4, jnp.float32), np.float32)
    got = np.asarray(
        w4a16_matmul(x, q4, s4, jnp.float32, interpret=True), np.float32
    )
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-5 * scale, rtol=1e-5)


def test_v1_rejects_straddling_group_size_v2_handles_it():
    """gsz=384 straddles v1's 256-element chunks; v2's static lane-64
    select handles any gsz%128==0, so auto routes it to v2 and matches
    the oracle."""
    w = jax.random.normal(jax.random.key(0), (768, 256), jnp.float32)
    q4, s4 = _quant(w, 384)
    x = jax.random.normal(jax.random.key(5), (2, 768), jnp.float32)
    with pytest.raises(ValueError, match="straddles"):
        w4a16_matmul(x, q4, s4, jnp.float32, interpret=True, variant="v1")
    want = np.asarray(_mm_int4(x, q4, s4, jnp.float32), np.float32)
    got = np.asarray(
        w4a16_matmul(x, q4, s4, jnp.float32, interpret=True), np.float32
    )
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-5 * scale, rtol=1e-5)


@pytest.mark.parametrize("m,k,n,gsz", [(1, 512, 256, 128), (16, 2048, 512, 512)])
def test_v1_and_v2_agree(m, k, n, gsz):
    w = jax.random.normal(jax.random.key(7), (k, n), jnp.float32)
    q4, s4 = _quant(w, gsz)
    x = jax.random.normal(jax.random.key(8), (m, k), jnp.float32)
    v1 = np.asarray(
        w4a16_matmul(x, q4, s4, jnp.float32, interpret=True, variant="v1"),
        np.float32,
    )
    v2 = np.asarray(
        w4a16_matmul(x, q4, s4, jnp.float32, interpret=True, variant="v2"),
        np.float32,
    )
    scale = np.abs(v1).max()
    np.testing.assert_allclose(v2, v1, atol=1e-5 * scale, rtol=1e-5)


def test_kernel_pads_sub_tile_batch():
    """M < 16 pads to the bf16 sublane floor and slices back exactly."""
    w = jax.random.normal(jax.random.key(2), (512, 256), jnp.float32)
    q4, s4 = _quant(w, 128)
    x3 = jax.random.normal(jax.random.key(3), (3, 512), jnp.float32)
    x16 = jnp.concatenate([x3, jnp.zeros((13, 512), jnp.float32)])
    got3 = np.asarray(
        w4a16_matmul(x3, q4, s4, jnp.float32, interpret=True), np.float32
    )
    got16 = np.asarray(
        w4a16_matmul(x16, q4, s4, jnp.float32, interpret=True), np.float32
    )
    assert got3.shape == (3, 256)
    np.testing.assert_allclose(got3, got16[:3], rtol=1e-6, atol=1e-6)
