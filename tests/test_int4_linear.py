"""Pallas int4 kernels (ops/int4_linear.py) vs the XLA grouped oracle.

The kernels run interpret-mode on the CPU backend (Mosaic logic without
a chip); the w4a16 oracle is models/decoder.py::_mm_int4's grouped-dot
path — the two must agree to f32 reassociation noise because they
implement one numerics contract (unpack -> dt upcast -> group scale ->
dot). The w4a8 kernel has its own oracle here (exact integer math: the
int8 dots and the bias-fold correction are exact, so agreement is to
f32 summation order only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from outline_rag_tpu.models.decoder import (
    _mm_int4,
    _unpack_int4,
    quantize_decoder_params_int4,
)
from outline_rag_tpu.ops.int4_linear import w4a8_matmul, w4a16_matmul


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


def test_both_variants_handle_group_straddling_chunks():
    """gsz=384 straddles the 256-element packed chunks; the block-pair
    layout makes each chunk half's group index a constant, so BOTH
    variants handle any gsz % 128 == 0 (the old parity-interleaved v1
    had to reject this shape)."""
    w = jax.random.normal(jax.random.key(0), (768, 256), jnp.float32)
    q4, s4 = _quant(w, 384)
    x = jax.random.normal(jax.random.key(5), (2, 768), jnp.float32)
    want = np.asarray(_mm_int4(x, q4, s4, jnp.float32), np.float32)
    scale = np.abs(want).max()
    for variant in ("v1", "v2"):
        got = np.asarray(
            w4a16_matmul(
                x, q4, s4, jnp.float32, interpret=True, variant=variant
            ),
            np.float32,
        )
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


def test_v1_v2_oracle_agree_at_bf16():
    """ADVICE r3: v2's bias fold casts (v+8)*s to dt where v1 casts
    v*s — at the production dt=bfloat16 the effective weights can
    round differently (up to ~2x per-element ulp). Pin that the three
    implementations stay within bf16-rounding distance of each other
    on the dt they actually serve with."""
    k, n, m = 1024, 512, 4
    w = 0.05 * jax.random.normal(jax.random.key(11), (k, n), jnp.float32)
    q4, s4 = _quant(w, 128)
    x = jax.random.normal(jax.random.key(12), (m, k), jnp.float32)
    oracle = np.asarray(_mm_int4(x, q4, s4, jnp.bfloat16), np.float32)
    v1 = np.asarray(
        w4a16_matmul(x, q4, s4, jnp.bfloat16, interpret=True, variant="v1"),
        np.float32,
    )
    v2 = np.asarray(
        w4a16_matmul(x, q4, s4, jnp.bfloat16, interpret=True, variant="v2"),
        np.float32,
    )
    scale = np.abs(oracle).max()
    # bf16 weight rounding is ~2^-9 relative per element; dot over K
    # concentrates it — 2% of the output scale is the measured band
    np.testing.assert_allclose(v1, oracle, atol=0.02 * scale)
    np.testing.assert_allclose(v2, oracle, atol=0.02 * scale)
    np.testing.assert_allclose(v2, v1, atol=0.02 * scale)


def test_variant_validation():
    """ADVICE r3: unknown variant strings must raise, not silently run
    v1 (would invalidate A/B measurements)."""
    w = jax.random.normal(jax.random.key(2), (512, 256), jnp.float32)
    q4, s4 = _quant(w, 128)
    x = jnp.zeros((1, 512), jnp.float32)
    with pytest.raises(ValueError, match="variant"):
        w4a16_matmul(x, q4, s4, interpret=True, variant="V2")
    with pytest.raises(ValueError, match="variant"):
        w4a16_matmul(x, q4, s4, interpret=True, variant="v3")


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


# ---------------------------------------------------------------------------
# w4a8 (int8-dot) kernel
# ---------------------------------------------------------------------------


def _w4a8_oracle(x, q4, s4):
    """Exact-integer reference for w4a8_matmul's numerics."""
    x32 = np.asarray(x, np.float32)
    amax = np.abs(x32).max(axis=1, keepdims=True)
    sx = np.maximum(amax / 127.0, 1e-12)
    xq = np.clip(np.round(x32 / sx), -127, 127).astype(np.int32)
    vq = np.asarray(_unpack_int4(q4), np.int32)  # [N, K] in [-8, 7]
    n, k = vq.shape
    g = s4.shape[1]
    wdq = vq.reshape(n, g, k // g).astype(np.float64) * np.asarray(
        s4, np.float64
    )[:, :, None]
    return (xq.astype(np.float64) @ wdq.reshape(n, k).T) * sx


@pytest.mark.parametrize(
    "m,k,n,gsz",
    [
        (1, 512, 256, 128),
        (4, 1024, 512, 128),
        (9, 512, 384, 256),  # gsz=256: both chunk halves in one group
        (16, 2048, 512, 512),
        (33, 1024, 1280, 128),  # pads M to 64, uneven N blocks
    ],
)
def test_w4a8_matches_integer_oracle(m, k, n, gsz):
    w = 0.05 * jax.random.normal(jax.random.key(20), (k, n), jnp.float32)
    q4, s4 = _quant(w, gsz)
    x = jax.random.normal(jax.random.key(21), (m, k), jnp.float32)
    want = _w4a8_oracle(x, q4, s4)
    got = np.asarray(w4a8_matmul(x, q4, s4, interpret=True), np.float64)
    scale = np.abs(want).max()
    # every integer product is exact; only f32 accumulation order differs
    np.testing.assert_allclose(got, want, atol=2e-6 * scale, rtol=1e-5)


def test_w4a8_close_to_w4a16():
    """w4a8 adds only the activation-quantization error on top of the
    w4a16 path — cosine must stay in the w8a8 parity class."""
    k, n, m = 1024, 512, 8
    w = 0.05 * jax.random.normal(jax.random.key(30), (k, n), jnp.float32)
    q4, s4 = _quant(w, 128)
    x = jax.random.normal(jax.random.key(31), (m, k), jnp.float32)
    a16 = np.asarray(_mm_int4(x, q4, s4, jnp.float32), np.float32)
    a8 = np.asarray(w4a8_matmul(x, q4, s4, interpret=True), np.float32)
    cos = (a16 * a8).sum(-1) / (
        np.linalg.norm(a16, axis=-1) * np.linalg.norm(a8, axis=-1)
    )
    assert cos.min() > 0.999, cos.min()
