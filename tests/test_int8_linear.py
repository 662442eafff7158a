"""int8-weight linear kernel: quantization round trip + kernel parity."""

import jax
import jax.numpy as jnp
import numpy as np

from outline_rag_tpu.ops.int8_linear import int8_linear, quantize_linear_weight


def test_parity_vs_dequant_matmul():
    k, n, m = 256, 512, 8
    w = jax.random.normal(jax.random.key(0), (k, n), jnp.float32) * 0.05
    x = jax.random.normal(jax.random.key(1), (m, k), jnp.float32)
    wq, ws = quantize_linear_weight(w)
    got = np.asarray(int8_linear(x, wq, ws, block_n=256, interpret=True), np.float32)
    w_deq = np.asarray(wq, np.float32) * np.asarray(ws)[:, None]
    want = (np.asarray(x, np.float32).astype(np.float32) @ w_deq.T)
    # kernel runs the dot in bf16 -> compare with bf16-ish tolerance
    np.testing.assert_allclose(got, want, atol=0.02, rtol=0.02)


def test_quantization_error_is_small():
    k, n = 512, 256
    w = jax.random.normal(jax.random.key(2), (k, n), jnp.float32) * 0.03
    wq, ws = quantize_linear_weight(w)
    w_deq = (np.asarray(wq, np.float32) * np.asarray(ws)[:, None]).T
    rel = np.abs(w_deq - np.asarray(w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 0.01  # int8 per-channel: <1% of the channel max
