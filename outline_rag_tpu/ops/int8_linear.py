"""int8-weight linear with fused dequantization (decode-path groundwork).

Decode for the local chat LM is weight-bandwidth-bound: every token reads
every weight once. Storing weights int8 (per-output-channel scales) halves
that traffic, but a naive ``(w.astype(bf16) * s) @ x`` materializes the
dequantized matrix in HBM and loses the saving — the dequant has to happen
tile-by-tile in VMEM, which is exactly what this Pallas kernel does:

  grid over output tiles; each step DMAs a ``[TN, K]`` int8 weight tile,
  dequantizes it on the VPU (cast + per-row scale), and contracts with the
  activations on the MXU. The int8 tile is the only HBM traffic.

Weights are stored ``[N, K]`` (one row per output channel) so the scale is
a per-row multiply and the tile layout matches the DMA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_linear_weight(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[K, N] float weight -> ([N, K] int8, [N] f32 per-channel scales)."""
    wt = jnp.asarray(w, jnp.float32).T  # [N, K]
    amax = jnp.max(jnp.abs(wt), axis=1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wt / scale), -127, 127).astype(jnp.int8)
    return q, scale[:, 0]


def w8a8_matmul(x2: jax.Array, q: jax.Array, s: jax.Array) -> jax.Array:
    """``[M, K] float @ ([N, K] int8, [N] f32 scales) -> [M, N] f32``.

    Dynamic per-row (per-token) activation quantization -> int8 x int8
    MXU dot -> f32 output rescale (O(M*N), fused by XLA). This is THE
    single implementation of the w8a8 numerics: the decoder
    (``models/decoder.py::_mm``) and encoder (``models/encoder.py::_emm``)
    forwards both route here, and their parity bars (logit/embedding
    cosine > 0.999 vs the float forward) assume identical math — fix
    rounding/eps/accumulation details HERE, never in one caller.
    """
    x2 = x2.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x2), axis=1, keepdims=True)
    xs = jnp.maximum(amax / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x2 / xs), -127, 127).astype(jnp.int8)
    raw = jax.lax.dot_general(
        xq, q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return raw.astype(jnp.float32) * xs * s[None, :].astype(jnp.float32)


def _kernel(x_ref, wq_ref, s_ref, o_ref):
    # x [M, K] bf16; wq [TN, K] int8; s [TN, 1] f32 -> o [M, TN]
    w = wq_ref[:].astype(jnp.bfloat16) * s_ref[:].astype(jnp.bfloat16)
    o_ref[:] = jax.lax.dot_general(
        x_ref[:],
        w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def int8_linear(
    x: jax.Array,  # [M, K] bf16/f32 activations
    w_q: jax.Array,  # [N, K] int8
    w_scale: jax.Array,  # [N] f32
    block_n: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """x @ dequant(w).T -> [M, N] in x.dtype, int8 tiles dequantized in
    VMEM. Requires N % block_n == 0 and M a multiple of 8 (pad at the
    caller; decode uses fixed slot batches)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, k = x.shape
    n = w_q.shape[0]
    if n % block_n or m % 8:
        # fail fast at trace time: a partial last column block would be
        # returned UNINITIALIZED (silent garbage logits), never an error
        raise ValueError(
            f"int8_linear requires N % block_n == 0 and M % 8 == 0 "
            f"(got N={n}, block_n={block_n}, M={m}); pad at the caller"
        )
    s2d = w_scale.reshape(n, 1).astype(jnp.float32)
    bytes_acc = n * k + m * k * 2 + m * n * 2
    out = pl.pallas_call(
        _kernel,
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((m, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, k), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k, bytes_accessed=bytes_acc, transcendentals=0
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, w_q, s2d)
    return out
