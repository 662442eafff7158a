"""Fused flash-attention Pallas kernel for the encoder stack.

The reference never runs attention itself (embedding/rerank are remote API
calls, reference ``app/llm_services.py:199-206,235-344``); this kernel is
what makes the *on-TPU* replacement scale to BGE-m3's real 8192-token
context. The naive einsum path materializes the [B, H, S, S] probability
tensor in HBM — at S=8192 that is 4 GiB (f32) per batch of 16, which both
blows HBM and makes attention bandwidth-bound. The flash kernel streams
K/V tiles through VMEM with an online softmax, so HBM traffic is O(S·D)
instead of O(S^2) and the S^2 work stays on the MXU.

Layout: inputs are flattened to ``[B*H, S, D]`` with D zero-padded to the
128-lane width (zero columns change neither logits nor outputs). Grid is
``(B*H, S/BQ, S/BK)`` with the key-tile dimension innermost; the running
(max, sum, accumulator) state for each (head, query-tile) lives in VMEM
scratch across the key sweep — the same accumulator discipline as the
fused top-K kernel (``ops/topk.py``).

Numerics: logits and softmax statistics in f32 regardless of input dtype
(matching ``models/encoder.py::_attention`` which computes logits with
``preferred_element_type=jnp.float32``); the P·V matmul runs in the input
dtype on the MXU with an f32 accumulator.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIAS = -1e9  # matches the encoder's additive padding bias
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(
    q_ref,  # [1, BQ, D]
    k_ref,  # [1, BK, D]
    v_ref,  # [1, BK, D]
    bias_ref,  # [1, 1, BK] f32 additive key bias (0 valid / NEG_BIAS pad)
    o_ref,  # [1, BQ, D]
    m_scr,  # scratch [BQ, LANE] f32 running row max
    l_scr,  # scratch [BQ, LANE] f32 running row sum
    acc_scr,  # scratch [BQ, D] f32 output accumulator
    *,
    scale: float,
):
    kk = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kk == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # Fully-masked key tile (every key is bucket padding): nothing to
    # contribute — skip the QK matmul, exp, and PV entirely. Documents
    # embed through a bucket ladder (64..8192 tokens), so short docs in
    # long buckets are MOSTLY padding; attention cost now tracks the
    # real length, the same live-tile discipline as the paged KV walk.
    live = jnp.max(bias_ref[0]) > NEG_BIAS * 0.5

    @pl.when(live)
    def _tile():
        q = q_ref[0]
        k = k_ref[0]
        # [BQ, BK] logits on the MXU, f32 accumulation.
        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * scale + bias_ref[0]  # [1, BK] broadcast over query rows

        m_prev = m_scr[:, :1]  # [BQ, 1]
        l_prev = l_scr[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)  # [BQ, 1]
        p = jnp.exp(s - m_new)  # [BQ, BK] f32
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype),
            v_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = m_new + jnp.zeros_like(m_scr)
        l_scr[:] = l_new + jnp.zeros_like(l_scr)

    @pl.when(kk == nk - 1)
    def _emit():
        l = l_scr[:, :1]
        l = jnp.where(l <= 0.0, 1.0, l)  # fully-masked rows emit zeros
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "scale", "block_q", "block_k", "interpret"),
)
def _flash_jit(
    q: jax.Array,  # [BH, S, D]  (D lane-padded)
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,  # [B, 1, S] f32
    heads: int,
    scale: float,
    block_q: int,
    block_k: int,
    interpret: bool,
) -> jax.Array:
    bh, s, d = q.shape
    grid = (bh, s // block_q, s // block_k)
    kernel = functools.partial(_flash_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_k, d), lambda i, j, kk: (i, kk, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_k, d), lambda i, j, kk: (i, kk, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, block_k),
                lambda i, j, kk: (i // heads, 0, kk),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda i, j, kk: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, _LANE), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * s * s * d,
            bytes_accessed=3 * bh * s * d * q.dtype.itemsize
            + bh * s * d * q.dtype.itemsize,
            transcendentals=bh * s * s,
        ),
        interpret=interpret,
    )(q, k, v, bias)


def _pick_blocks(s: int) -> tuple[int, int]:
    """Block sizes: as large as VMEM comfortably allows, from S=1024 up.

    The kernel's cost at mid-range S was per-STEP overhead, not compute:
    at S=2048 the old 256/512 tiles ran a 2048-step grid at ~5 us/step
    (~67 MFLOP of work per step) — 6.6 TFLOP/s, 5x under XLA's fused
    attention. The 512/1024 tiles the S>=4096 rungs already used carry
    4x the work per step at the same fixed overhead (S=8192 measured
    2.6 us/step amortized). VMEM bound: the [BQ, BK] f32 probability
    tile (512x1024 = 2 MB) plus double-buffered K/V tiles stays well
    inside the 16M scope; 1024x2048 would blow it (8 MB p-tile)."""
    if s >= 1024:
        return 512, 1024
    return 128, min(512, _round_up(s, 128))


def flash_attention(
    q: jax.Array,  # [B, S, H, D]
    k: jax.Array,  # [B, S, H, D]
    v: jax.Array,  # [B, S, H, D]
    key_bias: jax.Array,  # [B, S] f32, 0 for real tokens / NEG_BIAS for pad
    *,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Bidirectional multi-head attention with key-padding bias.

    Accepts the encoder's natural ``[B, S, H, D]`` layout and any S/D
    (padded internally to block/lane multiples). Returns [B, S, H, D] in
    the input dtype.
    """
    b, s, h, d = q.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_q is None or block_k is None:
        bq, bk = _pick_blocks(s)
        block_q = block_q or bq
        block_k = block_k or bk
    scale = 1.0 / math.sqrt(d)

    s_pad = _round_up(s, max(block_q, block_k))
    d_pad = _round_up(d, _LANE)

    def to_bh(x):
        x = x.transpose(0, 2, 1, 3).reshape(b * h, s, d)
        return jnp.pad(x, ((0, 0), (0, s_pad - s), (0, d_pad - d)))

    qf, kf, vf = to_bh(q), to_bh(k), to_bh(v)
    bias = jnp.pad(
        key_bias.astype(jnp.float32),
        ((0, 0), (0, s_pad - s)),
        constant_values=NEG_BIAS,
    )[:, None, :]
    out = _flash_jit(qf, kf, vf, bias, h, scale, block_q, block_k, interpret)
    out = out[:, :s, :d].reshape(b, h, s, d).transpose(0, 2, 1, 3)
    return out
