"""Pallas w4a16 matmul: nibble-packed int4 weights dequantized in VMEM.

Decode is weight-HBM-bound, so 4-bit weights are the highest rung of the
quantized ladder — but the XLA unpack path (``models/decoder.py::
_mm_int4``) materializes the elementwise nibble unpack of the WHOLE
weight every step, which is why it measured 46 tok/s single-stream
against bf16's 248 (docs/BENCHMARKS.md, 2026-08-18). This kernel makes
the byte win real: the only HBM read of the weight is the packed uint8
stream; unpack + group dequant happen on tiles in VMEM and feed the MXU
directly.

Layout contract (must match ``quantize_decoder_params_int4``):
- ``q4``: [N, K//2] uint8, byte j packs elements (2j, 2j+1) as
  (low, high) two's-complement nibbles in [-8, 7];
- ``s4``: [N, G] f32 group scales, group size ``gsz = K // G`` along K.

The interleaved packing is what makes the kernel's scale logic cheap:
a 128-packed-lane chunk covers 256 consecutive elements = exactly two
128-element groups, so the per-element scale tile is a lane-position
select between two scale columns (no gathers, no lane reshapes — both
are Mosaic pain). ``gsz`` must be a multiple of 128 and the chunk pair
(2 groups) must not straddle a block boundary, i.e. ``gsz in (128,
256, ...)`` with the default 128 fully supported.

Reference seam: the reference delegates generation to an external API
(``app/llm_services.py:146-173``); the quantized decode ladder is this
framework's on-TPU extension of that component.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block(dim: int, candidates=(512, 256, 128)) -> int:
    for b in candidates:
        if dim % b == 0:
            return b
    return 0


def _w4a16_kernel_v2(
    xe_ref,  # [MP, KP] activations at even element positions
    xo_ref,  # [MP, KP] odd positions
    xs_ref,  # [MP, G] f32: per-group sums of x, pre-multiplied by -8
    q_ref,  # [BN, KP] packed uint8 (the WHOLE contraction dim)
    s_ref,  # [BN, G] f32 group scales
    o_ref,  # [MP, BN] out
    *,
    chunks: int,
    gsz: int,
    dt,
):
    """Single-k-step w4a16 tile: one grid dim over N, whole K in VMEM.

    Two ideas make this ~2x cheaper per byte than the v1 kernel:

    - **XOR bias fold.** A two's-complement nibble ``raw`` decodes as
      ``v = (raw ^ 8) - 8`` — one vector op for the biased value
      ``u = v + 8`` instead of v1's mask/shift/subtract sign-extend
      chain. The ``-8`` is linear in x, so it leaves the hot loop
      entirely: ``sum_e x*v*s = sum_e x*u*s - 8*sum_g s_g*(sum_{e in g}
      x_e)`` and the second term is ONE tiny MXU dot per grid step
      against host-precomputed group sums of x (``xs``).
    - **Static scale columns.** With the whole K resident, every
      128-lane chunk's group indices are Python constants, so the
      per-lane scale tile is a broadcast (or a fixed lane-64 select
      when a 256-element chunk straddles two 128-wide groups) — v1
      needed a one-hot MXU dot per chunk because its k-grid made the
      group index dynamic.
    """
    s_all = s_ref[...].astype(jnp.float32)  # [BN, G]
    # correction term: xs is -8 * group-sums, so acc STARTS at
    # -8 * sum_g s[n,g] * sum_{e in g} x[m,e]
    acc = jax.lax.dot_general(
        xs_ref[...],
        s_all,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [MP, BN]
    lane_lo = (
        jax.lax.broadcasted_iota(jnp.int32, (s_all.shape[0], 128), 1) < 64
    )
    for c in range(chunks):
        sl = slice(c * 128, (c + 1) * 128)
        qi = q_ref[:, sl].astype(jnp.int32)  # [BN, 128], top 24 bits 0
        ulo = ((qi & 15) ^ 8).astype(jnp.float32)  # v_lo + 8 in [0, 15]
        uhi = ((qi >> 4) ^ 8).astype(jnp.float32)
        # chunk c covers elements [256c, 256c+256): group of each half
        # is a Python constant; a straddle can only split at lane 64
        # (group boundaries are multiples of 128 elements = 64 lanes)
        g0 = (256 * c) // gsz
        g1 = (256 * c + 128) // gsz
        col0 = s_all[:, g0 : g0 + 1]  # [BN, 1] broadcasts along lanes
        if g1 == g0:
            sc = col0
        else:
            sc = jnp.where(lane_lo, col0, s_all[:, g1 : g1 + 1])
        wlo = (ulo * sc).astype(dt)  # [BN, 128]
        whi = (uhi * sc).astype(dt)
        acc += jax.lax.dot_general(
            xe_ref[:, sl],
            wlo,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc += jax.lax.dot_general(
            xo_ref[:, sl],
            whi,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[...] = acc.astype(o_ref.dtype)


def _w4a16_kernel(
    xe_ref,  # [MP, BKP] activations at even element positions
    xo_ref,  # [MP, BKP] odd positions
    q_ref,  # [BN, BKP] packed uint8
    s_ref,  # [BN, G_total] f32 group scales (whole G dim)
    o_ref,  # [MP, BN] out
    acc_ref,  # [MP, BN] f32 scratch
    *,
    n_k: int,
    chunks: int,
    gsz: int,
    dt,
):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    s_all = s_ref[...].astype(jnp.float32)  # [BN, G_total]
    g_total = s_all.shape[1]
    for c in range(chunks):
        # unpack in i32: Mosaic has no i8 vector shifts (arith.shrui on
        # vector<i8> fails to legalize); the widen is VPU-register-only
        qi = q_ref[:, c * 128 : (c + 1) * 128].astype(jnp.int32)
        lo = qi & 15
        hi = (qi >> 4) & 15
        lo = lo - ((lo & 8) << 1)  # sign-extend the nibble
        hi = hi - ((hi & 8) << 1)

        # elements of this chunk: [C*256, (C+1)*256) for global chunk
        # index C -> group g0 = C*256//gsz; at gsz=128 the chunk spans
        # two groups (first 64 packed lanes -> g0, rest -> g0+1), at
        # gsz>=256 one group covers it. Select per-lane between the two
        # scale columns with a one-hot MXU dot — dynamic lane slicing
        # and lane reshapes are what Mosaic punishes; iota compares and
        # a [G_total, 128] one-hot dot are free.
        cglob = k * chunks + c
        g0 = cglob * 256 // gsz
        dg = 1 if gsz == 128 else 0
        lane = jax.lax.broadcasted_iota(jnp.int32, (g_total, 128), 1)
        gidx = jax.lax.broadcasted_iota(jnp.int32, (g_total, 128), 0)
        want = jnp.where(lane < 64, g0, g0 + dg)
        onehot = (gidx == want).astype(jnp.float32)
        sc = jax.lax.dot_general(
            s_all,
            onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BN, 128] per-lane scales

        wlo = (lo.astype(jnp.float32) * sc).astype(dt)  # [BN, 128]
        whi = (hi.astype(jnp.float32) * sc).astype(dt)
        xe_c = xe_ref[:, c * 128 : (c + 1) * 128]  # [MP, 128]
        xo_c = xo_ref[:, c * 128 : (c + 1) * 128]
        acc_ref[...] += jax.lax.dot_general(
            xe_c,
            wlo,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] += jax.lax.dot_general(
            xo_c,
            whi,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(k == n_k - 1)
    def _emit():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


# v2 budget for the double-buffered packed-weight block (bytes); the
# whole-K block is 2*bn*kp on a ~16 MB VMEM alongside x/out/temps
_V2_Q_BUDGET = 8 * 1024 * 1024


def w4a16_matmul(
    x: jax.Array,  # [M, K] activations (bf16/f32)
    q4: jax.Array,  # [N, K//2] nibble-packed uint8
    s4: jax.Array,  # [N, G] f32 group scales
    dt=jnp.bfloat16,
    *,
    interpret: bool = False,
    variant: str = "auto",
) -> jax.Array:
    """``x @ dequant(q4, s4).T -> [M, N] f32``; weight HBM = 4 bits/elem.

    Same math as the XLA grouped path in ``models/decoder.py::_mm_int4``
    (unpack -> dt upcast -> group scale -> dot), so the two are
    interchangeable up to dot-order rounding in ``dt``.

    ``variant``: "v2" (default when it fits) grids over N only with the
    whole K resident per step — static scale columns, XOR bias fold;
    "v1" is the 2-D-grid kernel kept for K too large for VMEM and for
    A/B measurement (tools/bench_int4_kernel.py).
    """
    m, k = x.shape
    n, kp = q4.shape
    g = s4.shape[1]
    gsz = k // g
    if kp * 2 != k:
        raise ValueError(f"packed K mismatch: x K={k}, q4 Kp={kp}")
    if gsz % 128 or k % 256:
        raise ValueError(f"kernel needs gsz%128==0 and K%256==0, got gsz={gsz}, K={k}")

    bn = _pick_block(n)
    if not bn:
        raise ValueError(f"N={n} has no 128-multiple block split")
    if variant == "auto":
        # shrink the N block before giving up on the single-k-step form
        vbn = bn
        while vbn > 128 and 2 * vbn * kp > _V2_Q_BUDGET:
            vbn //= 2
        variant = "v2" if 2 * vbn * kp <= _V2_Q_BUDGET else "v1"
        if variant == "v2":
            bn = vbn
    if variant == "v1" and gsz != 128 and gsz % 256:
        raise ValueError(
            f"group size {gsz} straddles the 256-element packed chunks"
        )

    # activations split once by element parity (XLA, tiny) so the kernel
    # contracts packed lanes directly: packed lane j <-> elements 2j/2j+1
    xe = x[:, 0::2]
    xo = x[:, 1::2]
    mp = max(16, m)  # bf16 sublane tile floor; harmless for f32
    if mp != m:
        pad = jnp.zeros((mp - m, kp), x.dtype)
        xe = jnp.concatenate([xe, pad], axis=0)
        xo = jnp.concatenate([xo, pad], axis=0)

    if variant == "v2":
        # -8 * per-group sums of x, f32: seeds the bias-fold correction
        xs = x.astype(jnp.float32).reshape(m, g, gsz).sum(axis=2) * -8.0
        if mp != m:
            xs = jnp.concatenate([xs, jnp.zeros((mp - m, g), jnp.float32)])
        out = pl.pallas_call(
            functools.partial(
                _w4a16_kernel_v2, chunks=kp // 128, gsz=gsz, dt=dt
            ),
            grid=(n // bn,),
            in_specs=[
                pl.BlockSpec((mp, kp), lambda nb: (0, 0)),
                pl.BlockSpec((mp, kp), lambda nb: (0, 0)),
                pl.BlockSpec((mp, g), lambda nb: (0, 0)),
                pl.BlockSpec((bn, kp), lambda nb: (nb, 0)),
                pl.BlockSpec((bn, g), lambda nb: (nb, 0)),
            ],
            out_specs=pl.BlockSpec((mp, bn), lambda nb: (0, nb)),
            out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
            interpret=interpret,
        )(xe, xo, xs, q4, s4)
        return out[:m]

    bkp = _pick_block(kp)
    if not bkp:
        raise ValueError(f"Kp={kp} has no 128-multiple block split")
    n_k = kp // bkp
    grid = (n // bn, n_k)
    out = pl.pallas_call(
        functools.partial(
            _w4a16_kernel,
            n_k=n_k,
            chunks=bkp // 128,
            gsz=gsz,
            dt=dt,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((mp, bkp), lambda nb, kb: (0, kb)),
            pl.BlockSpec((mp, bkp), lambda nb, kb: (0, kb)),
            pl.BlockSpec((bn, bkp), lambda nb, kb: (nb, kb)),
            pl.BlockSpec((bn, g), lambda nb, kb: (nb, 0)),
        ],
        out_specs=pl.BlockSpec((mp, bn), lambda nb, kb: (0, nb)),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((mp, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xe, xo, q4, s4)
    return out[:m]
