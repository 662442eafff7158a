"""Pallas int4-weight matmuls: nibble-packed weights dequantized in VMEM.

Decode is weight-HBM-bound, so 4-bit weights are the highest rung of the
quantized ladder — but the XLA unpack path (``models/decoder.py::
_mm_int4``) materializes the elementwise nibble unpack of the WHOLE
weight every step (46 tok/s single-stream vs bf16's 248,
docs/BENCHMARKS.md). These kernels make the byte win real: the only HBM
read of the weight is the packed uint8 stream; unpack + group dequant
happen on tiles in VMEM and feed the MXU directly.

Two kernels, one storage format:

- :func:`w4a8_matmul` (the fast path) — decodes nibbles STRAIGHT to int8
  MXU operands in two vector ops per packed byte and runs int8 x int8
  dots with the group scales applied post-dot in f32. Activations are
  per-row int8-quantized (same recipe as ``ops/int8_linear.w8a8_matmul``,
  the production int8 mode), so this is w4a8: the v1/v2 w4a16 VPU decode
  (widen -> mask/shift -> sign-fix -> convert -> scale -> downcast, ~11
  vector ops per byte) was measured purely VPU-bound at ~85 GB/s
  effective — an order of magnitude under the chip's HBM stream.
- :func:`w4a16_matmul` — the float-decode kernels (v1 2-D grid fallback,
  v2 whole-K), kept for the exact w4a16 numerics (no activation
  quantization) and for A/B measurement (tools/bench_int4_kernel.py).

Layout contract (must match ``quantize_decoder_params_int4``):
- ``q4``: [N, K//2] uint8 in *block-pair* layout: packed lane ``128*c +
  j`` (j in [0, 128)) holds elements ``256*c + j`` (LOW nibble) and
  ``256*c + 128 + j`` (HIGH nibble). The LOW nibble stores the BIASED
  value ``v + 8`` in [0, 15]; the HIGH nibble stores ``v`` two's
  complement in [-8, 7].
- ``s4``: [N, G] f32 group scales, group size ``gsz = K // G`` along K.

Why that asymmetric layout: Mosaic has no sub-32-bit vector shifts or
multiplies (``arith.shrui``/``arith.muli`` on vector<i8/i16> fail to
legalize), but bitwise AND on u8 vectors and same-width bitcasts DO
work — so the two cheapest possible decodes are

  ``bitcast_i8(q & 0x0F)`` =  v_lo + 8   (biased low nibble), and
  ``bitcast_i8(q & 0xF0)`` = 16 * v_hi   (two's-complement high nibble:
                              the sign bit lands in the byte's sign bit),

one AND each, no widening. The ``+8`` bias is linear in x and folds into
one tiny correction dot per grid step; the ``16x`` folds into the high
groups' post-dot scale. The block-pair layout makes every 128-lane
chunk's two halves live in single whole scale groups (constant group
index per chunk — no lane selects), and keeps contiguous packed-lane
shards equal to contiguous element shards for any 256-element-aligned
split (TP row-parallel sharding, ``parallel/tp.py``).

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


# ---------------------------------------------------------------------------
# w4a8: int8-MXU kernel (the fast path)
# ---------------------------------------------------------------------------


def _w4a8_kernel_v3(
    xq_ref,  # [MP, K] int8 activations (per-row quantized)
    xs2_ref,  # [MP, G] f32: -8 * per-group sums of xq over LO elements
    q_ref,  # [BN, KP] packed uint8 (the WHOLE contraction dim)
    s_ref,  # [BN, G] f32 group scales
    o_ref,  # [MP, BN] f32 out
    *,
    chunks: int,
    gsz: int,
):
    """Single-k-step w4a8 tile: grid over N only, whole K resident.

    Decode is TWO u8 ANDs per 128-lane chunk (see module docstring);
    the int8 x int8 dots hit the MXU's native int8 path with exact i32
    accumulation, and the f32 group scales multiply the [MP, BN] dot
    RESULTS (cheap: M rides the sublane axis), not the weight tiles.
    The scale rows come from one in-kernel transpose of the [BN, G]
    scale block per grid step; HIGHEST on the correction dot because
    its f32 operands would otherwise be bf16-truncated by the MXU (the
    repo-wide f32 score-path rule — bit this kernel's first compile)."""
    s_all = s_ref[...]  # [BN, G] f32
    # lo-bias correction: acc starts at sum_g s[n,g] * xs2[m,g]
    acc = jax.lax.dot_general(
        xs2_ref[...],
        s_all,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [MP, BN]
    st = s_all.T  # [G, BN]: scale rows broadcast over sublanes
    if gsz == 128:
        # group == 128-block: odd groups hold HIGH halves -> their rows
        # carry the 1/16 from the 16*v_hi decode (built once per step)
        gi = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
        st = jnp.where(gi % 2 == 1, st * (1.0 / 16.0), st)
        hi_scaled = True
    else:
        hi_scaled = False
    for c in range(chunks):
        sl = slice(c * 128, (c + 1) * 128)
        q = q_ref[:, sl]  # [BN, 128] u8
        lo8 = jax.lax.bitcast_convert_type(q & jnp.uint8(0x0F), jnp.int8)
        hi8 = jax.lax.bitcast_convert_type(q & jnp.uint8(0xF0), jnp.int8)
        xa = xq_ref[:, 256 * c : 256 * c + 128]  # [MP, 128] i8
        xb = xq_ref[:, 256 * c + 128 : 256 * c + 256]
        dlo = jax.lax.dot_general(
            xa, lo8,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [MP, BN]
        dhi = jax.lax.dot_general(
            xb, hi8,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        gl = (256 * c) // gsz
        gh = (256 * c + 128) // gsz
        rl = st[gl : gl + 1, :]  # [1, BN]
        rh = st[gh : gh + 1, :]
        if not hi_scaled:
            rh = rh * (1.0 / 16.0)
        acc = acc + dlo.astype(jnp.float32) * rl + dhi.astype(jnp.float32) * rh
    o_ref[...] = acc


# VMEM budget for the double-buffered packed-weight block (bytes); the
# whole-K block is 2*bn*kp on a ~16 MB VMEM alongside x/out/temps
_Q_BUDGET = 8 * 1024 * 1024


def _shrink_bn(bn: int, kp: int) -> int:
    while bn > 128 and 2 * bn * kp > _Q_BUDGET:
        bn //= 2
    return bn


def w4a8_matmul(
    x: jax.Array,  # [M, K] activations (bf16/f32)
    q4: jax.Array,  # [N, K//2] block-pair packed uint8
    s4: jax.Array,  # [N, G] f32 group scales
    *,
    interpret: bool = False,
) -> jax.Array:
    """``quant8(x) @ dequant(q4, s4).T -> [M, N] f32``, weight HBM = 4
    bits/elem, int8 MXU dots.

    w4a8 numerics: activations are per-row absmax int8 (the
    ``w8a8_matmul`` recipe — same rounding, same eps), weights are the
    stored int4 groups; every integer product and accumulation is
    exact, scales apply in f32. Logit-cosine parity vs the float
    forward is pinned in tests/test_int4.py alongside the w4a16 path.
    """
    m, k = x.shape
    n, kp = q4.shape
    g = s4.shape[1]
    gsz = k // g
    if kp * 2 != k:
        raise ValueError(f"packed K mismatch: x K={k}, q4 Kp={kp}")
    if gsz % 128 or k % 256:
        raise ValueError(
            f"kernel needs gsz%128==0 and K%256==0, got gsz={gsz}, K={k}"
        )
    bn = _pick_block(n)
    if not bn:
        raise ValueError(f"N={n} has no 128-multiple block split")
    bn = _shrink_bn(bn, kp)
    if 2 * bn * kp > _Q_BUDGET:
        raise ValueError(
            f"packed block [{bn}, {kp}] exceeds the VMEM budget even at "
            f"bn=128; use the XLA path for K={k}"
        )

    # per-row activation quantization (w8a8_matmul's exact recipe)
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=1, keepdims=True)
    sx = jnp.maximum(amax / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
    mp = -(-max(m, 32) // 32) * 32  # int8 sublane tile floor
    if mp != m:
        xq = jnp.concatenate([xq, jnp.zeros((mp - m, k), jnp.int8)], axis=0)
    # -8 * per-group sums of xq over LOW-nibble elements (even 128-blocks)
    kb = k // 128
    bs = xq.astype(jnp.float32).reshape(mp, kb, 128).sum(-1)
    bs = bs * ((jnp.arange(kb) % 2) == 0).astype(jnp.float32)[None, :]
    xs2 = -8.0 * bs.reshape(mp, g, gsz // 128).sum(-1)

    out = pl.pallas_call(
        functools.partial(_w4a8_kernel_v3, chunks=kp // 128, gsz=gsz),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((mp, k), lambda nb: (0, 0)),
            pl.BlockSpec((mp, g), lambda nb: (0, 0)),
            pl.BlockSpec((bn, kp), lambda nb: (nb, 0)),
            pl.BlockSpec((bn, g), lambda nb: (nb, 0)),
        ],
        out_specs=pl.BlockSpec((mp, bn), lambda nb: (0, nb)),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=n * kp + mp * k + 4 * mp * n,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, xs2, q4, s4)
    return out[:m] * sx[:m]


# ---------------------------------------------------------------------------
# w4a16: float-decode kernels (exact activation numerics; A/B baselines)
# ---------------------------------------------------------------------------


def _w4a16_kernel_v2(
    x_ref,  # [MP, K] activations
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

    Biased-value decode: the stored LOW nibble IS ``v + 8``; the HIGH
    nibble is two's complement, one XOR from biased. The ``-8`` is
    linear in x and leaves the hot loop entirely (``xs`` correction
    dot). Note the bias fold rounds differently from v1: v2 casts the
    biased product ``(v + 8) * s`` to ``dt`` where v1 casts ``v * s`` —
    at dt=bfloat16 the effective weights can differ by up to ~2x the
    per-element rounding ulp (small next to int4 quantization noise;
    agreement is pinned in tests/test_int4_linear.py at bf16)."""
    s_all = s_ref[...].astype(jnp.float32)  # [BN, G]
    acc = jax.lax.dot_general(
        xs_ref[...],
        s_all,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [MP, BN]
    for c in range(chunks):
        sl = slice(c * 128, (c + 1) * 128)
        qi = q_ref[:, sl].astype(jnp.int32)  # top 24 bits 0
        ulo = (qi & 15).astype(jnp.float32)  # stored biased: v_lo + 8
        uhi = ((qi >> 4) ^ 8).astype(jnp.float32)  # signed -> v_hi + 8
        gl = (256 * c) // gsz
        gh = (256 * c + 128) // gsz
        wlo = (ulo * s_all[:, gl : gl + 1]).astype(dt)  # [BN, 128]
        whi = (uhi * s_all[:, gh : gh + 1]).astype(dt)
        acc += jax.lax.dot_general(
            x_ref[:, 256 * c : 256 * c + 128],
            wlo,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc += jax.lax.dot_general(
            x_ref[:, 256 * c + 128 : 256 * c + 256],
            whi,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[...] = acc.astype(o_ref.dtype)


def _w4a16_kernel(
    x_ref,  # [MP, 2*BKP] activations for this k block
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
    """v1: 2-D grid (N x K) fallback for K too large for a whole-K
    block. Unbiased decode (``v * s`` in dt — the reference numerics
    the XLA oracle uses)."""
    kstep = pl.program_id(1)

    @pl.when(kstep == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    s_all = s_ref[...].astype(jnp.float32)  # [BN, G_total]
    for c in range(chunks):
        # unpack in i32: Mosaic has no i8/i16 vector shifts (arith.shrui
        # fails to legalize below 32 bits); the widen is VPU-only
        qi = q_ref[:, c * 128 : (c + 1) * 128].astype(jnp.int32)
        vlo = (qi & 15) - 8  # stored biased -> signed
        vhi = ((qi >> 4) ^ 8) - 8  # two's complement -> signed
        # the group indices depend on the traced k-grid step, so the
        # per-half scale columns come from a masked reduce over the
        # (small) G axis rather than a (dynamic) lane slice
        cglob = kstep * chunks + c
        gl = (256 * cglob) // gsz
        gh = (256 * cglob + 128) // gsz
        gidx = jax.lax.broadcasted_iota(jnp.int32, s_all.shape, 1)
        scl = jnp.sum(
            jnp.where(gidx == gl, s_all, 0.0), axis=1, keepdims=True
        )
        sch = jnp.sum(
            jnp.where(gidx == gh, s_all, 0.0), axis=1, keepdims=True
        )
        wlo = (vlo.astype(jnp.float32) * scl).astype(dt)
        whi = (vhi.astype(jnp.float32) * sch).astype(dt)
        acc_ref[...] += jax.lax.dot_general(
            x_ref[:, 256 * c : 256 * c + 128],
            wlo,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] += jax.lax.dot_general(
            x_ref[:, 256 * c + 128 : 256 * c + 256],
            whi,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kstep == n_k - 1)
    def _emit():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def w4a16_matmul(
    x: jax.Array,  # [M, K] activations (bf16/f32)
    q4: jax.Array,  # [N, K//2] block-pair packed uint8
    s4: jax.Array,  # [N, G] f32 group scales
    dt=jnp.bfloat16,
    *,
    interpret: bool = False,
    variant: str = "auto",
) -> jax.Array:
    """``x @ dequant(q4, s4).T -> [M, N] f32``; weight HBM = 4 bits/elem.

    Same math as the XLA grouped path in ``models/decoder.py::_mm_int4``
    (unpack -> dt upcast -> group scale -> dot), so the two are
    interchangeable up to dot-order rounding in ``dt`` (plus v2's
    bias-fold rounding — see the kernel docstring).

    ``variant``: "v2" (default when it fits) grids over N only with the
    whole K resident per step; "v1" is the 2-D-grid kernel kept for K
    too large for VMEM and for A/B measurement
    (tools/bench_int4_kernel.py). The faster int8-dot path is
    :func:`w4a8_matmul` (different activation numerics).
    """
    if variant not in ("auto", "v1", "v2"):
        raise ValueError(
            f"variant must be one of 'auto', 'v1', 'v2'; got {variant!r}"
        )
    m, k = x.shape
    n, kp = q4.shape
    g = s4.shape[1]
    gsz = k // g
    if kp * 2 != k:
        raise ValueError(f"packed K mismatch: x K={k}, q4 Kp={kp}")
    if gsz % 128 or k % 256:
        raise ValueError(
            f"kernel needs gsz%128==0 and K%256==0, got gsz={gsz}, K={k}"
        )

    bn = _pick_block(n)
    if not bn:
        raise ValueError(f"N={n} has no 128-multiple block split")
    if variant in ("auto", "v2"):
        # shrink the N block before giving up on the single-k-step form
        vbn = _shrink_bn(bn, kp)
        if 2 * vbn * kp <= _Q_BUDGET:
            variant, bn = "v2", vbn
        elif variant == "v2":
            raise ValueError(
                f"variant='v2' forced but the packed block [{vbn}, {kp}] "
                f"exceeds the {_Q_BUDGET}-byte VMEM budget even at bn=128"
            )
        else:
            variant = "v1"

    mp = max(16, m)  # bf16 sublane tile floor; harmless for f32
    xk = x
    if mp != m:
        xk = jnp.concatenate([xk, jnp.zeros((mp - m, k), x.dtype)], axis=0)

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
                pl.BlockSpec((mp, k), lambda nb: (0, 0)),
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
        )(xk, xs, q4, s4)
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
            pl.BlockSpec((mp, 2 * bkp), lambda nb, kb: (0, kb)),
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
    )(xk, q4, s4)
    return out[:m]
