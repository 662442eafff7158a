"""Fused cosine-score + top-K kernels.

This is the device-side replacement for the reference retrieval core: the
pgvector exact/HNSW cosine top-K SQL (reference ``app/database.py:118-139``,
queried via ``app/rag.py:85-87``) becomes a tiled matmul over a
device-resident corpus matrix with the K-select fused into the same kernel,
so the ``[B, N]`` score matrix never materializes in HBM.

Three entry points:

- :func:`topk_xla`    — pure XLA path (``jnp.dot`` + ``lax.top_k``); the
                        correctness oracle and the fallback on any backend.
- :func:`topk_pallas` — the Pallas TPU kernel: grid over corpus tiles;
                        each step computes a score tile on the MXU and
                        merges it into a running per-query top-K
                        accumulator held in VMEM scratch. A per-tile
                        threshold test skips merge work for tiles that
                        cannot contribute, and the merge itself is an
                        early-exit extraction loop (a tile rarely adds
                        more than 1-2 entries). Two orientations exist;
                        the default "qmajor" keeps queries on the sublane
                        axis so all K-select reductions run lane-wise.
- :func:`cosine_topk` — dispatcher with padding/masking plumbing; picks the
                        Pallas path on TPU and interpret-mode Pallas or XLA
                        elsewhere.

Conventions: queries and corpus rows are expected L2-normalized (cosine ==
dot). Invalid rows (tombstones / capacity padding — see
``outline_rag_tpu.index.shard``) are excluded via an additive ``[N]`` f32
penalty mask (0 for valid, ``NEG`` for invalid). Ties break toward the lower
index, matching ``lax.top_k``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30

# Largest corpus handled by a single kernel launch; bigger corpora are
# segmented and merged (grid sizes past ~4-8k steps stress the compiler).
MAX_ROWS_PER_CALL = 4_194_304


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# XLA reference path
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "seg"))
def topk_wide(
    scores: jax.Array, k: int, seg: int = 8192
) -> tuple[jax.Array, jax.Array]:
    """Two-stage top-k over wide score rows: per-segment top-k, then
    top-k of the ~N/seg*k survivors.

    MEASURED SLOWER than plain ``lax.top_k`` on TPU (1.36 vs 1.01 ms at
    [32, 99328] fp32 — tools/bench_topk_kernel.py ``xla`` vs
    ``xla1stage``): XLA's native top-k handles wide rows well and the
    reshape + second select + gather overhead loses. Kept as a utility
    (exact, tie-break-parity-tested) but NOT routed on the score paths.

    Tie-break parity with ``lax.top_k`` (lowest index wins) is exact:
    within a segment lax.top_k orders ties by index; across segments the
    merge sees candidates laid out in segment order, so equal values
    resolve to the lower segment — i.e. the lower corpus index.
    """
    b, n = scores.shape
    if n <= seg or k > seg:
        # narrow rows gain nothing; k > seg would overflow the segment
        # top-k (single-stage handles any k <= n, as before)
        vals, idx = jax.lax.top_k(scores, k)
        return vals, idx.astype(jnp.int32)
    nseg = -(-n // seg)
    pad = nseg * seg - n
    if pad:
        scores = jnp.pad(
            scores, ((0, 0), (0, pad)), constant_values=-jnp.inf
        )
    v, i = jax.lax.top_k(scores.reshape(b, nseg, seg), k)  # [B, nseg, k]
    base = (jnp.arange(nseg, dtype=jnp.int32) * seg)[None, :, None]
    flat_v = v.reshape(b, nseg * k)
    flat_i = (i.astype(jnp.int32) + base).reshape(b, nseg * k)
    vals, j = jax.lax.top_k(flat_v, k)
    idx = jnp.take_along_axis(flat_i, j, axis=1)
    return vals, idx


@functools.partial(jax.jit, static_argnames=("k",))
def topk_xla(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    penalty: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Exact cosine top-K via XLA: materializes [B, N] scores in HBM.

    ``penalty``: optional additive f32 mask of shape [N] (0 valid / NEG
    invalid).
    """
    precision = (
        jax.lax.Precision.HIGHEST
        if corpus.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    scores = jnp.dot(
        queries.astype(corpus.dtype),
        corpus.T,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    if penalty is not None:
        scores = scores + penalty[None, :]
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Top-K merge (shared by the kernel wrapper and the cross-shard merge)
# ---------------------------------------------------------------------------


def split_f32_bf16x2(x: jax.Array) -> jax.Array:
    """f32 [..., D] -> compensated bf16 pair [..., 2D] (hi ++ lo).

    ``x ~= hi + lo`` with hi = bf16(x), lo = bf16(x - hi). The dot of two
    such pairs via three bf16 MXU passes (hi.hi + hi.lo + lo.hi) carries
    ~2^-22 relative error — float32-class accuracy at bf16 MXU speed,
    with the decomposition paid ONCE at index build instead of per query
    tile (the VPU split inside an fp32 HIGHEST dot is what made the
    fused kernel lose to XLA at B=32; docs/BENCHMARKS.md).
    Storage cost is identical to f32: 4 bytes per dimension.
    """
    hi = x.astype(jnp.bfloat16)
    # The barrier is load-bearing: when this split is traced inside a
    # larger jitted program (the query paths — topk_xla_compensated and
    # topk_pallas split queries at trace level), the TPU compiler's
    # simplifier treats f32(bf16(x)) as x and folds ``lo`` to exactly 0,
    # silently degrading f32x2 scoring to plain bf16 (measured 2.4e-4
    # error vs 4.5e-8 with the barrier; eager/ingest calls were never
    # affected because each op compiles separately).
    hi = jax.lax.optimization_barrier(hi)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo], axis=-1)


def join_bf16x2(x2: jax.Array) -> jax.Array:
    """Inverse of :func:`split_f32_bf16x2` (up to 2^-24 rounding)."""
    d = x2.shape[-1] // 2
    return x2[..., :d].astype(jnp.float32) + x2[..., d:].astype(jnp.float32)


def _is_compensated(queries: jax.Array, corpus: jax.Array) -> bool:
    """Structural detection of the bf16x2 corpus layout: bf16 storage
    twice as wide as the f32 queries."""
    return (
        corpus.dtype == jnp.bfloat16
        and queries.dtype == jnp.float32
        and queries.ndim == 2
        and corpus.shape[-1] == 2 * queries.shape[-1]
    )


def _dot_compensated(q2: jax.Array, c2: jax.Array) -> jax.Array:
    """[TB, 2D] bf16 x [TN, 2D] bf16 -> [TB, TN] f32 via 3 bf16 passes."""
    d = q2.shape[-1] // 2
    qhi, qlo = q2[:, :d], q2[:, d:]
    chi, clo = c2[:, :d], c2[:, d:]

    def dot(a, b):
        return jax.lax.dot_general(
            a,
            b,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return dot(qhi, chi) + dot(qhi, clo) + dot(qlo, chi)


@functools.partial(jax.jit, static_argnames=("k",))
def topk_xla_compensated(
    queries: jax.Array,  # [B, D] f32
    corpus: jax.Array,  # [N, 2D] bf16 (split_f32_bf16x2 layout)
    k: int,
    penalty: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """XLA fallback for the bf16x2 corpus layout: the same three-pass
    compensated dot, materializing [B, N] scores."""
    scores = _dot_compensated(split_f32_bf16x2(queries), corpus)
    if penalty is not None:
        scores = scores + penalty[None, :]
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx.astype(jnp.int32)


def merge_topk(
    vals_a: jax.Array,
    idx_a: jax.Array,
    vals_b: jax.Array,
    idx_b: jax.Array,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Merge two per-query top lists [B, Ka], [B, Kb] -> top-k of the union.

    Used to combine per-shard results after the cross-shard all-gather
    (SURVEY.md section 2c: per-shard local top-K then global merge is the
    only collective the query path needs).
    """
    vals = jnp.concatenate([vals_a, vals_b], axis=1)
    idx = jnp.concatenate([idx_a, idx_b], axis=1)
    top_vals, pos = jax.lax.top_k(vals, k)
    top_idx = jnp.take_along_axis(idx, pos, axis=1)
    return top_vals, top_idx


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------


def _fused_topk_kernel(
    q_ref,  # [TB, D] VMEM (f32/bf16, or int8 codes)
    c_ref,  # [TN, D] VMEM (corpus tile; f32/bf16, or int8 codes)
    pen_ref,  # [TN, 1] VMEM (additive penalty for this tile's rows)
    cscale_ref,  # [TN, 1] VMEM (per-row corpus scales; ones unless int8)
    qscale_ref,  # [1, TB] VMEM (per-query scales; ones unless int8)
    out_vals_ref,  # [K, TB] VMEM (transposed; wrapper transposes back)
    out_idx_ref,  # [K, TB] VMEM (int32)
    acc_vals,  # scratch [K, TB] f32 (sorted desc along axis 0)
    acc_idx,  # scratch [K, TB] i32
    *,
    k: int,
    block_n: int,
):
    """Everything runs in transposed orientation: the score tile is
    ``C_tile @ Q^T -> [TN, TB]`` so the MXU's M-dimension is the corpus
    tile (128-aligned, fully utilized) rather than the small query batch;
    reductions run along the sublane axis and the accumulator lives as
    [K, TB], so no in-kernel transposes are needed. int8 mode does the dot
    in int8 -> int32 on the MXU and rescales in f32 with the fused per-row
    and per-query scales."""
    n_tile = pl.program_id(0)
    num_n = pl.num_programs(0)

    @pl.when(n_tile == 0)
    def _init():
        acc_vals[:] = jnp.full_like(acc_vals, NEG)
        acc_idx[:] = jnp.zeros_like(acc_idx)

    # [TN, TB] score tile on the MXU, accumulated in f32. fp32 inputs use
    # HIGHEST precision (multi-pass bf16 on the MXU) so the fp32 mode is
    # exact-parity with the pgvector exact scan; bf16/int8 modes use the
    # fast single-pass path.
    is_int8 = c_ref.dtype == jnp.int8
    precision = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    s = jax.lax.dot_general(
        c_ref[:],
        q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32 if is_int8 else jnp.float32,
        precision=precision,
    )
    if is_int8:
        s = s.astype(jnp.float32) * cscale_ref[:] * qscale_ref[:]
    s = s + pen_ref[:]  # [TN, 1] broadcast over queries

    base = n_tile * block_n
    tb = s.shape[1]

    # Tile-level skip: merge only if some query's best tile score beats
    # that query's current kth value (per-query floors — a global-min floor
    # would false-trigger constantly at larger batch sizes). After warm-up
    # most tiles fail this test and skip the K-pass merge entirely.
    tile_qmax = jnp.max(s, axis=0)  # [TB]
    needs_merge = jnp.any(tile_qmax > acc_vals[k - 1, :])

    @pl.when(needs_merge)
    def _merge():
        row = jax.lax.broadcasted_iota(jnp.int32, (block_n, tb), 0)
        new_vals = acc_vals[:]
        new_idx = acc_idx[:]
        krow = jax.lax.broadcasted_iota(jnp.int32, (k, tb), 0)
        scores = s
        # K passes of column-wise max/argmax over the tile, each winner
        # inserted into the sorted accumulator.
        for _ in range(k):
            m = jnp.max(scores, axis=0, keepdims=True)  # [1, TB]
            hit = scores == m
            # lowest corpus index wins ties (lax.top_k semantics)
            pos = jnp.min(
                jnp.where(hit, row, jnp.int32(2**30)), axis=0, keepdims=True
            )  # [1, TB]
            chosen = row == pos
            scores = jnp.where(chosen, NEG, scores)
            m_idx = pos + base  # [1, TB]

            # Insert (m, m_idx): slots below the insertion point shift down.
            below = new_vals < m  # [K, TB]; sorted desc -> suffix mask
            ins_pos = jnp.sum(
                jnp.where(below, 0, 1), axis=0, keepdims=True
            )  # [1, TB] first slot whose value < m
            if k > 1:
                prev_vals = jnp.concatenate(
                    [jnp.full((1, tb), NEG, new_vals.dtype), new_vals[:-1, :]],
                    axis=0,
                )
                prev_idx = jnp.concatenate(
                    [jnp.zeros((1, tb), new_idx.dtype), new_idx[:-1, :]], axis=0
                )
            else:
                prev_vals = jnp.full((1, tb), NEG, new_vals.dtype)
                prev_idx = jnp.zeros((1, tb), new_idx.dtype)
            take_new = krow == ins_pos
            shift = krow > ins_pos
            new_vals = jnp.where(take_new, m, jnp.where(shift, prev_vals, new_vals))
            new_idx = jnp.where(
                take_new, m_idx, jnp.where(shift, prev_idx, new_idx)
            )
        acc_vals[:] = new_vals
        acc_idx[:] = new_idx

    @pl.when(n_tile == num_n - 1)
    def _emit():
        out_vals_ref[:] = acc_vals[:]
        out_idx_ref[:] = acc_idx[:]


def _fused_topk_kernel_qmajor(
    q_ref,  # [TB, D] VMEM (f32/bf16, or int8 codes)
    c_ref,  # [TN, D] VMEM (corpus tile)
    pen_ref,  # [1, TN] VMEM (additive penalty for this tile's rows)
    cscale_ref,  # [1, TN] VMEM (per-row corpus scales; ones unless int8)
    qscale_ref,  # [TB, 1] VMEM (per-query scales; ones unless int8)
    out_vals_ref,  # [TB, K] VMEM
    out_idx_ref,  # [TB, K] VMEM (int32)
    acc_vals,  # scratch [TB, K] f32 (sorted desc along axis 1)
    acc_idx,  # scratch [TB, K] i32
    *,
    k: int,
    block_n: int,
    compensated: bool = False,
    unroll_merge: int = 0,
):
    """Query-major orientation: the score tile is ``Q @ C_tile^T -> [TB,
    TN]`` so every selection reduction (tile max, argmax, the K insert
    passes) runs along the LANE axis — the cheap VPU direction. The
    transposed kernel above keeps the MXU M-dimension fully fed but pays
    ~3x in sublane-axis reductions whenever a merge triggers; with B
    queries sharing one skip floor a merge fires on most steps, so this
    orientation is faster end-to-end for every dtype (measured fp32
    B=32: 6.9 vs 10.1 ms at 500k; int8 B=128: 3.6 vs 6.8 ms at 1M —
    tools/bench_topk_kernel.py). int8 queries are padded to 32 rows to
    satisfy the int8 MXU sublane tile.

    ``compensated``: inputs are bf16x2 pairs ([*, 2D], split_f32_bf16x2)
    and the score is three DEFAULT-precision bf16 MXU passes — f32-class
    accuracy without the per-tile VPU decomposition an fp32 HIGHEST dot
    performs (which made fp32 lose to XLA; docs/BENCHMARKS.md)."""
    n_tile = pl.program_id(0)
    num_n = pl.num_programs(0)

    @pl.when(n_tile == 0)
    def _init():
        acc_vals[:] = jnp.full_like(acc_vals, NEG)
        acc_idx[:] = jnp.zeros_like(acc_idx)

    is_int8 = c_ref.dtype == jnp.int8
    if compensated:
        s = _dot_compensated(q_ref[:], c_ref[:])  # [TB, TN]
    else:
        precision = (
            jax.lax.Precision.HIGHEST
            if q_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        s = jax.lax.dot_general(
            q_ref[:],
            c_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32 if is_int8 else jnp.float32,
            precision=precision,
        )  # [TB, TN]
    if is_int8:
        s = s.astype(jnp.float32) * cscale_ref[:] * qscale_ref[:]
    s = s + pen_ref[:]  # [1, TN] broadcast over queries

    base = n_tile * block_n
    tb = s.shape[0]

    tile_qmax = jnp.max(s, axis=1)  # [TB]; lane reduction
    needs_merge = jnp.any(tile_qmax > acc_vals[:, k - 1])

    @pl.when(needs_merge)
    def _merge():
        col = jax.lax.broadcasted_iota(jnp.int32, (tb, block_n), 1)
        kcol = jax.lax.broadcasted_iota(jnp.int32, (tb, k), 1)

        # Early-exit extraction: a tile usually contributes only 1-2 new
        # top-K entries, so instead of K fixed passes, loop until the
        # best remaining tile score no longer beats any query's kth
        # value (amortized ~1 pass/step instead of K).
        def cond(state):
            i, scores, new_vals, _ = state
            still = jnp.any(jnp.max(scores, axis=1) > new_vals[:, k - 1])
            return jnp.logical_and(i < k, still)

        def body(state):
            i, scores, new_vals, new_idx = state
            m = jnp.max(scores, axis=1, keepdims=True)  # [TB, 1]
            hit = scores == m
            pos = jnp.min(
                jnp.where(hit, col, jnp.int32(2**30)), axis=1, keepdims=True
            )  # [TB, 1]; lowest corpus index wins ties
            scores = jnp.where(col == pos, NEG, scores)
            m_idx = pos + base  # [TB, 1]

            below = new_vals < m  # [TB, K] sorted desc -> suffix mask
            ins_pos = jnp.sum(
                jnp.where(below, 0, 1), axis=1, keepdims=True
            )  # [TB, 1]
            if k > 1:
                prev_vals = jnp.concatenate(
                    [jnp.full((tb, 1), NEG, new_vals.dtype), new_vals[:, :-1]],
                    axis=1,
                )
                prev_idx = jnp.concatenate(
                    [jnp.zeros((tb, 1), new_idx.dtype), new_idx[:, :-1]], axis=1
                )
            else:
                prev_vals = jnp.full((tb, 1), NEG, new_vals.dtype)
                prev_idx = jnp.zeros((tb, 1), new_idx.dtype)
            # queries whose m doesn't beat their kth get ins_pos == k,
            # which makes both masks all-False — a natural no-op
            take_new = kcol == ins_pos
            shift = kcol > ins_pos
            new_vals = jnp.where(take_new, m, jnp.where(shift, prev_vals, new_vals))
            new_idx = jnp.where(
                take_new, m_idx, jnp.where(shift, prev_idx, new_idx)
            )
            return i + 1, scores, new_vals, new_idx

        state = (jnp.int32(0), s, acc_vals[:], acc_idx[:])
        # ``unroll_merge`` straight-line extraction passes before the
        # while_loop: a while iteration pays scalar-core/sync overhead
        # that dwarfs its vector work, and at small N a merge fires on
        # nearly every tile with only 1-4 candidates — unrolled passes
        # (each a natural no-op once candidates are exhausted) pipeline
        # as pure vector code and the loop only runs for the rare tile
        # with more than ``unroll_merge`` insertions.
        for _ in range(min(unroll_merge, k)):
            state = body(state)
        if unroll_merge >= k:
            # fully static merge: k passes cover every possible insertion,
            # so the while_loop (and even its one cond evaluation) is dead
            _, _, new_vals, new_idx = state
        else:
            _, _, new_vals, new_idx = jax.lax.while_loop(cond, body, state)
        acc_vals[:] = new_vals
        acc_idx[:] = new_idx

    @pl.when(n_tile == num_n - 1)
    def _emit():
        out_vals_ref[:] = acc_vals[:]
        out_idx_ref[:] = acc_idx[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "block_n", "interpret", "compensated", "unroll_merge",
        "n_rows", "row_block_offset",
    ),
)
def _topk_pallas_qmajor_jit(
    queries: jax.Array,
    corpus: jax.Array,
    pen2d: jax.Array,  # [1, N] f32
    cscale2d: jax.Array,  # [1, N] f32
    qscale2d: jax.Array,  # [B, 1] f32
    k: int,
    block_n: int,
    interpret: bool,
    compensated: bool = False,
    unroll_merge: int = 0,
    n_rows: int | None = None,  # rows to scan (defaults to all)
    row_block_offset: int = 0,  # starting row block (units of block_n)
) -> tuple[jax.Array, jax.Array]:
    """``n_rows``/``row_block_offset`` window the scan over a row range
    of the FULL corpus buffer via the BlockSpec index maps — the
    segmented >4M-row sweep launches one of these per segment against
    the same buffers (no [seg, D] slice copies) inside one program.
    Emitted indices are window-relative; the caller rebases."""
    b, d = queries.shape
    n = n_rows if n_rows is not None else corpus.shape[0]
    off = row_block_offset
    grid = (n // block_n,)
    kernel = functools.partial(
        _fused_topk_kernel_qmajor, k=k, block_n=block_n,
        compensated=compensated, unroll_merge=unroll_merge,
    )
    bytes_per = jnp.dtype(corpus.dtype).itemsize
    out_vals, out_idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda j: (j + off, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j: (0, j + off), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j: (0, j + off), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d * bytes_per + b * d * bytes_per + b * k * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        queries if queries.dtype == corpus.dtype else queries.astype(corpus.dtype),
        corpus,
        pen2d,
        cscale2d,
        qscale2d,
    )
    return out_vals, out_idx


@functools.partial(
    jax.jit, static_argnames=("k", "block_b", "block_n", "interpret")
)
def _topk_pallas_jit(
    queries: jax.Array,
    corpus: jax.Array,
    pen2d: jax.Array,
    cscale2d: jax.Array,
    qscale2d: jax.Array,
    k: int,
    block_b: int,
    block_n: int,
    interpret: bool,
) -> tuple[jax.Array, jax.Array]:
    b, d = queries.shape
    n = corpus.shape[0]
    grid = (n // block_n,)
    kernel = functools.partial(_fused_topk_kernel, k=k, block_n=block_n)
    bytes_per = jnp.dtype(corpus.dtype).itemsize
    out_vals, out_idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, b), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, b), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, b), jnp.float32),
            jax.ShapeDtypeStruct((k, b), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, b), jnp.float32),
            pltpu.VMEM((k, b), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d * bytes_per + b * d * bytes_per + b * k * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        queries if queries.dtype == corpus.dtype else queries.astype(corpus.dtype),
        corpus,
        pen2d,
        cscale2d,
        qscale2d,
    )
    return out_vals.T, out_idx.T


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "block_n", "interpret", "compensated", "unroll_merge", "seg"
    ),
)
def _topk_segmented_qmajor(
    queries: jax.Array,
    corpus: jax.Array,
    pen_r: jax.Array,  # [1, N] f32
    cscale_r: jax.Array,  # [1, N] f32
    qscale_r: jax.Array,  # [B, 1] f32
    *,
    k: int,
    block_n: int,
    interpret: bool,
    compensated: bool,
    unroll_merge: int,
    seg: int,
) -> tuple[jax.Array, jax.Array]:
    """One program for the whole >seg-row sweep: per-segment kernel
    launches window the SAME full-size buffers via BlockSpec row
    offsets, and the cross-segment merges run in between — segment
    launches are independent, so the scheduler streams them back to
    back with zero host round-trips."""
    n = corpus.shape[0]
    acc = None
    for start in range(0, n, seg):
        rows = min(seg, n - start)
        sv, si = _topk_pallas_qmajor_jit(
            queries, corpus, pen_r, cscale_r, qscale_r,
            min(k, rows), block_n, interpret, compensated, unroll_merge,
            n_rows=rows, row_block_offset=start // block_n,
        )
        si = si + start
        acc = (
            (sv, si)
            if acc is None
            else merge_topk(acc[0], acc[1], sv, si, k)
        )
    return acc


def topk_pallas(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    penalty: jax.Array | None = None,
    *,
    corpus_scales: jax.Array | None = None,  # [N] per-row scales (int8 mode)
    query_scales: jax.Array | None = None,  # [B] per-query scales (int8 mode)
    block_b: int = 64,  # kept for API compat; B is padded to a multiple of 8
    block_n: int = 1024,
    interpret: bool | None = None,
    orientation: str = "auto",  # auto | qmajor | cmajor
    compensated: bool | None = None,  # bf16x2 corpus (split_f32_bf16x2)
    unroll_merge: int = 0,  # qmajor: unrolled extraction passes before the while_loop
) -> tuple[jax.Array, jax.Array]:
    """Fused score+top-K. Requires B % 8 == 0 and N % block_n == 0
    (use :func:`cosine_topk` for automatic padding). For int8 corpora pass
    pre-quantized int8 queries plus both scale vectors.

    ``orientation``: "qmajor" puts queries on the MXU/VPU sublane axis so
    the K-select runs lane-wise (fastest for float paths); "cmajor" is the
    corpus-rows-major transposed kernel (fastest for int8, whose 32-row
    MXU tiles align with the corpus dimension). "auto" picks by dtype."""
    if compensated is None:
        compensated = _is_compensated(queries, corpus)
        if compensated:
            queries = split_f32_bf16x2(queries)  # [B, 2D] bf16
    if compensated:
        orientation = "qmajor"  # the compensated dot is qmajor-only
    b, d = queries.shape
    n = corpus.shape[0]
    assert corpus.shape[1] == d, (queries.shape, corpus.shape)
    assert b % 8 == 0 and n % block_n == 0, (b, n, block_n)
    if penalty is None:
        penalty = jnp.zeros((n,), jnp.float32)
    if interpret is None:
        interpret = not _on_tpu()
    if orientation == "auto":
        orientation = "qmajor"  # faster for every dtype (see kernel note)

    # Large query batches: chunk so the [TB, TN] score tile and its
    # while-loop copies fit VMEM (B=256 f32 at block_n=1024 blows the
    # 16M scoped limit); 128-query chunks keep the fast configuration.
    if orientation == "qmajor" and b > 128:
        out_v, out_i = [], []
        for start in range(0, b, 128):
            stop = min(start + 128, b)
            sv, si = topk_pallas(
                queries[start:stop], corpus, k, penalty,
                corpus_scales=corpus_scales,
                query_scales=query_scales[start:stop]
                if query_scales is not None
                else None,
                block_b=block_b, block_n=block_n, interpret=interpret,
                orientation=orientation, compensated=compensated,
                unroll_merge=unroll_merge,
            )
            out_v.append(sv)
            out_i.append(si)
        return jnp.concatenate(out_v, axis=0), jnp.concatenate(out_i, axis=0)
    # int8 MXU tiles want >= 32 sublanes; qmajor puts queries there
    if orientation == "qmajor" and corpus.dtype == jnp.int8 and b % 32:
        pad = _round_up(b, 32) - b
        queries = jnp.pad(queries, ((0, pad), (0, 0)))
        if query_scales is not None:
            query_scales = jnp.pad(query_scales, ((0, pad),))
        vals, idx = topk_pallas(
            queries, corpus, k, penalty,
            corpus_scales=corpus_scales, query_scales=query_scales,
            block_b=block_b, block_n=block_n, interpret=interpret,
            orientation=orientation, unroll_merge=unroll_merge,
        )
        return vals[:b], idx[:b]

    # Very large corpora are processed in row segments (one kernel launch
    # each, merged on device): keeps per-launch grid sizes within what the
    # compiler handles comfortably. The qmajor path runs ALL segment
    # launches + merges as ONE jitted program over the full buffers
    # (BlockSpec row offsets, no [seg, D] slice copies, no per-segment
    # eager dispatch through the remote tunnel — the r3 10M rung lost
    # ~6x to exactly that).
    seg = MAX_ROWS_PER_CALL - (MAX_ROWS_PER_CALL % block_n)
    if n > seg:
        if orientation == "qmajor":
            pen_r = penalty.reshape(1, n).astype(jnp.float32)
            cscale_r = (
                corpus_scales.reshape(1, n).astype(jnp.float32)
                if corpus_scales is not None
                else jnp.ones((1, n), jnp.float32)
            )
            qscale_r = (
                query_scales.reshape(b, 1).astype(jnp.float32)
                if query_scales is not None
                else jnp.ones((b, 1), jnp.float32)
            )
            return _topk_segmented_qmajor(
                queries
                if queries.dtype == corpus.dtype
                else queries.astype(corpus.dtype),
                corpus, pen_r, cscale_r, qscale_r,
                k=k, block_n=block_n, interpret=interpret,
                compensated=compensated, unroll_merge=unroll_merge,
                seg=seg,
            )
        acc = None
        for start in range(0, n, seg):
            end = min(start + seg, n)
            sv, si = topk_pallas(
                queries,
                corpus[start:end],
                min(k, end - start),
                penalty[start:end],
                corpus_scales=corpus_scales[start:end]
                if corpus_scales is not None
                else None,
                query_scales=query_scales,
                block_b=block_b,
                block_n=block_n,
                interpret=interpret,
                orientation=orientation,
                compensated=compensated,
                unroll_merge=unroll_merge,
            )
            si = si + start
            acc = (sv, si) if acc is None else merge_topk(acc[0], acc[1], sv, si, k)
        return acc

    if orientation == "qmajor":
        pen_r = penalty.reshape(1, n).astype(jnp.float32)
        cscale_r = (
            corpus_scales.reshape(1, n).astype(jnp.float32)
            if corpus_scales is not None
            else jnp.ones((1, n), jnp.float32)
        )
        qscale_r = (
            query_scales.reshape(b, 1).astype(jnp.float32)
            if query_scales is not None
            else jnp.ones((b, 1), jnp.float32)
        )
        return _topk_pallas_qmajor_jit(
            queries, corpus, pen_r, cscale_r, qscale_r, k, block_n, interpret,
            compensated, unroll_merge,
        )

    pen2d = penalty.reshape(n, 1).astype(jnp.float32)
    cscale2d = (
        corpus_scales.reshape(n, 1).astype(jnp.float32)
        if corpus_scales is not None
        else jnp.ones((n, 1), jnp.float32)
    )
    qscale2d = (
        query_scales.reshape(1, b).astype(jnp.float32)
        if query_scales is not None
        else jnp.ones((1, b), jnp.float32)
    )
    return _topk_pallas_jit(
        queries, corpus, pen2d, cscale2d, qscale2d, k, block_b, block_n, interpret
    )


# ---------------------------------------------------------------------------
# Dispatcher
# ---------------------------------------------------------------------------


def auto_impl(
    b: int,
    n: int,
    dim: int,
    itemsize: int,
    compensated: bool,
    block_n: int = 1024,
) -> str:
    """The measured pallas-vs-XLA crossover policy, public so benchmarks
    can LABEL the implementation the auto mode actually runs.

    Compensated (f32x2): same-run interleaved measurements
    (tools/bench_topk_kernel, v5e) — the fused kernel wins at 500k x 1024
    B=32 and above (~780 GB/s ≈ 95% of v5e HBM roofline at 1M); the XLA
    three-pass fallback wins at 100k where per-launch overhead dominates.
    Crossover expressed in score bytes (B-aware).

    Plain: XLA's fused matmul+top_k wins while the [B, N] f32 score
    matrix is cheap to materialize; the fused kernel takes over when
    score traffic rivals corpus traffic (measured: 500k x 1024 fp32
    B=32 XLA 2x faster; B=128 kernel edges ahead — score ~ corpus/8).
    """
    score_bytes = b * n * 4
    if compensated:
        return (
            "pallas"
            if (_on_tpu() and n % block_n == 0 and score_bytes >= (48 << 20))
            else "xla"
        )
    corpus_bytes = n * dim * itemsize
    use_pallas = (
        _on_tpu()
        and n % block_n == 0
        and score_bytes >= (128 << 20)
        and score_bytes * 8 >= corpus_bytes
    )
    return "pallas" if use_pallas else "xla"


def cosine_topk(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    penalty: jax.Array | None = None,
    *,
    impl: str = "auto",
    block_b: int = 64,
    block_n: int = 1024,
) -> tuple[jax.Array, jax.Array]:
    """Top-k cosine matches of each query against the corpus.

    Handles shape padding: B is padded to ``block_b``, N must already be a
    multiple of ``block_n`` for the pallas path (index shards guarantee
    this); otherwise falls back to XLA. Returned indices refer to corpus
    rows; padded/invalid rows never appear provided ``penalty`` marks them.
    """
    b, _ = queries.shape
    n = corpus.shape[0]
    k = min(k, n)
    compensated = _is_compensated(queries, corpus)
    if impl == "auto":
        impl = auto_impl(
            b, n, corpus.shape[1],
            jnp.dtype(corpus.dtype).itemsize, compensated, block_n,
        )
    if impl == "xla" or n % block_n != 0:
        if compensated:
            return topk_xla_compensated(queries, corpus, k, penalty)
        return topk_xla(queries, corpus, k, penalty)

    pad_b = _round_up(max(b, 8), 8) - b
    if pad_b:
        queries = jnp.pad(queries, ((0, pad_b), (0, 0)))
    # unroll_merge=2 for the compensated kernel: two straight-line
    # extraction passes before the while_loop roughly halve the merge
    # cost at 1M in every same-run A/B (6.6 vs 12.4 ms, 5.25 vs ~14 ms
    # across windows — bench_topk_kernel) and are within noise at 100k,
    # where the XLA fallback serves anyway.
    vals, idx = topk_pallas(
        queries, corpus, k, penalty, block_b=block_b, block_n=block_n,
        unroll_merge=2 if compensated else 0,
    )
    if pad_b:
        vals, idx = vals[:b], idx[:b]
    return vals, idx
