"""Per-row int8 quantization for the index and quantized scoring.

Replaces nothing in the reference directly (pgvector stores fp32 vectors,
reference ``app/database.py:126``); this is the TPU-native memory-footprint
lever: an int8 corpus is 4x smaller than fp32 at near-identical recall@12
when the top candidates are rescored in higher precision (see
``outline_rag_tpu.engine.query``).

Scheme: symmetric per-row absmax. ``q = round(x * 127 / absmax(row))``,
``scale = absmax(row) / 127``. Scores rescale as
``score = (q_q . q_c) * scale_q * scale_c`` — exact for the dot product up
to rounding because scales are per-row on both sides.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def quantize_rows_int8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[N, D] float -> ([N, D] int8, [N] f32 scales). Zero rows get scale 0."""
    absmax = jnp.max(jnp.abs(x), axis=1)
    scale = absmax / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(x / safe[:, None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


@jax.jit
def dequantize_rows_int8(q: jax.Array, scale: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * scale[:, None]


@jax.jit
def quantize_rows_int8_residual(
    x: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """[N, D] float -> (q1 [N, D] int8, scale [N] f32, q2 [N, D] int8).

    Two-plane quantization for the ``int8r`` index mode: the scan reads
    only q1 (plain int8 bytes/speed), while the top-K rescore
    dequantizes ``q1*s + q2*(s/254)``. The residual ``x - q1*s`` is
    bounded by s/2 elementwise (absmax rounding never clips: the max
    element lands on exactly 127), so the residual scale is DERIVED —
    ``s2 = s/254`` puts q2 in [-127, 127] with no second scale array —
    and the residual-dequant error is <= s/508 per element (~8 extra
    bits). Top-12 agreement with the fp32 oracle is ~1.0 where plain
    int8 rescore plateaus at 0.984-0.991 (corpus rounding;
    measurements/r4/eval_ladder)."""
    q1, scale = quantize_rows_int8(x)
    safe = jnp.where(scale > 0, scale, 1.0)
    r = x - q1.astype(jnp.float32) * scale[:, None]
    q2 = jnp.clip(
        jnp.round(r / (safe / 254.0)[:, None]), -127, 127
    ).astype(jnp.int8)
    return q1, scale, q2


@functools.partial(jax.jit, static_argnames=("k",))
def int8_topk_xla(
    q_queries: jax.Array,  # [B, D] int8
    q_scale: jax.Array,  # [B] f32
    corpus: jax.Array,  # [N, D] int8
    c_scale: jax.Array,  # [N] f32
    k: int,
    penalty: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Quantized exact top-K, XLA path: int8 dot on the MXU (int32
    accumulate), then per-pair rescale in f32."""
    raw = jax.lax.dot_general(
        q_queries,
        corpus,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = raw.astype(jnp.float32) * q_scale[:, None] * c_scale[None, :]
    if penalty is not None:
        scores = scores + penalty[None, :]
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx.astype(jnp.int32)


def int8_topk(
    q_queries: jax.Array,
    q_scale: jax.Array,
    corpus: jax.Array,
    c_scale: jax.Array,
    k: int,
    penalty: jax.Array | None = None,
    impl: str = "auto",
    block_n: int = 1024,
    rescore_queries: jax.Array | None = None,
    rescore_m: int = 64,
    rescore_residual: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Quantized top-K: dispatches between the fused Pallas kernel (int8
    dot + rescale + penalty + K-select in one pass, no [B, N] score
    materialization) and the XLA path, with the same policy as
    ``cosine_topk``.

    ``rescore_queries`` ([B, D] f32) turns on the SURVEY-section-7
    candidate rescore that closes the int8 ranking gap to the fp32
    oracle (reference semantics: pgvector scores fp32 vectors exactly,
    ``app/database.py:137-138``): fetch ``max(k, rescore_m)``
    candidates with the quantized scan, gather those rows, dequantize,
    and re-rank them by the exact f32 ``query . dequant(row)`` dot
    (Precision.HIGHEST). This removes the query-side quantization error
    entirely; corpus rounding remains — measured agreement@12 vs the
    fp32 oracle is 0.984-0.991 across the 10k-1M rungs
    (measurements/r4/eval_ladder, up from 0.973-0.982 without the
    rescore). Passing ``rescore_residual`` ([N, D] int8, the q2 plane
    from :func:`quantize_rows_int8_residual`) removes the corpus
    rounding too — candidates dequantize to ~16-bit precision and the
    ranking matches the fp32 oracle (~1.0 agreement) while the SCAN
    still reads 1 byte/element. Candidates are re-ordered by ascending
    corpus index before the final ``top_k`` so exact ties keep the
    lowest-index-wins contract.
    """
    import jax as _jax

    from outline_rag_tpu.ops import topk as topk_mod

    b = q_queries.shape[0]
    n = corpus.shape[0]
    if rescore_queries is not None:
        kq = min(max(k, rescore_m), n)
        vals_c, idx_c = int8_topk(
            q_queries, q_scale, corpus, c_scale, kq, penalty,
            impl=impl, block_n=block_n,
        )
        # ascending-index candidate order -> lax.top_k's earliest-wins
        # tie-break matches the full-matrix oracle (lowest corpus index)
        idx_c = jnp.sort(idx_c, axis=1)
        taken_scale = jnp.take(c_scale, idx_c)  # [B, K]
        rows = jnp.take(corpus, idx_c, axis=0).astype(jnp.float32)
        rows = rows * taken_scale[..., None]
        if rescore_residual is not None:
            # host- or device-resident q2 plane: ops/hostmem routes the
            # host case through a compute_on("device_host") row gather
            # (the >HBM-index design — 10 GB plane, 64 KB read/query)
            from outline_rag_tpu.ops.hostmem import gather_rows

            res = gather_rows(rescore_residual, idx_c)
            rows = rows + res.astype(jnp.float32) * (
                taken_scale[..., None] / 254.0
            )
        scores = rescore_fp32(rescore_queries.astype(jnp.float32), rows)
        if penalty is not None:
            scores = scores + jnp.take(penalty, idx_c)
        vals, pos = jax.lax.top_k(scores, k)
        return vals, jnp.take_along_axis(idx_c, pos, axis=1).astype(jnp.int32)
    if impl == "auto":
        # measured (chained-execution timing, 1M x 1024, docs/BENCHMARKS.md):
        # the fused pallas path beats XLA for int8 — XLA can't fuse the
        # int32->f32 rescale + penalty + select the way the kernel does.
        impl = (
            "pallas"
            if (_jax.default_backend() == "tpu" and n % block_n == 0)
            else "xla"
        )
    if impl == "pallas" and n % block_n == 0:
        pad_b = (-b) % 8
        if pad_b:
            q_queries = jnp.pad(q_queries, ((0, pad_b), (0, 0)))
            q_scale = jnp.pad(q_scale, (0, pad_b))
        vals, idx = topk_mod.topk_pallas(
            q_queries,
            corpus,
            k,
            penalty,
            corpus_scales=c_scale,
            query_scales=q_scale,
            block_n=block_n,
        )
        if pad_b:
            vals, idx = vals[:b], idx[:b]
        return vals, idx
    return int8_topk_xla(q_queries, q_scale, corpus, c_scale, k, penalty)


def int8_topk_candidates(
    q_queries: jax.Array,  # [B, D] int8
    q_scale: jax.Array,  # [B] f32
    corpus: jax.Array,  # [N, D] int8 (the q1 plane)
    c_scale: jax.Array,  # [N] f32
    m: int,
    rescore_queries: jax.Array,  # [B, D] f32 (exact query values)
    penalty: jax.Array | None = None,
    impl: str = "auto",
    block_n: int = 1024,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Device half of the HOST-residual rescore tier: quantized q1 scan
    for the top-``m`` candidates plus the exact f32 q1-part rescore.
    Returns ``(scores_q1 [B, m] f32, idx [B, m] i32 ascending,
    scale_c [B, m] f32)`` for :func:`outline_rag_tpu.ops.hostres.
    host_residual_topk` to finish (add ``(q . q2_row) * scale/254`` from
    the host-RAM q2 plane, final top-k).

    Exists because the 10M-row exact rung cannot keep BOTH int8r planes
    in HBM (20 GB) and the measured runtime cannot row-DMA a pinned_host
    plane (tools/probe_hostres2.py, 2026-08-21: the compute_on gather's
    time scales with PLANE size — ratio 3.64 at fixed gathered bytes —
    and every alternative structure, whole-host-program gather /
    dynamic_slice scan / host-block einsum, ABORTs). The split keeps the
    scan + candidate gather at HBM bandwidth and moves only [B, m]
    scalars plus indices across the boundary — the pgvector-style host
    rescore tier (reference scores fp32 rows host-side,
    app/database.py:137-138)."""
    kq = min(m, corpus.shape[0])
    vals_c, idx_c = int8_topk(
        q_queries, q_scale, corpus, c_scale, kq, penalty,
        impl=impl, block_n=block_n,
    )
    # ascending-index candidates: downstream stable argsort then keeps
    # the lowest-corpus-index-wins tie contract (index/store convention)
    idx_c = jnp.sort(idx_c, axis=1)
    taken_scale = jnp.take(c_scale, idx_c)
    rows = jnp.take(corpus, idx_c, axis=0).astype(jnp.float32)
    rows = rows * taken_scale[..., None]
    scores = rescore_fp32(rescore_queries.astype(jnp.float32), rows)
    if penalty is not None:
        scores = scores + jnp.take(penalty, idx_c)
    return scores, idx_c.astype(jnp.int32), taken_scale


def rescore_fp32(
    queries: jax.Array,  # [B, D] f32
    corpus_rows: jax.Array,  # [B, K, D] f32 gathered candidates
) -> jax.Array:
    """Exact fp32 rescore of gathered candidate rows: [B, K] scores.

    HIGHEST precision is mandatory (repo f32 score-path rule):
    preferred_element_type alone does not stop the MXU truncating the
    INPUTS to bf16."""
    return jnp.einsum(
        "bd,bkd->bk", queries, corpus_rows,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


__all__ = [
    "quantize_rows_int8",
    "quantize_rows_int8_residual",
    "dequantize_rows_int8",
    "int8_topk",
    "int8_topk_candidates",
    "rescore_fp32",
]
