"""Row-parallel scoring: per-shard fused top-K + all-gather merge.

The direct analogue of the BASELINE.json 10M-chunk v4-8 configuration: the
corpus matrix [N, D] is sharded row-wise over the ``data`` mesh axis; each
device runs the fused score+top-K kernel over its [N/ndev, D] shard, then
one ``all_gather`` of the tiny [B, K] per-shard lists merges them into the
global top-K. Scores never leave the device; the only collective payload is
``ndev * B * K * 8`` bytes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from outline_rag_tpu.ops.topk import cosine_topk
from outline_rag_tpu.parallel.mesh import DATA_AXIS


def _local_then_merge(q, c, pen, *, k: int, impl: str, block_n: int):
    """Per-device body: local fused top-K over this row shard, index
    rebased to global rows, then the cross-shard merge (computed
    replicated on every device — the payload is tiny)."""
    vals, idx = cosine_topk(q, c, k, pen, impl=impl, block_n=block_n)
    shard = jax.lax.axis_index(DATA_AXIS)
    gidx = idx + (shard * c.shape[0]).astype(jnp.int32)
    out_vals, out_idx, _ = _merge_gathered(vals, gidx, k, DATA_AXIS)
    return out_vals, out_idx


def sharded_topk(
    queries: jax.Array,  # [B, D], replicated
    corpus: jax.Array,  # [N, D], row-sharded over "data"
    k: int,
    penalty: jax.Array | None = None,  # [N], row-sharded
    *,
    mesh: Mesh,
    impl: str = "auto",
    block_n: int = 1024,
) -> tuple[jax.Array, jax.Array]:
    if penalty is None:
        penalty = jnp.zeros((corpus.shape[0],), jnp.float32)
    body = functools.partial(
        _local_then_merge, k=k, impl=impl, block_n=block_n
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(queries, corpus, penalty)


def _merge_gathered(vals, gidx, k, axis, extras=()):
    """Cross-shard merge of per-shard top-K lists (computed replicated on
    every device — the payload is tiny). ``extras`` are per-candidate
    arrays of shape [B, K, ...] merged with the same permutation.

    Tie-break parity with a global ``lax.top_k``: the gathered layout is
    shard-major ([shard0 k0..k-1, shard1 k0..]) and shard r owns global
    rows [r*cap, (r+1)*cap), so for equal values the earliest position is
    the lowest global index."""
    b = vals.shape[0]
    av = jnp.moveaxis(jax.lax.all_gather(vals, axis), 0, 1).reshape(b, -1)
    ai = jnp.moveaxis(jax.lax.all_gather(gidx, axis), 0, 1).reshape(b, -1)
    out_vals, pos = jax.lax.top_k(av, k)
    out_idx = jnp.take_along_axis(ai, pos, axis=1)
    merged_extras = []
    for e in extras:
        ae = jnp.moveaxis(jax.lax.all_gather(e, axis), 0, 1)
        ae = ae.reshape(b, ae.shape[1] * ae.shape[2], *e.shape[2:])
        p = pos.reshape(b, k, *([1] * (ae.ndim - 2)))
        merged_extras.append(jnp.take_along_axis(ae, p, axis=1))
    return out_vals, out_idx, merged_extras


def _local_topk_int8(q_codes, q_scale, q_f32, c, c_scale, res, pen, *, k: int, impl: str, block_n: int, rescore_m: int):
    from outline_rag_tpu.ops.quant import int8_topk

    vals, idx = int8_topk(
        q_codes, q_scale, c, c_scale, k, pen, impl=impl, block_n=block_n,
        rescore_queries=q_f32 if rescore_m else None, rescore_m=rescore_m,
        rescore_residual=res if res.shape[1] else None,
    )
    shard = jax.lax.axis_index(DATA_AXIS)
    gidx = idx + (shard * c.shape[0]).astype(jnp.int32)
    out_vals, out_idx, _ = _merge_gathered(vals, gidx, k, DATA_AXIS)
    return out_vals, out_idx


def sharded_topk_int8(
    q_codes: jax.Array,  # [B, D] int8, replicated
    q_scale: jax.Array,  # [B] f32, replicated
    corpus: jax.Array,  # [N, D] int8, row-sharded over "data"
    c_scale: jax.Array,  # [N] f32, row-sharded
    k: int,
    penalty: jax.Array | None = None,  # [N], row-sharded
    *,
    mesh: Mesh,
    impl: str = "auto",
    block_n: int = 1024,
    rescore_queries: jax.Array | None = None,  # [B, D] f32, replicated
    rescore_m: int = 64,
    rescore_residual: jax.Array | None = None,  # [N, D] int8, row-sharded
) -> tuple[jax.Array, jax.Array]:
    """Quantized row-parallel top-K: per-shard fused int8 kernel, then the
    same tiny all-gather merge as :func:`sharded_topk`. With
    ``rescore_queries`` each shard fp32-rescores its own candidates
    *before* the merge (local gather — candidate rows never cross the
    interconnect), so the merged ranking equals the single-device
    rescored ranking. ``rescore_residual`` (the int8r q2 plane) rides
    the same local gather and lifts the rescore to ~16-bit dequant."""
    if penalty is None:
        penalty = jnp.zeros((corpus.shape[0],), jnp.float32)
    q_f32 = (
        rescore_queries.astype(jnp.float32)
        if rescore_queries is not None
        else jnp.zeros((q_codes.shape[0], corpus.shape[1]), jnp.float32)
    )
    res = (
        rescore_residual
        if rescore_residual is not None
        else jnp.zeros((corpus.shape[0], 0), jnp.int8)
    )
    body = functools.partial(
        _local_topk_int8, k=k, impl=impl, block_n=block_n,
        rescore_m=rescore_m if rescore_queries is not None else 0,
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(DATA_AXIS, None), P(DATA_AXIS),
                  P(DATA_AXIS, None), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(q_codes, q_scale, q_f32, corpus, c_scale, res, penalty)


def _local_retrieve_tokens(
    q, q_codes, q_scale, c, c_scale, res, pen, tok_ids, tok_mask, tok_w,
    tok_cvecs=None, tok_cscale=None,
    *, k: int, impl: str, block_n: int, quantized: bool,
):
    """Per-device body of the mesh fused-query retrieval stage: local fused
    top-K over this row shard, then gather the K winning candidates' cached
    tokens *locally* (plain ``jnp.take`` on the local shard — no cross-device
    gather of the [N, Tc] cache), and merge scores + candidate tokens across
    shards with one all-gather each. Collective payload per device:
    ``ndev * B * K * (2*Tc + 3) * 4`` bytes — KBs, never corpus-scale.
    The optional ColBERT vector cache rides the same merge (adds
    ``ndev * B * K * Tc * (r + 4)`` bytes — still candidate-scale)."""
    if quantized:
        from outline_rag_tpu.ops.quant import int8_topk

        vals, idx = int8_topk(
            q_codes, q_scale, c, c_scale, k, pen, impl=impl, block_n=block_n,
            rescore_queries=q,
            rescore_residual=res if res.shape[1] else None,
        )
    else:
        vals, idx = cosine_topk(q, c, k, pen, impl=impl, block_n=block_n)
    shard = jax.lax.axis_index(DATA_AXIS)
    gidx = idx + (shard * c.shape[0]).astype(jnp.int32)
    cand_ids = jnp.take(tok_ids, idx, axis=0)  # [B, K, Tc]
    cand_mask = jnp.take(tok_mask, idx, axis=0)
    cand_w = jnp.take(tok_w, idx, axis=0)
    extras = [cand_ids, cand_mask, cand_w]
    if tok_cvecs is not None:
        extras.append(jnp.take(tok_cvecs, idx, axis=0))  # [B, K, Tc, r]
        extras.append(jnp.take(tok_cscale, idx, axis=0))
    out_vals, out_idx, merged = _merge_gathered(
        vals, gidx, k, DATA_AXIS, extras=tuple(extras)
    )
    return (out_vals, out_idx, *merged)


def sharded_retrieve_tokens(
    q_emb: jax.Array,  # [B, D] f32 unit vectors, replicated
    corpus: jax.Array,  # [N, D], row-sharded over "data"
    scales: jax.Array,  # [N] f32 (int8 mode), row-sharded
    penalty: jax.Array,  # [N], row-sharded
    tok_ids: jax.Array,  # [N, Tc] int32, row-sharded
    tok_mask: jax.Array,  # [N, Tc] int32, row-sharded
    tok_weights: jax.Array,  # [N, Tc] f32, row-sharded
    k: int,
    tok_cvecs: jax.Array | None = None,  # [N, Tc, r] int8, row-sharded
    tok_cscale: jax.Array | None = None,  # [N, Tc] f32, row-sharded
    residual: jax.Array | None = None,  # [N, D] int8 (int8r), row-sharded
    *,
    mesh: Mesh,
    impl: str = "auto",
    block_n: int = 1024,
):
    """Retrieval stage of the mesh fused-query program: returns replicated
    (vals [B,K], global idx [B,K], cand_ids/mask [B,K,Tc], cand_weights,
    cand_cvecs, cand_cscale — the last two None without a ColBERT cache)
    with exact tie-break parity vs the single-device program. Traceable
    under jit — this is one stage of one XLA program, not a dispatch."""
    quantized = corpus.dtype == jnp.int8
    if quantized:
        from outline_rag_tpu.ops.quant import quantize_rows_int8

        q_codes, q_scale = quantize_rows_int8(q_emb)
    else:
        q_codes = jnp.zeros((q_emb.shape[0], 0), jnp.int8)
        q_scale = jnp.zeros((q_emb.shape[0],), jnp.float32)
    with_cb = tok_cvecs is not None
    body = functools.partial(
        _local_retrieve_tokens,
        k=k,
        impl=impl,
        block_n=block_n,
        quantized=quantized,
    )
    res = (
        residual
        if residual is not None
        else jnp.zeros((corpus.shape[0], 0), jnp.int8)
    )
    specs = [
        P(), P(), P(),
        P(DATA_AXIS, None), P(DATA_AXIS), P(DATA_AXIS, None), P(DATA_AXIS),
        P(DATA_AXIS, None), P(DATA_AXIS, None), P(DATA_AXIS, None),
    ]
    args = [q_emb, q_codes, q_scale, corpus, scales, res, penalty,
            tok_ids, tok_mask, tok_weights]
    n_out = 5
    if with_cb:
        specs += [P(DATA_AXIS, None, None), P(DATA_AXIS, None)]
        args += [tok_cvecs, tok_cscale]
        n_out = 7
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(specs),
        out_specs=tuple(P() for _ in range(n_out)),
        check_vma=False,
    )
    out = fn(*args)
    return out if with_cb else (*out, None, None)


# ---------------------------------------------------------------------------
# Multi-slice (two-level) variant
# ---------------------------------------------------------------------------

DCN_AXIS = "dcn"
ICI_AXIS = "ici"


def _local_then_merge_2d(q, c, pen, *, k: int, impl: str, block_n: int):
    """Hierarchical merge: local top-K, then intra-slice merge over the ICI
    axis (fast interconnect), then one tiny [n_slices, B, K] gather over
    the DCN axis — cross-slice traffic is K entries per slice, not per
    device (SURVEY.md section 2c: ICI vs DCN placement of the merge)."""
    vals, idx = cosine_topk(q, c, k, pen, impl=impl, block_n=block_n)
    dcn_i = jax.lax.axis_index(DCN_AXIS)
    ici_i = jax.lax.axis_index(ICI_AXIS)
    ici_n = jax.lax.axis_size(ICI_AXIS)
    shard = dcn_i * ici_n + ici_i
    gidx = idx + (shard * c.shape[0]).astype(jnp.int32)
    b = q.shape[0]

    def gather_merge(vals, idx, axis):
        av = jnp.moveaxis(jax.lax.all_gather(vals, axis), 0, 1).reshape(b, -1)
        ai = jnp.moveaxis(jax.lax.all_gather(idx, axis), 0, 1).reshape(b, -1)
        v, pos = jax.lax.top_k(av, k)
        return v, jnp.take_along_axis(ai, pos, axis=1)

    vals, gidx = gather_merge(vals, gidx, ICI_AXIS)  # within slice
    return gather_merge(vals, gidx, DCN_AXIS)  # across slices


def sharded_topk_2d(
    queries: jax.Array,
    corpus: jax.Array,  # [N, D] sharded over ("dcn", "ici") rows
    k: int,
    penalty: jax.Array | None = None,
    *,
    mesh: Mesh,  # axes ("dcn", "ici")
    impl: str = "auto",
    block_n: int = 1024,
) -> tuple[jax.Array, jax.Array]:
    if penalty is None:
        penalty = jnp.zeros((corpus.shape[0],), jnp.float32)
    body = functools.partial(
        _local_then_merge_2d, k=k, impl=impl, block_n=block_n
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P((DCN_AXIS, ICI_AXIS), None), P((DCN_AXIS, ICI_AXIS))),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(queries, corpus, penalty)
