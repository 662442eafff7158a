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
    all_vals = jax.lax.all_gather(vals, DATA_AXIS)  # [ndev, B, k]
    all_idx = jax.lax.all_gather(gidx, DATA_AXIS)
    b = q.shape[0]
    av = jnp.moveaxis(all_vals, 0, 1).reshape(b, -1)
    ai = jnp.moveaxis(all_idx, 0, 1).reshape(b, -1)
    out_vals, pos = jax.lax.top_k(av, k)
    out_idx = jnp.take_along_axis(ai, pos, axis=1)
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
