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
