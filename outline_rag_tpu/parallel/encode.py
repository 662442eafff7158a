"""Data-parallel batched encoding for index builds.

BASELINE.md ladder rung 3/4: building a 1M-10M-chunk index means running
the encoder over every chunk. On a mesh this is trivially data-parallel —
params replicated, token batch row-sharded over ``data`` — and XLA inserts
no collectives at all (each device embeds its rows; results gather on
host or stay sharded for a sharded index append).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from outline_rag_tpu.models.encoder import EncoderConfig, pooled_embeddings
from outline_rag_tpu.parallel.mesh import DATA_AXIS


def make_sharded_encoder(cfg: EncoderConfig, mesh: Mesh):
    """Returns (params, ids, mask) -> [B, H] with batch rows sharded over
    the data axis; B must be divisible by the axis size."""
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(DATA_AXIS))

    fn = jax.jit(
        lambda p, ids, mask: pooled_embeddings(p, ids, mask, cfg),
        in_shardings=(repl, shard, shard),
        out_shardings=shard,
    )

    def encode(params, ids, mask):
        ids = jax.device_put(jnp.asarray(ids), shard)
        mask = jax.device_put(jnp.asarray(mask), shard)
        return fn(params, ids, mask)

    return encode
