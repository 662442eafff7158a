"""Mesh construction and sharding helpers.

One logical axis for the retrieval engine: ``"data"`` — corpus rows are
sharded across it, queries are replicated. For multi-slice deployments the
axis should be laid out so the top-K merge all-gather rides ICI within a
slice (devices of one slice adjacent on the axis) and only the final small
[ndev, B, K] gather crosses DCN; with K=12 and B<=128 the cross-slice
payload is a few KB per query batch, so DCN latency dominates, not
bandwidth (SURVEY.md section 2c).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            # silently truncating would shard the corpus over fewer
            # devices than the operator's capacity planning assumed
            # (same guard as parallel/tp.py::model_mesh)
            raise ValueError(
                f"requested a {n_devices}-device data mesh but only "
                f"{len(devs)} device(s) are visible"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Rows split across the data axis (for [N, D] and [N] arrays)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
