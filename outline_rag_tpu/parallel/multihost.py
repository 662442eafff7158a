"""Multi-host (multi-controller) orchestration for index build + query.

The reference scales by running N identical uvicorn workers against one
Postgres (reference ``entrypoint.sh:16``); the TPU-native analogue at pod
scale is JAX's multi-controller SPMD model: one Python process per host,
``jax.distributed`` for the coordination service, and arrays whose shards
live on each host's local devices while programs (the sharded query, the
dp-sharded encoder) run globally.

Division of labor for an index build (SURVEY.md section 7 item 5):
- each host ingests and encodes a *contiguous slice* of the chunk list
  on its local devices (document-level parallelism — no cross-host
  traffic during encoding);
- :func:`global_row_sharded` assembles the per-host [N_local, D] blocks
  into one global [N, D] array row-sharded over the ``data`` axis
  without any host ever materializing the full matrix;
- queries then run through ``parallel/query.py::sharded_topk`` on the
  global mesh — per-shard fused top-K, one tiny all-gather.

Everything here is a thin, testable seam over ``jax.distributed``: the
two-process CPU test (tests/test_multihost.py) runs this module
end-to-end with a real coordination service; on a TPU pod the same code
path initializes from the TPU environment's auto-detected topology.
"""

from __future__ import annotations

import logging
import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from outline_rag_tpu.parallel.mesh import DATA_AXIS

log = logging.getLogger(__name__)


def init_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the multi-controller cluster. On TPU pods all three arguments
    are auto-detected from the environment (pass nothing); for CPU/GPU
    clusters pass them explicitly. No-op for single-process runs
    (num_processes in (None-on-single-host, 0, 1))."""
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "multihost: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def global_data_mesh() -> Mesh:
    """One ``data`` axis over every device of every process, ordered so
    each process's local devices are contiguous on the axis (host h owns
    rows [h*N/H, (h+1)*N/H) of a row-sharded array — matching the
    contiguous chunk slices each host encoded)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), (DATA_AXIS,))


def host_slice(n_total: int) -> tuple[int, int]:
    """This host's contiguous [start, stop) slice of an n_total-item work
    list, padded-balanced the same way :func:`global_row_sharded` expects
    (equal per-host blocks, last host short).

    When blocks are unequal (n_total % process_count != 0) the paired
    global_row_sharded call MUST receive ``n_global=n_total`` — its
    default derives the global size from each host's own block and the
    short last host would build a different global shape (SPMD hang)."""
    h, nh = jax.process_index(), jax.process_count()
    per = math.ceil(n_total / nh)
    return min(h * per, n_total), min((h + 1) * per, n_total)


def global_row_sharded(
    local_rows: np.ndarray,  # [N_local, ...] this host's block
    mesh: Mesh,
    n_global: int | None = None,
    fill=0,
    penalty: bool = False,
) -> jax.Array:
    """Assemble per-host row blocks into one global row-sharded array.

    Each host passes only its own block; the result is a [N_global, ...]
    array sharded over ``data`` whose shards never leave the host that
    produced them (``jax.make_array_from_process_local_data`` — no
    cross-host copy, no full-matrix materialization anywhere).

    Blocks are padded to identical per-host sizes (XLA shards must be
    equal). For penalty/validity rows pass ``penalty=True``: padding is
    filled with the NEG tombstone value so phantom pad rows can never
    enter a top-K (a zero-filled pad row would score 0.0 and win whenever
    every true similarity is negative).
    """
    if penalty:
        from outline_rag_tpu.ops.topk import NEG

        fill = NEG
    nh = jax.process_count()
    n_local = local_rows.shape[0]
    if n_global is None:
        # every host computes per = ceil(n_global/nh) from ITS OWN block:
        # with unequal blocks (host_slice gives the last host the short
        # remainder) hosts would build different global shapes and the
        # SPMD dispatch hangs. The default is only safe for equal blocks;
        # unequal splits must pass the true n_global.
        n_global = n_local * nh
    per = math.ceil(n_global / nh)
    if n_local < per:
        pad = np.full((per - n_local, *local_rows.shape[1:]), fill, local_rows.dtype)
        local_rows = np.concatenate([local_rows, pad], axis=0)
    sharding = NamedSharding(mesh, P(DATA_AXIS, *([None] * (local_rows.ndim - 1))))
    return jax.make_array_from_process_local_data(
        sharding, local_rows, (per * nh, *local_rows.shape[1:])
    )


def replicated_from_host0(value: np.ndarray, mesh: Mesh) -> jax.Array:
    """Replicate a (small) host-local array to every device. All hosts
    must pass value with the same shape/dtype; contents are taken
    per-host (callers broadcast semantically identical data, e.g. the
    query batch distributed via the serving tier)."""
    sharding = NamedSharding(mesh, P())
    return jax.make_array_from_process_local_data(sharding, value, value.shape)


def build_and_query_demo(
    chunks_per_host: int,
    dim: int,
    queries: np.ndarray,
    k: int,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """End-to-end multi-host flow used by the two-process test: every
    host deterministically 'encodes' its slice (seeded by host index),
    assembles the global sharded corpus, and runs the sharded query.
    Returns (vals, idx) — identical on every host (SPMD)."""
    from outline_rag_tpu.parallel.query import sharded_topk

    mesh = global_data_mesh()
    h = jax.process_index()
    rng = np.random.default_rng(seed + h)
    local = rng.standard_normal((chunks_per_host, dim)).astype(np.float32)
    local /= np.linalg.norm(local, axis=1, keepdims=True)

    corpus = global_row_sharded(local, mesh)
    penalty = global_row_sharded(
        np.zeros((chunks_per_host,), np.float32), mesh, penalty=True
    )
    q = replicated_from_host0(queries.astype(np.float32), mesh)
    vals, idx = sharded_topk(q, corpus, k, penalty, mesh=mesh)
    return np.asarray(vals), np.asarray(idx)
