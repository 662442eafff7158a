"""Host-memory-resident index planes (XLA host offload).

The 10M-row exact-ranking rung needs the int8r q2 residual plane
(N x D int8 — 10 GB at 10M) that only the top-64-per-query rescore
reads: ~64 KB per query. Keeping it in device HBM next to the scanned
q1 plane doubles index bytes past what one 16 GB chip grants; keeping
it in the ATTACHED HOST's RAM costs one PCIe row-gather per query
batch. This module is the supported XLA pattern for that:

- arrays placed with ``memory_kind="pinned_host"`` stay in host RAM;
- inside a jitted program, a raw ``lax.gather`` wrapped in
  ``compute_on("device_host")`` reads rows of the host plane, with
  explicit memory-space transfers at the block boundary (``jnp.take``
  materializes device-space constants inside the host block, which
  XLA's memory-space checker rejects);
- mutation is a donated host-space scatter whose jit carries
  ``out_shardings=<pinned_host>`` (requires the
  ``annotate_device_placement`` custom call — present on TPU backends,
  absent on CPU, hence the capability probe).

Role in the reference's terms: pgvector keeps every plane in one
Postgres heap (``app/database.py:118-139``); this split keeps the
scanned plane at HBM bandwidth and pays host bandwidth only for the
rescore's 64 rows.

MEASURED CAVEAT (tools/probe_hostres.py + probe_hostres2.py, on-chip
2026-08-21): on the current runtime the ``compute_on`` gather is the
only in-program host-memory read that executes at all, and its cost
scales with PLANE size at fixed gathered bytes (ratio 3.64 for 8x
rows — a hidden copy, ~20 q/s extrapolated at 10M); every alternative
structure (whole-host-program gather, dynamic_slice scan, host-block
einsum) ABORTS, and the first abort wedges the process. Placement
(``to_pinned_host``) and the donated host-space scatter append DO
work. The production >HBM rescore therefore lives in
``ops/hostres.py`` (host rescore tier: candidates ship to the host,
the numpy q2 plane never enters a program); ``gather_rows``'s host
route is kept for API completeness and for runtimes whose XLA lowers
host gathers properly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jax._src.core import MemorySpace
from jax.experimental.compute_on import compute_on


def pinned_host_sharding(device=None) -> jax.sharding.Sharding:
    device = device or jax.devices()[0]
    return jax.sharding.SingleDeviceSharding(
        device, memory_kind="pinned_host"
    )


def to_pinned_host(x, device=None) -> jax.Array:
    """Place ``x`` (numpy or jax array) in the attached host's memory."""
    return jax.device_put(x, pinned_host_sharding(device))


def is_host_resident(x) -> bool:
    """True for host-space arrays AND their in-jit tracers."""
    aval = getattr(x, "aval", None)
    space = getattr(aval, "memory_space", None)
    if space is not None and space == MemorySpace.Host:
        return True
    sharding = getattr(x, "sharding", None)
    return getattr(sharding, "memory_kind", None) == "pinned_host"


def gather_rows(plane: jax.Array, idx: jax.Array) -> jax.Array:
    """``plane [N, D]`` (host- or device-resident), ``idx [B, M]``
    in-range int32 -> ``[B, M, D]`` rows, device-resident.

    Traceable inside a caller's jit. Device-resident planes take the
    ordinary XLA gather; host-resident planes run the gather as a host
    computation reading the plane over PCIe (bytes moved = gathered
    rows, not plane size). Callers must guarantee in-range indices
    (PROMISE_IN_BOUNDS: index clamping would put device-space
    constants inside the host block)."""
    if not is_host_resident(plane):
        return jnp.take(plane, idx, axis=0)
    bq, mq = idx.shape
    idx_h = jax.device_put(idx.reshape(bq * mq, 1), MemorySpace.Host)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,),
        collapsed_slice_dims=(0,),
        start_index_map=(0,),
    )
    with compute_on("device_host"):
        rows = jax.lax.gather(
            plane, idx_h, dnums,
            slice_sizes=(1, plane.shape[1]),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
    rows = jax.device_put(rows, MemorySpace.Device)
    return rows.reshape(bq, mq, plane.shape[1])


def make_host_append(device=None):
    """Jitted donated append into a host-resident plane:
    ``append(plane, rows [K, D], idx [K] int32) -> plane``. Out-of-range
    idx entries are dropped (the shard padding convention,
    ``index/shard.py::_append_block``). TPU-only: the CPU backend lacks
    the placement custom call (probe stage ``host_append``)."""
    import functools

    s_host = pinned_host_sharding(device)

    @functools.partial(jax.jit, donate_argnums=(0,), out_shardings=s_host)
    def append_host(plane, rows_d, idx_d):
        rows_h = jax.device_put(rows_d, MemorySpace.Host)
        idx_h = jax.device_put(idx_d[:, None], MemorySpace.Host)
        dnums = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1,),
            inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0,),
        )
        with compute_on("device_host"):
            out = jax.lax.scatter(
                plane, idx_h, rows_h, dnums,
                mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
            )
        return out

    return append_host


__all__ = [
    "pinned_host_sharding",
    "to_pinned_host",
    "is_host_resident",
    "gather_rows",
    "make_host_append",
]
