"""Mutable device-resident embedding shards.

The XLA-functional answer to "UPDATE the index in place": a shard is a
capacity-padded embedding matrix plus an additive validity penalty row
(0 = live, NEG = tombstoned/unused), both device arrays. Mutations
(append / tombstone) are jitted functional updates with donated buffers, so
on TPU they execute as in-place HBM writes with **no reallocation and no
recompilation** (fixed update-block shapes). Scoring always runs over the
full capacity with the penalty fused into the score tile, so shapes stay
static for XLA (SURVEY.md section 7 item 2, "hard parts": mutable index vs
XLA functional semantics).

This replaces the reference's delete-then-reinsert SQL mutation path
(reference ``app/rag.py:216-235``) and the pgvector storage row
(reference ``app/database.py:118-131``).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from outline_rag_tpu.ops.topk import NEG

# Rows are appended / tombstoned in fixed-size blocks so every mutation hits
# the same compiled program regardless of delta size.
UPDATE_BLOCK = 1024
TOMBSTONE_BLOCK = 1024

# Ingest staging backpressure. Through the remote-TPU tunnel dispatch is
# lazy but device_put is EAGER: a long ingest loop stages every pending
# host block on the chip while the consuming update programs lag behind
# (the first call also pays a 20-70 s cold compile), so staged blocks
# accumulate unboundedly — a 1M-row hybrid build staged ~9 GB of blocks
# on top of the 9.7 GB index and OOM'd a 16 GB chip mid-append. After
# ~this many staged bytes, fetch one element of the newest state to
# drain the queue (block_until_ready is a no-op through the lazy
# tunnel; only a host fetch forces execution).
def _stage_limit() -> int:
    import os

    return int(float(os.environ.get("ORT_INGEST_STAGE_MB", "256")) * 1e6)


def drain_staged(leaf: jax.Array) -> None:
    """Force execution of every dispatched program ``leaf`` depends on."""
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardState:
    """Device arrays of one logical shard (a pytree).

    ``vectors``  [capacity, dim]  — f32/bf16 embeddings, or int8 codes.
    ``scales``   [capacity]       — f32 per-row scales (int8 mode; ones
                                    otherwise so the pytree structure is
                                    stable across modes).
    ``penalty``  [capacity]       — f32 additive mask: 0 live, NEG dead.
    ``residual`` [capacity, rdim] — int8 second quantization plane
                                    (``int8r`` mode: rdim == dim, the q2
                                    codes of quantize_rows_int8_residual,
                                    read only by the top-K rescore —
                                    never by the scan); rdim == 0
                                    otherwise so the pytree structure is
                                    stable across modes.
    """

    vectors: jax.Array
    scales: jax.Array
    penalty: jax.Array
    residual: jax.Array

    @property
    def capacity(self) -> int:
        return self.vectors.shape[0]

    @property
    def dim(self) -> int:
        return self.vectors.shape[1]


def init_state(capacity: int, dim: int, dtype: str = "float32") -> ShardState:
    # "f32x2": compensated bf16 pairs (ops/topk.py::split_f32_bf16x2) —
    # fp32-class scoring accuracy at bf16 MXU speed, same 4 B/dim storage.
    # Rows are stored pre-split as [capacity, 2*dim] bf16.
    jdtype = {
        "float32": jnp.float32,
        "bfloat16": jnp.bfloat16,
        "f32x2": jnp.bfloat16,
        "int8": jnp.int8,
        "int8r": jnp.int8,  # int8 scan plane + int8 rescore residual
    }[dtype]
    width = 2 * dim if dtype == "f32x2" else dim
    return ShardState(
        vectors=jnp.zeros((capacity, width), jdtype),
        scales=jnp.ones((capacity,), jnp.float32),
        penalty=jnp.full((capacity,), NEG, jnp.float32),
        residual=jnp.zeros(
            (capacity, dim if dtype == "int8r" else 0), jnp.int8
        ),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def _append_block(
    state: ShardState,
    rows: jax.Array,  # [UPDATE_BLOCK, dim] in state dtype
    scales: jax.Array,  # [UPDATE_BLOCK]
    idx: jax.Array,  # [UPDATE_BLOCK] int32 target rows; padding entries
    #                  carry an out-of-range index and are dropped
    res_rows: jax.Array,  # [UPDATE_BLOCK, rdim] int8 (rdim 0 unless int8r)
) -> ShardState:
    # Scatter, NOT dynamic_update_slice: a fixed-size block written at
    # start would CLAMP when it crosses the capacity edge (an unaligned
    # tail append), silently relocating the new rows and tombstoning
    # live ones with its padding. Drop-mode scatter writes exactly the
    # real rows wherever they land and discards the padding.
    return ShardState(
        vectors=state.vectors.at[idx].set(rows, mode="drop"),
        scales=state.scales.at[idx].set(scales, mode="drop"),
        penalty=state.penalty.at[idx].set(0.0, mode="drop"),
        residual=state.residual.at[idx].set(res_rows, mode="drop"),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def _tombstone_block(state: ShardState, rows: jax.Array) -> ShardState:
    """``rows``: [TOMBSTONE_BLOCK] int32 row ids; out-of-range ids (used as
    padding) are dropped by the scatter."""
    penalty = state.penalty.at[rows].set(NEG, mode="drop")
    return dataclasses.replace(state, penalty=penalty)


class DeviceShard:
    """Host-side manager for one logical (possibly mesh-sharded) shard.

    Tracks the write cursor, live count, row -> chunk-id mapping (host
    NumPy; device-returned row indices are translated here) and the
    generation counter used by the serving layer for consistent snapshots
    (single-writer update task + atomic state swap, SURVEY.md section 5
    race-safety notes).
    """

    def __init__(
        self,
        capacity: int,
        dim: int,
        dtype: str = "float32",
        sharding: jax.sharding.Sharding | None = None,
    ):
        if capacity % UPDATE_BLOCK:
            raise ValueError(f"capacity must be a multiple of {UPDATE_BLOCK}")
        self.dtype = dtype
        self.sharding = sharding
        self._staged = 0
        self.state = init_state(capacity, dim, dtype)
        if sharding is not None:
            self.state = jax.device_put(self.state, self._state_shardings())
        self.row_ids: np.ndarray = np.full(capacity, "", dtype=object)
        self.cursor = 0  # next free row
        self.live = 0
        self.generation = 0

    def _state_shardings(self):
        assert self.sharding is not None
        row_sharding = self.sharding
        from jax.sharding import NamedSharding, PartitionSpec as P

        if isinstance(row_sharding, NamedSharding):
            vec = NamedSharding(row_sharding.mesh, P(*row_sharding.spec, None))
            one_d = NamedSharding(row_sharding.mesh, P(*row_sharding.spec))
            return ShardState(
                vectors=vec, scales=one_d, penalty=one_d, residual=vec
            )
        return ShardState(
            vectors=row_sharding, scales=row_sharding, penalty=row_sharding,
            residual=row_sharding,
        )

    # -- mutation ----------------------------------------------------------

    def _pin_residual(self) -> None:
        """XLA assigns zero-element *outputs* a replicated sharding, so a
        zero-width residual plane ([cap, 0] in every non-int8r dtype)
        comes back from ``_append_block``/``_tombstone_block`` with
        ``PartitionSpec()`` even when the shard is mesh-sharded. That
        flips the jit cache key of the next mutation at the same
        capacity — e.g. the post-growth append of the new rows compiles
        *inside the write lock* despite the capacity warm
        (test_growth_prewarm_on_sharded_index). Re-pinning after every
        mutation keeps exactly one input-sharding variant per capacity,
        which ``warm``'s single append+tombstone covers. Free: zero
        elements, and a no-op when the sharding already matches."""
        if self.sharding is None:
            return
        want = self._state_shardings().residual
        if self.state.residual.sharding != want:
            self.state = dataclasses.replace(
                self.state,
                residual=jax.device_put(self.state.residual, want),
            )

    @property
    def capacity(self) -> int:
        return self.state.capacity

    @property
    def free(self) -> int:
        return self.capacity - self.cursor

    def append(
        self,
        chunk_ids: list[str],
        vectors: np.ndarray,  # [n, dim] float32 (pre-normalized)
        scales: np.ndarray | None = None,  # [n] for int8/int8r modes
        residual: np.ndarray | None = None,  # [n, dim] int8 (int8r mode)
    ) -> np.ndarray:
        """Append rows; returns the assigned row indices. Vectors for int8
        shards must already be quantized codes with ``scales`` given
        (plus the ``residual`` q2 plane for int8r)."""
        n = vectors.shape[0]
        if n == 0:
            return np.empty(0, np.int64)
        if n > self.free:
            raise IndexError(f"shard full: {n} rows requested, {self.free} free")
        rows_assigned = np.arange(self.cursor, self.cursor + n)
        jdtype = self.state.vectors.dtype
        rdim = self.state.residual.shape[1]
        if rdim and residual is None:
            raise ValueError("int8r shard append requires the residual plane")
        if scales is None:
            scales = np.ones(n, np.float32)
        for off in range(0, n, UPDATE_BLOCK):
            blk = vectors[off : off + UPDATE_BLOCK]
            sc = scales[off : off + UPDATE_BLOCK]
            m = blk.shape[0]
            blk_p = np.zeros((UPDATE_BLOCK, self.state.dim), np.float32)
            blk_p[:m] = blk
            sc_p = np.ones(UPDATE_BLOCK, np.float32)
            sc_p[:m] = sc
            res_p = np.zeros((UPDATE_BLOCK, rdim), np.int8)
            if rdim:
                res_p[:m] = residual[off : off + UPDATE_BLOCK]
            # padding rows carry an out-of-range index -> dropped by the
            # scatter (never clamped back onto live rows)
            idx = np.full(UPDATE_BLOCK, self.capacity + 1, np.int32)
            idx[:m] = np.arange(
                self.cursor + off, self.cursor + off + m, dtype=np.int32
            )
            self.state = _append_block(
                self.state,
                jnp.asarray(blk_p, jdtype),
                jnp.asarray(sc_p),
                jnp.asarray(idx),
                jnp.asarray(res_p),
            )
            self._pin_residual()
            self._staged += blk_p.nbytes
            if self._staged >= _stage_limit():
                drain_staged(self.state.scales)
                self._staged = 0
        self.row_ids[self.cursor : self.cursor + n] = chunk_ids
        self.cursor += n
        self.live += n
        self.generation += 1
        return rows_assigned

    def tombstone(self, rows: np.ndarray) -> None:
        rows = np.asarray(rows, np.int32)
        if rows.size == 0:
            return
        for off in range(0, rows.size, TOMBSTONE_BLOCK):
            blk = rows[off : off + TOMBSTONE_BLOCK]
            pad = np.full(
                TOMBSTONE_BLOCK - blk.size, self.capacity + 1, np.int32
            )  # out of range -> dropped
            self.state = _tombstone_block(
                self.state, jnp.asarray(np.concatenate([blk, pad]))
            )
            self._pin_residual()
        for r in rows:
            self.row_ids[int(r)] = ""
        self.live -= rows.size
        self.generation += 1

    @staticmethod
    def warm(
        capacity: int,
        dim: int,
        dtype: str = "float32",
        sharding: jax.sharding.Sharding | None = None,
    ) -> "DeviceShard":
        """Compile the mutation programs for ``capacity`` without touching
        any live shard: builds a throwaway shard at that capacity and runs
        one append block and one tombstone block. The jit caches are keyed
        by shape, so a later growth to this capacity swaps buffers without
        compiling — growth otherwise compiles 20-70 s through the
        remote-TPU tunnel *inside the write lock*, stalling every
        concurrent query (VERDICT r2 weak #7). Peak HBM during the warm
        (live cap + throwaway 2cap) equals the growth copy's own peak, so
        the warm never OOMs a config the growth itself fits. Returns the
        throwaway shard so query-warm hooks can compile against exactly
        the avals growth will create.
        """
        shard = DeviceShard(capacity, dim, dtype, sharding)
        rdim = shard.state.residual.shape[1]
        shard.append(
            ["__warm__"], np.zeros((1, shard.state.dim), np.float32),
            residual=np.zeros((1, rdim), np.int8) if rdim else None,
        )
        shard.tombstone(np.asarray([0], np.int32))
        return shard

    def snapshot(self) -> tuple[ShardState, np.ndarray, int]:
        """Consistent view for the query path: (device state, row-id map,
        generation). The state object is immutable once handed out; the
        updater replaces ``self.state`` rather than mutating arrays the
        reader holds."""
        return self.state, self.row_ids, self.generation
