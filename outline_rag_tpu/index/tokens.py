"""Device-resident chunk-token cache.

Stores the tokenized text of every indexed chunk as fixed-width int32 rows
parallel to the embedding matrix, so the fused query program can gather
candidate chunk tokens **on device** (by top-K row index) and feed the
cross-encoder without a host round-trip — the piece that makes
embed -> retrieve -> rerank a single XLA program (SURVEY.md section 3.1).
No reference equivalent: the reference ships chunk *text* back through SQL
then over HTTP to the rerank API (``app/blueprints/api.py:122`` ->
``app/llm_services.py:271-281``).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from outline_rag_tpu.index.shard import UPDATE_BLOCK, _stage_limit, drain_staged


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TokenCacheState:
    ids: jax.Array  # [capacity, width] int32
    mask: jax.Array  # [capacity, width] int32
    weights: jax.Array  # [capacity, width] f32 lexical weights (0 = none)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ColbertCacheState:
    """Optional per-token ColBERT vector cache (projected, int8):
    candidates' late-interaction vectors gather by row index instead of
    re-encoding B*K chunks per query (``models/encoder.py::
    colbert_cache_codes``)."""

    codes: jax.Array  # [capacity, width, rank] int8
    scales: jax.Array  # [capacity, width] f32


@functools.partial(jax.jit, donate_argnums=(0,))
def _update_block(state: TokenCacheState, ids, mask, weights, idx) -> TokenCacheState:
    # drop-mode scatter, not dynamic_update_slice: a fixed-size block at
    # the capacity edge would clamp backwards onto live rows (see
    # index/shard.py::_append_block); padding rows carry an out-of-range
    # index and are dropped
    return TokenCacheState(
        ids=state.ids.at[idx].set(ids, mode="drop"),
        mask=state.mask.at[idx].set(mask, mode="drop"),
        weights=state.weights.at[idx].set(weights, mode="drop"),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def _update_colbert(
    state: ColbertCacheState, codes, scales, idx
) -> ColbertCacheState:
    return ColbertCacheState(
        codes=state.codes.at[idx].set(codes, mode="drop"),
        scales=state.scales.at[idx].set(scales, mode="drop"),
    )


class TokenCache:
    def __init__(
        self,
        capacity: int,
        width: int,
        pad_id: int = 1,
        sharding: jax.sharding.Sharding | None = None,
        colbert_rank: int = 0,
    ):
        self.width = width
        self.pad_id = pad_id
        self.capacity = capacity
        self.colbert_rank = colbert_rank
        self._staged = 0
        self.state = TokenCacheState(
            ids=jnp.full((capacity, width), pad_id, jnp.int32),
            mask=jnp.zeros((capacity, width), jnp.int32),
            weights=jnp.zeros((capacity, width), jnp.float32),
        )
        self.colbert = (
            ColbertCacheState(
                codes=jnp.zeros((capacity, width, colbert_rank), jnp.int8),
                scales=jnp.zeros((capacity, width), jnp.float32),
            )
            if colbert_rank
            else None
        )
        if sharding is not None:
            self.state = TokenCacheState(
                ids=jax.device_put(self.state.ids, sharding),
                mask=jax.device_put(self.state.mask, sharding),
                weights=jax.device_put(self.state.weights, sharding),
            )
            if self.colbert is not None:
                self.colbert = ColbertCacheState(
                    codes=jax.device_put(self.colbert.codes, sharding),
                    scales=jax.device_put(self.colbert.scales, sharding),
                )

    @staticmethod
    def warm(
        capacity: int,
        width: int,
        pad_id: int = 1,
        sharding: jax.sharding.Sharding | None = None,
        colbert_rank: int = 0,
    ) -> "TokenCache":
        """Compile the token-cache update programs for ``capacity`` on a
        throwaway cache (same contract as ``DeviceShard.warm``: the jit
        caches are shape-keyed, so growth to this capacity then swaps
        buffers without compiling under the write lock). Returns the
        throwaway cache for query-warm hooks."""
        tc = TokenCache(capacity, width, pad_id, sharding, colbert_rank)
        tc.write(
            0,
            np.full((1, width), pad_id, np.int32),
            np.zeros((1, width), np.int32),
            np.zeros((1, width), np.float32),
            np.zeros((1, width, colbert_rank), np.int8) if colbert_rank else None,
            np.zeros((1, width), np.float32) if colbert_rank else None,
        )
        return tc

    def write(
        self,
        start: int,
        token_ids: np.ndarray,
        token_mask: np.ndarray,
        token_weights: np.ndarray | None = None,
        colbert_codes: np.ndarray | None = None,
        colbert_scales: np.ndarray | None = None,
    ):
        """Write rows [start : start+n). Rows are clipped/padded to width."""
        n = token_ids.shape[0]
        for off in range(0, n, UPDATE_BLOCK):
            blk_ids = token_ids[off : off + UPDATE_BLOCK]
            blk_mask = token_mask[off : off + UPDATE_BLOCK]
            m = blk_ids.shape[0]
            ids_p = np.full((UPDATE_BLOCK, self.width), self.pad_id, np.int32)
            mask_p = np.zeros((UPDATE_BLOCK, self.width), np.int32)
            w_p = np.zeros((UPDATE_BLOCK, self.width), np.float32)
            w = min(blk_ids.shape[1], self.width)
            ids_p[:m, :w] = blk_ids[:, :w]
            mask_p[:m, :w] = blk_mask[:, :w]
            if token_weights is not None:
                w_p[:m, :w] = token_weights[off : off + UPDATE_BLOCK, :w]
            idx = np.full(UPDATE_BLOCK, self.capacity + 1, np.int32)
            idx[:m] = np.arange(
                start + off, start + off + m, dtype=np.int32
            )
            idx_dev = jnp.asarray(idx)
            self.state = _update_block(
                self.state,
                jnp.asarray(ids_p),
                jnp.asarray(mask_p),
                jnp.asarray(w_p),
                idx_dev,
            )
            if self.colbert is not None:
                # rows rewritten WITHOUT colbert data must zero the old
                # occupant's codes (scale 0 contributes nothing to
                # MaxSim) — leaving them stale scores a recycled row
                # with another document's token vectors
                r = self.colbert_rank
                c_p = np.zeros((UPDATE_BLOCK, self.width, r), np.int8)
                s_p = np.zeros((UPDATE_BLOCK, self.width), np.float32)
                if colbert_codes is not None:
                    c_p[:m, :w] = colbert_codes[off : off + UPDATE_BLOCK, :w, :r]
                    s_p[:m, :w] = colbert_scales[off : off + UPDATE_BLOCK, :w]
                self.colbert = _update_colbert(
                    self.colbert,
                    jnp.asarray(c_p),
                    jnp.asarray(s_p),
                    idx_dev,
                )
                self._staged += c_p.nbytes + s_p.nbytes
            # ingest staging backpressure (see index/shard.py): bound
            # the host blocks staged ahead of the lazily-executing
            # update programs, or a long hybrid build OOMs the chip
            self._staged += ids_p.nbytes + mask_p.nbytes + w_p.nbytes
            if self._staged >= _stage_limit():
                drain_staged(self.state.mask)
                if self.colbert is not None:
                    drain_staged(self.colbert.scales)
                self._staged = 0
