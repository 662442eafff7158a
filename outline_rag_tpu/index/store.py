"""VectorIndex: the queryable, mutable, persistable vector store.

Functional replacement for the reference's ``AsyncPGVectorStore`` over
pgvector (reference ``app/rag.py:67-80`` + ``app/database.py:118-139``):

- ``add_chunks`` / ``delete_source`` implement the delete-then-add per-doc
  update protocol (reference ``app/rag.py:216-235``) as tombstone + append
  on device shards.
- ``query`` runs the fused score+top-K kernel (optionally mesh-sharded) and
  translates device row indices back to chunk ids.
- Chunk/doc metadata (text, title, url, updatedAt) stays host-side in the
  document store (``outline_rag_tpu.storage``), mirroring the reference's
  split between the embedding column and metadata columns.
- The index is a derived artifact, reconstructable from the host document
  store (SURVEY.md section 5 checkpoint/resume); ``save``/``load`` persist
  it as a .npz snapshot for fast restarts.

Concurrency: one writer, many CONCURRENT readers (an RCU-flavoured
reader-writer discipline). Mutations donate device buffers (true in-place
HBM updates), which requires that no query holding the old state
dispatches after the donation. Readers therefore enter a read section
(``_RWLock.read``) around snapshot -> dispatch -> fetch -> row-id
translation; the writer drains in-flight readers before its first
donation and blocks new readers only for the duration of the device
mutation dispatch itself — all host-side preparation (normalization,
quantization, tokenization) happens before the write section, so an
ingestion batch adds only the device-update time to concurrent query
latency, and queries never serialize behind each other. This is the
device-side analogue of the reference's single-writer Redis lock
discipline (reference ``app/blueprints/api.py:957``, SURVEY.md section 5).
"""

from __future__ import annotations

import contextlib
import json
import os
import threading

import jax
import jax.numpy as jnp
import numpy as np

from outline_rag_tpu.index.shard import DeviceShard
from outline_rag_tpu.index.tokens import TokenCache
from outline_rag_tpu.ops.quant import quantize_rows_int8
from outline_rag_tpu.ops.topk import NEG, cosine_topk


def _normalize_rows(x: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return (x / norms).astype(np.float32)


class _RWLock:
    """Writer-preferring reader-writer lock.

    Readers run concurrently; a writer first blocks new readers, then
    waits for in-flight readers to drain (they hold device buffers that
    the writer is about to donate), then runs exclusively.
    """

    def __init__(self):
        self._cv = threading.Condition()
        self._readers = 0
        self._writer = False

    @contextlib.contextmanager
    def read(self):
        with self._cv:
            while self._writer:
                self._cv.wait()
            self._readers += 1
        try:
            yield
        finally:
            with self._cv:
                self._readers -= 1
                if not self._readers:
                    self._cv.notify_all()

    @contextlib.contextmanager
    def write(self):
        with self._cv:
            while self._writer:
                self._cv.wait()
            self._writer = True
        try:
            # drain in-flight readers INSIDE the try: an async exception
            # (KeyboardInterrupt) delivered mid-wait must still clear
            # _writer or every later read()/write() deadlocks forever
            with self._cv:
                while self._readers:
                    self._cv.wait()
            yield
        finally:
            with self._cv:
                self._writer = False
                self._cv.notify_all()


class VectorIndex:
    def __init__(
        self,
        dim: int,
        capacity: int = 1 << 17,
        dtype: str = "float32",
        sharding: jax.sharding.Sharding | None = None,
        block_n: int = 1024,
        token_width: int | None = None,
        token_pad_id: int = 1,
        colbert_rank: int = 0,
        rescore_m: int = 64,
    ):
        self.dim = dim
        self.dtype = dtype
        self.block_n = block_n
        # int8 mode: fp32-rescore the top-`rescore_m` quantized
        # candidates before taking the final k (0 disables) — closes
        # the quantized ranking to pgvector-exact semantics
        # (ops/quant.py::int8_topk rescore docstring)
        self.rescore_m = rescore_m if dtype in ("int8", "int8r") else 0
        self._sharding = sharding
        self._shard = DeviceShard(capacity, dim, dtype, sharding)
        self.token_width = token_width
        self.token_pad_id = token_pad_id
        self.colbert_rank = colbert_rank
        self.tokens = (
            TokenCache(
                capacity, token_width, token_pad_id, sharding,
                colbert_rank=colbert_rank,
            )
            if token_width
            else None
        )
        self._by_chunk: dict[str, int] = {}  # chunk_id -> row
        self._by_source: dict[str, list[str]] = {}  # source_id -> chunk ids
        self._rw = _RWLock()
        # ingest-time ColBERT projection matrix [Hc, colbert_rank];
        # lazily pinned by colbert_projection_for and persisted in the
        # snapshot so ingest and query provably share one matrix
        self.colbert_proj: np.ndarray | None = None
        # capacity pre-warming: compile next-capacity mutation (and
        # registered query) programs OUTSIDE the write lock, so a growth
        # event swaps buffers under the lock without a 20-70 s remote
        # compile excluding every reader
        self._warm_hooks: list = []
        self._warmed: set[int] = {capacity}
        self._warm_skipped: set[int] = set()
        self._warm_mutex = threading.Lock()
        self._warm_thread: threading.Thread | None = None

    # ------------------------------------------------------------------
    # capacity pre-warming
    # ------------------------------------------------------------------

    def register_warm_hook(self, fn) -> None:
        """Register ``fn(capacity, shard, tokens)`` to compile
        capacity-dependent query programs (e.g. ``FusedEngine.warm``) —
        ``shard``/``tokens`` are throwaway ``DeviceShard``/``TokenCache``
        instances at the target capacity whose avals (shapes, dtypes,
        shardings) exactly match what growth will create. Called outside
        any lock before a growth swaps in that capacity, and
        speculatively in the background past ~80% occupancy.

        Bound methods are held WEAKLY: a FusedEngine registers itself,
        and a long-lived index must neither pin replaced engines (and
        their full param trees) alive nor spend 20-70 s remote compiles
        warming programs nothing will ever call. Dead hooks are pruned
        at warm time. Plain functions/lambdas are kept strongly (a
        weakref to a fresh lambda would die immediately).
        """
        import weakref

        if hasattr(fn, "__self__"):
            self._warm_hooks.append(weakref.WeakMethod(fn))
        else:
            self._warm_hooks.append(lambda _fn=fn: _fn)

    def _next_capacity(self, needed: int, size: int | None = None) -> int:
        size = self.size if size is None else size
        new_cap = self._shard.capacity
        while new_cap - size < needed or new_cap == self._shard.capacity:
            new_cap *= 2
        return new_cap

    def warm_capacity(self, cap: int) -> None:
        """Synchronously compile every program the index needs at
        ``cap`` (mutation blocks, token-cache updates, registered query
        hooks). Idempotent; takes no index lock, so concurrent queries
        keep running — exactly the point."""
        with self._warm_mutex:
            if cap in self._warmed:
                return
        if not self._warm_would_fit(cap):
            # centralized guard (background, pre-growth, and manual
            # callers all land here): a speculative warm must NEVER
            # attempt an allocation that cannot fit — on the axon
            # runtime a failed multi-GB allocation wedges the device
            # for every subsequent program. Growth still works: the
            # compact path frees the old buffers first and compiles
            # under the lock (slow once, but correct).
            with self._warm_mutex:
                if cap not in self._warm_skipped:
                    self._warm_skipped.add(cap)
                    import logging

                    logging.getLogger(__name__).info(
                        "capacity warm skipped for cap=%d: throwaway + "
                        "live index would not fit device HBM", cap,
                    )
            return
        shard = DeviceShard.warm(cap, self.dim, self.dtype, self._sharding)
        tokens = None
        if self.token_width:
            tokens = TokenCache.warm(
                cap, self.token_width, self.token_pad_id, self._sharding,
                colbert_rank=self.colbert_rank,
            )
        for ref in list(self._warm_hooks):
            fn = ref()
            if fn is None:  # engine was replaced and collected: prune
                try:
                    self._warm_hooks.remove(ref)
                except ValueError:
                    pass
                continue
            try:
                fn(cap, shard, tokens)
            except Exception:
                import logging

                logging.getLogger(__name__).warning(
                    "capacity warm hook failed for cap=%d", cap, exc_info=True
                )
        with self._warm_mutex:
            self._warmed.add(cap)

    def _warm_before_growth(self, n_new: int, source_id: str, replace: bool):
        """Pre-lock growth prediction (single-writer: the sizes cannot
        shrink under us). A mis-prediction is safe — growth just compiles
        under the lock as before."""
        size_est = self.size
        if replace:
            size_est -= len(self._by_source.get(source_id, []))
        if n_new > self._shard.free and size_est + n_new > self._shard.capacity:
            t = self._warm_thread
            if t is not None and t.is_alive():
                t.join()  # a background warm may already be compiling it
            try:
                self.warm_capacity(self._next_capacity(n_new, size_est))
            except Exception:
                # e.g. the throwaway allocation OOMed: let the actual
                # growth (which allocates the same) raise the real error
                # from inside the normal path instead
                import logging

                logging.getLogger(__name__).warning(
                    "pre-growth warm failed; growth will compile cold",
                    exc_info=True,
                )

    # Known per-chip HBM for backends whose PJRT plugin reports no
    # memory stats (the axon tunnel returns None). Override/extend with
    # ORT_HBM_GB. Unknown kinds stay permissive (CPU tests, future
    # chips) — a wrong "no" would break working deployments.
    _HBM_BY_KIND = {
        "TPU v4": 32, "TPU v5 lite": 16, "TPU v5": 95, "TPU v5p": 95,
        "TPU v6 lite": 32, "TPU v6e": 32,
    }

    def _index_bytes(self, cap: int) -> int:
        """Device bytes this index needs at capacity ``cap`` (vectors +
        scales/penalty + token/ColBERT caches) — the same formula for
        the live shard and a prospective one."""
        width = self._shard.state.vectors.shape[1]
        item = self._shard.state.vectors.dtype.itemsize
        width += self._shard.state.residual.shape[1]  # int8r q2 plane
        need = cap * width * item + cap * 8  # vectors + scales/penalty
        if self.tokens is not None:
            need += cap * self.token_width * 12  # ids/mask/weights
            if self.colbert_rank:
                need += cap * self.token_width * (self.colbert_rank + 4)
        return need

    def _warm_would_fit(self, cap: int) -> bool:
        """Best-effort HBM check before a *speculative* warm: the
        throwaway shard at ``cap`` plus the live one must fit with room
        to spare, or the warm could OOM concurrent queries on a chip
        whose corpus already dominates HBM — on the axon runtime a
        failed multi-GB allocation has been observed to wedge the
        device for every subsequent program (measured: 1M x 1024 f32
        rung, the failed 2M warm left all 174 following queries
        RESOURCE_EXHAUSTED). When the plugin reports no memory stats,
        fall back to a device-kind HBM table with the live index's own
        bytes plus an ORT_HBM_RESERVE_GB (default 3) allowance for
        co-resident models/pools/programs. Unknown backends (CPU)
        always pass."""
        import os

        try:
            dev = self._shard.state.vectors.devices().pop()
            need = self._index_bytes(cap)
            stats = None
            try:
                stats = dev.memory_stats()
            except Exception:
                pass
            if stats and stats.get("bytes_limit"):
                return (
                    stats.get("bytes_in_use", 0) + need
                    <= 0.85 * stats["bytes_limit"]
                )
            hbm_gb = os.environ.get("ORT_HBM_GB")
            if hbm_gb is None:
                hbm_gb = self._HBM_BY_KIND.get(getattr(dev, "device_kind", ""))
            if not hbm_gb:
                return True
            limit = float(hbm_gb) * 1e9
            reserve = float(os.environ.get("ORT_HBM_RESERVE_GB", "3")) * 1e9
            used = self._index_bytes(self._shard.capacity) + reserve
            return used + need <= 0.92 * limit
        except Exception:
            return True

    def _maybe_background_warm(self) -> None:
        """Past ~80% occupancy, warm 2x capacity on a daemon thread so
        even the ingest call that finally grows doesn't wait on compiles."""
        if self._shard.cursor * 5 < self._shard.capacity * 4:
            return
        cap = self._shard.capacity * 2
        if not self._warm_would_fit(cap):
            return  # speculative only: never risk OOMing live queries
        with self._warm_mutex:
            if cap in self._warmed:
                return
            t = self._warm_thread
            if t is not None and t.is_alive():
                return
            t = threading.Thread(
                target=self._bg_warm, args=(cap,), daemon=True,
                name="index-capacity-warm",
            )
            self._warm_thread = t
        t.start()

    def _bg_warm(self, cap: int) -> None:
        try:
            self.warm_capacity(cap)
        except Exception:
            import logging

            logging.getLogger(__name__).warning(
                "background capacity warm failed for cap=%d", cap,
                exc_info=True,
            )

    def colbert_projection_for(self, hc: int) -> np.ndarray:
        """The [hc, colbert_rank] projection shared by ingest and query.

        QR output (column signs, rounding) is backend-implementation-
        dependent, so relying on both sides recomputing the fixed-seed
        matrix can silently skew cached scores when a snapshot ingested
        on one backend is served on another. The first caller pins the
        matrix on the index; ``save``/``load`` carry it with the cached
        codes, so a loaded snapshot always scores with its ingest-time
        matrix.
        """
        if self.colbert_rank <= 0:
            raise ValueError("index has no ColBERT cache (colbert_rank=0)")
        if self.colbert_proj is None:
            legacy = getattr(self, "_legacy_colbert_proj", None)
            if legacy is not None:
                # loaded from a pre-persistence snapshot: its cached codes
                # used the un-normalized fixed-seed matrix (see load())
                self.colbert_proj = legacy(hc)
            else:
                from outline_rag_tpu.models.encoder import colbert_projection

                self.colbert_proj = np.asarray(
                    colbert_projection(hc, self.colbert_rank), np.float32
                )
        if self.colbert_proj.shape != (hc, self.colbert_rank):
            raise ValueError(
                f"ColBERT projection shape {self.colbert_proj.shape} does not "
                f"match encoder head ({hc}, {self.colbert_rank}) — snapshot "
                "was ingested with a different encoder"
            )
        return self.colbert_proj

    def read_section(self):
        """Context manager for external readers (FusedEngine): snapshot,
        dispatch, fetch, and row-id translation must all happen inside —
        the writer donates device buffers and rewrites ``row_ids`` in
        place once readers drain."""
        return self._rw.read()

    # ------------------------------------------------------------------
    # mutation
    # ------------------------------------------------------------------

    def add_chunks(
        self,
        chunk_ids: list[str],
        vectors: np.ndarray,
        source_id: str,
        replace: bool = True,
        token_ids: np.ndarray | None = None,
        token_mask: np.ndarray | None = None,
        token_weights: np.ndarray | None = None,
        colbert_codes: np.ndarray | None = None,
        colbert_scales: np.ndarray | None = None,
    ) -> None:
        """Index chunks of one source document. With ``replace`` (the
        default), existing chunks of the same source are tombstoned first —
        the reference's delete-then-add per-doc semantics
        (``app/rag.py:216-235``). ``token_ids``/``token_mask`` feed the
        device token cache for the fused rerank path."""
        assert vectors.shape == (len(chunk_ids), self.dim), vectors.shape
        # host-side preparation outside the write section: concurrent
        # queries only wait for the device mutation dispatch below
        vecs = _normalize_rows(vectors)
        scales = None
        residual = None
        if self.dtype == "int8":
            q, s = quantize_rows_int8(jnp.asarray(vecs))
            vecs = np.asarray(q, np.float32)  # codes carried as f32 host-side
            scales = np.asarray(s)
        elif self.dtype == "int8r":
            from outline_rag_tpu.ops.quant import quantize_rows_int8_residual

            q, s, q2 = quantize_rows_int8_residual(jnp.asarray(vecs))
            vecs = np.asarray(q, np.float32)
            scales = np.asarray(s)
            residual = np.asarray(q2)
        elif self.dtype == "f32x2":
            # pre-split into compensated bf16 pairs (paid once here, not
            # per query tile); carried host-side as f32 holding exactly
            # bf16-representable values — the device append casts exactly
            from outline_rag_tpu.ops.topk import split_f32_bf16x2

            vecs = np.asarray(
                split_f32_bf16x2(jnp.asarray(vecs)).astype(jnp.float32)
            )
        # growth prediction: compile next-capacity programs BEFORE taking
        # the write lock (concurrent queries keep running through the
        # compiles; the locked section below then only swaps buffers)
        self._warm_before_growth(len(chunk_ids), source_id, replace)
        with self._rw.write():
            if replace:
                self._delete_source_locked(source_id)
            if len(chunk_ids) > self._shard.free:
                # churn case (the delta-update protocol tombstones before
                # re-adding): if dropping tombstones makes room, compact
                # at the same capacity instead of doubling HBM
                if self.size + len(chunk_ids) <= self._shard.capacity:
                    self._compact_locked()
                else:
                    self._grow(len(chunk_ids))
            start = self._shard.cursor
            rows = self._shard.append(chunk_ids, vecs, scales, residual)
            if self.tokens is not None and token_ids is not None:
                if token_mask is None:
                    token_mask = (token_ids != self.token_pad_id).astype(np.int32)
                self.tokens.write(
                    start, token_ids, token_mask, token_weights,
                    colbert_codes, colbert_scales,
                )
            for cid, row in zip(chunk_ids, rows):
                self._by_chunk[cid] = int(row)
            self._by_source.setdefault(source_id, [])
            self._by_source[source_id].extend(chunk_ids)
        # speculative: once past ~80% occupancy, background-compile the
        # 2x-capacity programs so the eventual growth stalls nobody
        self._maybe_background_warm()

    def delete_source(self, source_id: str) -> int:
        with self._rw.write():
            return self._delete_source_locked(source_id)

    def _delete_source_locked(self, source_id: str) -> int:
        cids = self._by_source.pop(source_id, [])
        rows = [self._by_chunk.pop(c) for c in cids if c in self._by_chunk]
        self._shard.tombstone(np.asarray(rows, np.int32))
        return len(rows)

    def delete_chunks(self, chunk_ids: list[str]) -> int:
        with self._rw.write():
            rows = [self._by_chunk.pop(c) for c in chunk_ids if c in self._by_chunk]
            self._shard.tombstone(np.asarray(rows, np.int32))
            for cids in self._by_source.values():
                for c in chunk_ids:
                    if c in cids:
                        cids.remove(c)
            return len(rows)

    def _growth_would_fit(self, cap: int) -> bool:
        """Like :meth:`_warm_would_fit` but for the actual growth, which
        frees the old device buffers before allocating the new ones
        (``_compact_locked``): only the NEW index + reserve must fit."""
        import os

        try:
            dev = self._shard.state.vectors.devices().pop()
            need = self._index_bytes(cap)
            hbm_gb = os.environ.get("ORT_HBM_GB")
            if hbm_gb is None:
                hbm_gb = self._HBM_BY_KIND.get(getattr(dev, "device_kind", ""))
            if not hbm_gb:
                return True
            limit = float(hbm_gb) * 1e9
            reserve = float(os.environ.get("ORT_HBM_RESERVE_GB", "3")) * 1e9
            return need + reserve <= 0.92 * limit
        except Exception:
            return True

    def _grow(self, needed: int) -> None:
        """Double capacity. Live rows are copied, tombstones dropped ->
        doubles as compaction. The programs for the new capacity are
        normally already compiled (``_warm_before_growth`` runs outside
        the write lock); a cold growth still works, just slower."""
        cap = self._next_capacity(needed)
        if not self._growth_would_fit(cap):
            raise RuntimeError(
                f"index at terminal capacity for this device: growing to "
                f"{cap} rows (~{self._index_bytes(cap) / 1e9:.1f} GB) "
                f"cannot fit HBM. Use a smaller dtype (bfloat16/int8 "
                f"store 2-4x the rows), shard over a device mesh "
                f"(MESH_DATA_AXIS), or delete sources."
            )
        self._compact_locked(new_capacity=cap)

    def compact(self, new_capacity: int | None = None) -> None:
        """Rewrite the shard keeping only live rows (drops tombstones)."""
        with self._rw.write():
            self._compact_locked(new_capacity)

    def _compact_locked(self, new_capacity: int | None = None) -> None:
        old_state, row_ids, _ = self._shard.snapshot()
        penalty = np.asarray(old_state.penalty)
        live_mask = penalty > NEG / 2
        live_rows = np.nonzero(live_mask)[0]
        vecs = np.asarray(old_state.vectors, np.float32)[live_rows]
        scales = np.asarray(old_state.scales)[live_rows]
        res = (
            np.asarray(old_state.residual)[live_rows]
            if old_state.residual.shape[1] else None
        )
        ids = [row_ids[r] for r in live_rows]
        tok_ids = tok_mask = tok_w = cb_codes = cb_scales = None
        if self.tokens is not None:
            tok_ids = np.asarray(self.tokens.state.ids)[live_rows]
            tok_mask = np.asarray(self.tokens.state.mask)[live_rows]
            tok_w = np.asarray(self.tokens.state.weights)[live_rows]
            if self.tokens.colbert is not None:
                cb_codes = np.asarray(self.tokens.colbert.codes)[live_rows]
                cb_scales = np.asarray(self.tokens.colbert.scales)[live_rows]
        cap = new_capacity or self._shard.capacity
        old_cap = self._shard.capacity
        old_gen = self._shard.generation
        # everything live is now host-side: FREE the old device buffers
        # before allocating the new ones, so peak HBM is max(old, new)
        # rather than old+new — this is what makes doubling a corpus
        # that already dominates the chip possible at all. Safe: we hold
        # the write lock with readers drained, so no snapshot of the old
        # state is in flight.
        del old_state
        self._shard.state = None  # type: ignore[assignment]
        if self.tokens is not None:
            self.tokens.state = None  # type: ignore[assignment]
            self.tokens.colbert = None

        def _rebuild(at_cap: int) -> None:
            self._shard = DeviceShard(
                at_cap, self.dim, self.dtype, self._sharding
            )
            # generation stays monotonic across rebuilds: change
            # detectors (autosave's last-saved-generation check) must
            # never see a rebuilt shard re-walk generation numbers they
            # already saved
            self._shard.generation = old_gen + 1
            if self.tokens is not None:
                self.tokens = TokenCache(
                    at_cap, self.token_width, self.token_pad_id,
                    self._sharding, colbert_rank=self.colbert_rank,
                )
            self._by_chunk.clear()
            if len(ids):
                rows = self._shard.append(
                    ids, vecs,
                    scales if self.dtype in ("int8", "int8r") else None,
                    res,
                )
                if self.tokens is not None and tok_ids is not None:
                    self.tokens.write(
                        0, tok_ids, tok_mask, tok_w, cb_codes, cb_scales
                    )
                for cid, row in zip(ids, rows):
                    self._by_chunk[cid] = int(row)

        try:
            _rebuild(cap)
        except Exception:
            # the new-capacity allocation failed AFTER the old buffers
            # were freed — every live row is still in the host copies,
            # so restore the index at its old capacity and re-raise
            if cap != old_cap:
                _rebuild(old_cap)
            raise

    # ------------------------------------------------------------------
    # query
    # ------------------------------------------------------------------

    @property
    def size(self) -> int:
        return self._shard.live

    @property
    def generation(self) -> int:
        return self._shard.generation

    @property
    def mesh(self):
        """The device mesh when the index is row-sharded over more than one
        device (queries then route through the per-shard kernel +
        all-gather merge), else None."""
        from jax.sharding import NamedSharding

        if (
            isinstance(self._sharding, NamedSharding)
            and self._sharding.mesh.size > 1
        ):
            return self._sharding.mesh
        return None

    def query(
        self, queries: np.ndarray, k: int, impl: str = "auto"
    ) -> tuple[list[list[str]], np.ndarray]:
        """Top-k chunk ids + cosine scores per query. ``queries`` [B, dim].

        Row-sharded indexes dispatch ``parallel/query.py::sharded_topk``:
        each device runs the fused kernel over its own [N/ndev, D] shard and
        only the [B, K] lists cross the interconnect — never a per-device
        [B, N] score matrix (the GSPMD fallback this replaces; the mesh
        serving seam of reference ``app/rag.py:85-87`` at scale).
        """
        q = _normalize_rows(np.atleast_2d(queries))
        with self._rw.read():
            state, row_ids, _ = self._shard.snapshot()
            mesh = self.mesh
            k_eff = min(k, state.capacity // (mesh.size if mesh else 1))
            if self.dtype in ("int8", "int8r"):
                from outline_rag_tpu.ops.quant import int8_topk

                qf = jnp.asarray(q)
                qq, qs = quantize_rows_int8(qf)
                res = (
                    state.residual
                    if (self.dtype == "int8r" and self.rescore_m)
                    else None
                )
                if mesh is not None:
                    from outline_rag_tpu.parallel.query import sharded_topk_int8

                    vals, idx = sharded_topk_int8(
                        qq, qs, state.vectors, state.scales, k_eff,
                        state.penalty, mesh=mesh, impl=impl,
                        block_n=self.block_n,
                        rescore_queries=qf if self.rescore_m else None,
                        rescore_m=self.rescore_m,
                        rescore_residual=res,
                    )
                else:
                    vals, idx = int8_topk(
                        qq, qs, state.vectors, state.scales, k_eff,
                        state.penalty,
                        rescore_queries=qf if self.rescore_m else None,
                        rescore_m=self.rescore_m,
                        rescore_residual=res,
                    )
            elif mesh is not None:
                from outline_rag_tpu.parallel.query import sharded_topk

                vals, idx = sharded_topk(
                    jnp.asarray(q), state.vectors, k_eff, state.penalty,
                    mesh=mesh, impl=impl, block_n=self.block_n,
                )
            else:
                vals, idx = cosine_topk(
                    jnp.asarray(q),
                    state.vectors,
                    k_eff,
                    state.penalty,
                    impl=impl,
                    block_n=self.block_n,
                )
            vals = np.asarray(vals)
            idx = np.asarray(idx)
            # translate row -> chunk id inside the read section: the
            # writer rewrites row_ids in place once readers drain
            out_ids: list[list[str]] = []
            for b in range(idx.shape[0]):
                row = []
                for j in range(idx.shape[1]):
                    if vals[b, j] <= NEG / 2:
                        continue  # fewer than k live rows
                    row.append(str(row_ids[idx[b, j]]))
                out_ids.append(row)
        return out_ids, vals

    # ------------------------------------------------------------------
    # persistence (derived-artifact checkpoint; SURVEY.md section 5)
    # ------------------------------------------------------------------

    def save(self, path: str, compress: bool = False) -> None:
        """Snapshot to ``path``(.npz) + a .meta.json sidecar.

        Uncompressed by default: a multi-GB shard writes at disk speed,
        while zlib (``compress=True``) is single-core ~50 MB/s — minutes
        of restart-path latency for embedding matrices that barely
        compress anyway.
        """
        # Only the device->host fetches need the read section (the same
        # rule CLAUDE.md applies to ingest prep): holding the lock across
        # the multi-GB disk write would let one concurrent ingest —
        # writer-preferring lock — freeze every query for the whole save.
        with self._rw.read():
            state, row_ids, gen = self._shard.snapshot()
            arrays = {
                "vectors": np.asarray(state.vectors, np.float32),
                "scales": np.asarray(state.scales),
                "penalty": np.asarray(state.penalty),
            }
            if state.residual.shape[1]:
                arrays["residual"] = np.asarray(state.residual)
            if self.tokens is not None:
                arrays["token_ids"] = np.asarray(self.tokens.state.ids)
                arrays["token_mask"] = np.asarray(self.tokens.state.mask)
                arrays["token_weights"] = np.asarray(self.tokens.state.weights)
                if self.tokens.colbert is not None:
                    arrays["colbert_codes"] = np.asarray(self.tokens.colbert.codes)
                    arrays["colbert_scales"] = np.asarray(self.tokens.colbert.scales)
                    if self.colbert_proj is not None:
                        arrays["colbert_proj"] = self.colbert_proj
            meta = {
                "dim": self.dim,
                "dtype": self.dtype,
                "capacity": self._shard.capacity,
                "cursor": self._shard.cursor,
                "generation": gen,
                "row_ids": ["" if not r else str(r) for r in row_ids],
                # DEEP copy under the lock: the lists alias live state
                # and json.dump runs after the lock is released
                "by_source": {
                    k: list(v) for k, v in self._by_source.items()
                },
                "token_width": self.token_width,
                "token_pad_id": self.token_pad_id,
                "colbert_rank": self.colbert_rank,
            }
        # Crash-atomic per file (tmp + os.replace), and PAIRED: a random
        # save tag stored in both files lets load() reject a snapshot
        # whose npz and meta come from different saves (a kill between
        # the two replaces would otherwise silently bind old row_ids to
        # new vectors after a compaction reordered rows).
        import secrets

        tag = secrets.token_hex(8)
        arrays["save_tag"] = np.frombuffer(
            bytes.fromhex(tag), np.uint8
        ).copy()
        meta["save_tag"] = tag
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        npz_path = path if path.endswith(".npz") else path + ".npz"
        tmp_npz = npz_path + ".tmp"
        with open(tmp_npz, "wb") as f:
            (np.savez_compressed if compress else np.savez)(f, **arrays)
        os.replace(tmp_npz, npz_path)
        tmp_meta = path + ".meta.json.tmp"
        with open(tmp_meta, "w") as f:
            json.dump(meta, f)
        os.replace(tmp_meta, path + ".meta.json")

    def adopt(self, other: "VectorIndex") -> None:
        """Take over ``other``'s contents (shard, token cache, id maps)
        under the write lock — the snapshot-restore path for a live,
        already-wired index: the app constructs the index first (the
        engine/services hold the reference), then adopts a loaded
        snapshot, so readers keep their handle and simply see the new
        generation. ``other`` must match dim/dtype/token config."""
        if (other.dim, other.dtype, other.token_width, other.colbert_rank) != (
            self.dim, self.dtype, self.token_width, self.colbert_rank
        ):
            raise ValueError(
                "snapshot config mismatch: "
                f"snapshot (dim={other.dim}, dtype={other.dtype}, "
                f"token_width={other.token_width}, rank={other.colbert_rank}) "
                f"vs index (dim={self.dim}, dtype={self.dtype}, "
                f"token_width={self.token_width}, rank={self.colbert_rank})"
            )
        with self._rw.write():
            self._shard = other._shard
            self.tokens = other.tokens
            self._by_chunk = other._by_chunk
            self._by_source = other._by_source
            self.colbert_proj = other.colbert_proj
            if getattr(other, "_legacy_colbert_proj", None) is not None:
                self._legacy_colbert_proj = other._legacy_colbert_proj
        with self._warm_mutex:
            # load() already compiled the mutation programs at the
            # adopted capacity
            self._warmed.add(self._shard.capacity)

    @classmethod
    def load(
        cls, path: str, sharding: jax.sharding.Sharding | None = None
    ) -> "VectorIndex":
        with open(path + ".meta.json") as f:
            meta = json.load(f)
        arrays = np.load(path if path.endswith(".npz") else path + ".npz")
        want_tag = meta.get("save_tag")
        if want_tag is not None:
            got = (
                bytes(np.asarray(arrays["save_tag"], np.uint8)).hex()
                if "save_tag" in arrays else None
            )
            if got != want_tag:
                raise ValueError(
                    "snapshot npz/meta are from DIFFERENT saves "
                    f"(meta tag {want_tag}, npz tag {got}) — a crash "
                    "landed between the two replaces; refusing to bind "
                    "mismatched row ids to vectors (rebuild from store)"
                )
        idx = cls(
            dim=meta["dim"],
            capacity=meta["capacity"],
            dtype=meta["dtype"],
            sharding=sharding,
            token_width=meta.get("token_width"),
            token_pad_id=meta.get("token_pad_id", 1),
            colbert_rank=meta.get("colbert_rank", 0),
        )
        if "colbert_proj" in arrays:
            idx.colbert_proj = np.asarray(arrays["colbert_proj"], np.float32)
        elif "colbert_codes" in arrays and meta.get("colbert_rank", 0):
            # legacy snapshot (pre projection-persistence): its codes were
            # projected with the UN-normalized fixed-seed QR matrix. Pin
            # that exact legacy matrix so cached scores stay consistent —
            # the new sign-normalized colbert_projection would silently
            # flip ~half the rank columns relative to the stored codes.
            # (Caveat: QR rounding/signs are backend-dependent, so this
            # reproduces the ingest matrix exactly only when loading on
            # the same backend family that ingested — the condition every
            # legacy snapshot already required.)
            import logging

            import jax as _jax
            import jax.numpy as _jnp

            rank = meta["colbert_rank"]
            # legacy formula: dim is unknown from the snapshot (codes are
            # [*, rank] post-projection); defer until the encoder's head
            # dim is known, marking the index as legacy
            def _legacy(hc_: int, rank_: int = rank) -> np.ndarray:
                g = _jax.random.normal(
                    _jax.random.key(0x0C01BE47), (hc_, rank_), _jnp.float32
                )
                q, _ = _jnp.linalg.qr(g)
                return np.asarray(
                    q * _jnp.sqrt(_jnp.float32(hc_) / _jnp.float32(rank_)),
                    np.float32,
                )

            idx._legacy_colbert_proj = _legacy
            logging.getLogger(__name__).warning(
                "snapshot %s predates ColBERT projection persistence: "
                "pinning the legacy (un-normalized) fixed-seed matrix; "
                "re-ingest to migrate", path,
            )
        cursor = meta["cursor"]
        row_ids = meta["row_ids"]
        penalty = arrays["penalty"]
        live = [
            r for r in range(cursor) if penalty[r] > NEG / 2 and row_ids[r]
        ]
        if live:
            vecs = arrays["vectors"][live]
            scales = arrays["scales"][live]
            ids = [row_ids[r] for r in live]
            rows = idx._shard.append(
                ids, vecs,
                scales if meta["dtype"] in ("int8", "int8r") else None,
                arrays["residual"][live] if "residual" in arrays else None,
            )
            if idx.tokens is not None and "token_ids" in arrays:
                idx.tokens.write(
                    0,
                    arrays["token_ids"][live],
                    arrays["token_mask"][live],
                    arrays["token_weights"][live]
                    if "token_weights" in arrays
                    else None,
                    arrays["colbert_codes"][live]
                    if "colbert_codes" in arrays
                    else None,
                    arrays["colbert_scales"][live]
                    if "colbert_scales" in arrays
                    else None,
                )
            for cid, row in zip(ids, rows):
                idx._by_chunk[cid] = int(row)
        # rebuild source map restricted to live chunks
        for src, cids in meta["by_source"].items():
            kept = [c for c in cids if c in idx._by_chunk]
            if kept:
                idx._by_source[src] = kept
        return idx
