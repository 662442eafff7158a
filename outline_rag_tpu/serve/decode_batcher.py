"""Continuous batching for the on-TPU chat decoder.

One device program serves N concurrent conversations: the KV cache is a
``[L, B_slots, KvH, C, Dh]`` ring, each slot owns a row, and requests
join/leave at chunk boundaries — the vLLM-style scheduling idea expressed
in JAX terms. Per-row state that varies across requests (position,
temperature, top_p, done) is *traced*, so admission never recompiles:
the decode-chunk program is compiled once per (slots, chunk) and reused
for the life of the process.

Row isolation is structural: attention in ``models/decoder.py`` runs
within each batch row's own cache slots, so a finished/inactive row
decoding garbage cannot influence its neighbours; its position is
clamped below capacity and its writes land in its own row.

Host side is a single worker thread (one chip = one writer) that:
  admit:  prefill the prompt into a fresh 1-row cache (bucketed widths),
          scatter it into the slot row (``dynamic_update_slice``),
  step:   run one chunked decode over the whole batch,
  emit:   push each active row's new token ids to its request queue.

Paged mode (``kv_pages > 0``) replaces the per-slot rings with a shared
page pool (``ops/paged_attention.py``): admission allocates pages by
actual prompt+generation need, prefills the prompt *through the pages*
in fixed-width chunks, and reclaims pages at finish. Full prompt pages
are content-addressed (cumulative block hashes) and shared between
requests with refcounts — vLLM's automatic prefix caching. Sharing is
exact: per-position math is independent of chunk boundaries, so a warm
admission is bit-identical to a cold one. Cached pages with no live
user stay resident and are evicted LRU under pool pressure.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Any

import numpy as np

DONE = object()  # sentinel on request queues


@dataclasses.dataclass
class _Request:
    prompt_ids: list[int]
    temperature: float
    top_p: float
    max_new: int
    out: "queue.Queue[Any]"
    seed: int
    token: int = 0  # cancellation handle (see DecodeBatcher.cancel)


class DecodeBatcher:
    def __init__(
        self,
        params,
        cfg,
        slots: int = 4,
        chunk_tokens: int = 8,
        eos_id: int = 2,
        prompt_buckets: tuple = (64, 128, 256, 512, 1024, 2048),
        spec_k: int = 0,  # >0 -> prompt-lookup speculative steps
        spec_gram: int = 3,
        kv_pages: int = 0,  # >0 -> paged KV pool of this many pages
        page_size: int = 128,
        prefix_cache: bool = True,  # paged mode: share full prompt pages
        prefill_chunk: int = 256,  # paged-prefill program width (tokens)
        kv_int8: bool = False,  # paged mode: int8 pool (half the KV HBM)
        mesh=None,  # TP mesh (parallel/tp.py): ring cache shards on KvH
    ):
        import functools

        import jax
        import jax.numpy as jnp

        from outline_rag_tpu.models.decoder import (
            PagedKV,
            _sample_one,
            decoder_forward,
            generate_chunk_spec,
            init_cache,
            init_paged_cache,
            key_at,
        )

        self._jax, self._jnp = jax, jnp
        self.params = params
        self.cfg = cfg
        self.slots = slots
        self.chunk_tokens = chunk_tokens
        self.eos_id = eos_id
        kept = tuple(b for b in prompt_buckets if b <= cfg.max_cache)
        # ladder reaches max_cache: a prompt above the top bucket would
        # prefill unbucketed (negative pad -> no pad), one fresh remote
        # compile per distinct length with every stream frozen behind it
        if not kept or kept[-1] < cfg.max_cache:
            kept = kept + (cfg.max_cache,)
        self.prompt_buckets = kept

        # paged-KV mode (ops/paged_attention.py): slots share a pool of
        # kv_pages fixed-size pages, allocated per request by actual
        # prompt+max_new need and reclaimed at finish — HBM scales with
        # live sequence lengths, not slots x max_cache. Page 0 is the
        # reserved scratch target of inactive rows. Admission applies
        # backpressure: a request that cannot get its pages waits (in
        # order) until a finishing request frees them. With
        # ``prefix_cache`` full prompt pages are content-addressed
        # (cumulative block hash) and shared between requests with
        # refcounts — repeated system/history prefixes skip their
        # prefill entirely (vLLM's automatic prefix caching, paged-TPU
        # form). Sharing is exact: warm and cold admissions run the
        # same per-position math, so outputs are bit-identical.
        self.page_size = page_size
        self.kv_pages = int(kv_pages)
        self._held: _Request | None = None
        self._adm: dict | None = None  # staged paged admission in flight
        self.prefix_hits = 0  # prompt pages served from cache (stats)
        self.prefix_lookups = 0
        self.backpressure_waits = 0  # admissions deferred for lack of pages
        # speculative acceptance (stats): tokens emitted per verify step
        # across active rows — 1.0 means drafts never help, K+1 is the
        # all-accepted ceiling
        self.spec_emitted = 0
        self.spec_steps = 0
        if kv_int8 and self.kv_pages <= 0:
            raise ValueError(
                "kv_int8 requires the paged pool (set kv_pages > 0 / "
                "DECODER_KV_PAGES); refusing to silently run the "
                "full-precision ring"
            )
        self.kv_int8 = bool(kv_int8)
        self.mesh = mesh
        if self.kv_pages > 0:
            self.cache = init_paged_cache(
                cfg, slots, self.kv_pages, page_size,
                kv_dtype="int8" if self.kv_int8 else None,
                mesh=mesh,  # TP: pools shard on KvH; tables replicate
            )
            self._maxp = cfg.max_cache // page_size
            if self.kv_pages < self._maxp + 1:
                # page 0 is scratch; a max-length request needs maxp pages
                # or admission could deadlock waiting on an empty batcher
                raise ValueError(
                    f"kv_pages={kv_pages} < max_cache/page_size+1 "
                    f"({self._maxp + 1}): one full-length request must fit"
                )
            self._free_pages = list(range(self.kv_pages - 1, 0, -1))
            self._row_pages: list[list[int]] = [[] for _ in range(slots)]
            self._page_ref = [0] * self.kv_pages
            self.prefix_cache = bool(prefix_cache)
            # hash -> page, insertion-ordered (LRU: touched entries are
            # re-inserted at the end); page -> hash for reverse lookup
            self._prefix_map: dict[bytes, int] = {}
            self._page_hash: dict[int, bytes] = {}
            self._pfc = max(
                page_size, min(int(prefill_chunk), cfg.max_cache)
            )

            def set_table_row(cache, row_table, row):
                table = jax.lax.dynamic_update_slice(
                    cache.table, row_table[None, :], (row, 0)
                )
                return dataclasses.replace(cache, table=table)

            # the pool is the dominant HBM tenant, so every program that
            # threads it through donates it — without donation XLA keeps
            # input + output copies alive (2x pool peak, copy bandwidth
            # rivalling the attention itself)
            self._set_table_row = jax.jit(set_table_row, donate_argnums=(0,))

            def prefill_paged(p, cache, row_table, toks, start):
                # one-row paged prefill: writes land in the row's own
                # pages via the table; attention walks shared prefix
                # pages read-only (start > their span). The full cache
                # threads through so int8 scale pools travel with k/v;
                # the slot table is restored on the way out.
                row_view = dataclasses.replace(cache, table=row_table[None])
                logits, row_view = decoder_forward(
                    p, toks, row_view, start[None], cfg
                )
                return logits, dataclasses.replace(
                    row_view, table=cache.table
                )

            self._prefill_paged = jax.jit(prefill_paged, donate_argnums=(1,))
        else:
            self.prefix_cache = False
            self.cache = init_cache(cfg, slots)
        if mesh is not None and self.kv_pages <= 0:
            from outline_rag_tpu.parallel.tp import shard_decoder_cache

            self.cache = shard_decoder_cache(self.cache, mesh)
            self._init_row_cache = lambda: shard_decoder_cache(
                init_cache(cfg, 1), mesh
            )
        else:
            self._init_row_cache = functools.partial(init_cache, cfg, 1)
        self.tok = np.zeros((slots,), np.int32)
        self.pos = np.zeros((slots,), np.int32)
        self.temp = np.zeros((slots,), np.float32)
        self.tp = np.ones((slots,), np.float32)
        self.active: list[_Request | None] = [None] * slots
        self.produced = [0] * slots
        import itertools

        self.pending: "queue.Queue[_Request]" = queue.Queue()
        # itertools.count().__next__ is atomic at the C level: submit()
        # runs on caller threads, and duplicate tokens would let a
        # cancel() kill the wrong stream
        self._next_token = itertools.count(1).__next__
        self._cancelled: set[int] = set()  # tokens; set ops are atomic
        self._live: set[int] = set()  # tokens of unfinished requests
        self._wake = threading.Event()
        self._stop = False
        self.dead: Exception | None = None  # set when the worker crashes
        # sampler convention (all batched paths): the token landing at
        # absolute position q is sampled with key_at(fold_in(KEY0,
        # row_seed), q) — per-request randomness (mixed batches never
        # share streams), reproducible given (seed, prompt), and
        # identical between the plain and speculative step programs
        self.seed = np.zeros((slots,), np.int32)
        self._key0 = jax.random.key(0)

        self._prefill = jax.jit(
            lambda p, toks, cache: decoder_forward(
                p, toks, cache, jnp.zeros((1,), jnp.int32), cfg
            )
        )

        def insert(cache, row_cache, row):
            k, v = cache
            k1, v1 = row_cache
            idx = (0, row, 0, 0, 0)
            return (
                jax.lax.dynamic_update_slice(k, k1, idx),
                jax.lax.dynamic_update_slice(v, v1, idx),
            )

        self._insert = jax.jit(insert, donate_argnums=(0,))

        def step_chunk(p, cache, tok, pos, seeds, temp, tp, active):
            cap = cfg.max_cache - 2
            base = jax.vmap(
                lambda s: jax.random.fold_in(self._key0, s)
            )(seeds)

            def body(carry, _):
                cache, tok, pos, done = carry
                logits, cache = decoder_forward(p, tok[:, None], cache, pos, cfg)
                keys_b = jax.vmap(key_at)(base, pos + 1)
                nxt = jax.vmap(_sample_one)(
                    logits[:, -1, :].astype(jnp.float32), keys_b, temp, tp
                )
                nxt = jnp.where(done, jnp.int32(eos_id), nxt)
                done = jnp.logical_or(done, nxt == eos_id)
                pos = jnp.minimum(pos + 1, cap)
                return (cache, nxt, pos, done), nxt

            done0 = jnp.logical_not(active)
            (cache, tok, pos, _), toks = jax.lax.scan(
                body, (cache, tok, pos, done0), None, length=chunk_tokens
            )
            return toks.T, cache, tok, pos

        self._step_chunk = jax.jit(step_chunk, donate_argnums=(1,))

        # speculative mode: each of chunk_tokens verify steps advances a
        # row by 1..spec_k+1 tokens (prompt-lookup drafts; output is
        # distribution-identical — models/decoder.py::generate_chunk_spec).
        # Rows diverge freely: positions, cursors, and counts are per-row.
        self.spec_k = int(spec_k)
        self.tok_buf = None
        if self.spec_k > 0:
            self.tok_buf = jnp.zeros((slots, cfg.max_cache), jnp.int32)

            def insert_buf(buf, row_buf, row):
                return jax.lax.dynamic_update_slice(buf, row_buf, (row, 0))

            self._insert_buf = jax.jit(insert_buf, donate_argnums=(0,))

            def step_spec(p, cache, buf, tok, pos, seeds, temp, tp, inactive):
                return generate_chunk_spec(
                    p, cache, buf, tok, pos, self._key0, cfg,
                    n_steps=chunk_tokens, draft_k=self.spec_k,
                    gram=int(spec_gram), temperature=temp, top_p=tp,
                    eos_id=eos_id, done0=inactive, seeds=seeds,
                )

            self._step_spec = jax.jit(step_spec, donate_argnums=(1, 2))

        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # -- public API (thread-safe) -----------------------------------------

    def submit(
        self,
        prompt_ids: list[int],
        temperature: float,
        top_p: float,
        max_new: int,
        seed: int = 0,
    ) -> "queue.Queue[Any]":
        """Enqueue a request; returns a queue yielding lists of token ids
        and finally the DONE sentinel."""
        if self.dead is not None:
            raise RuntimeError("decode batcher worker is dead") from self.dead
        if self._stop:
            # a submit racing a clean close() would enqueue a request no
            # one will ever drain — the caller would block forever
            raise RuntimeError("decode batcher is closed")
        out: "queue.Queue[Any]" = queue.Queue()
        limit = self.cfg.max_cache - max_new - 2
        prompt_ids = list(prompt_ids)[-max(limit, 4):]
        # cap generation so positions never reach the ring capacity
        max_new = min(max_new, self.cfg.max_cache - len(prompt_ids) - 2)
        tok = self._next_token()
        out.cancel_token = tok  # handle for cancel(out)
        self._live.add(tok)
        self.pending.put(
            _Request(
                prompt_ids, float(temperature), float(top_p), max_new,
                out, seed, token=tok,
            )
        )
        self._wake.set()
        if self.dead is not None:  # worker died between the check and the put
            self._die(self.dead)
        return out

    def _retire(self, req: "_Request | None") -> None:
        """Mark a request finished: its token leaves the live set and any
        pending cancel mark is dropped (bounds both sets for the life of
        a long-running server)."""
        if req is not None:
            self._live.discard(req.token)
            self._cancelled.discard(req.token)

    def cancel(self, out: "queue.Queue[Any]") -> None:
        """Abandon the stream bound to ``out`` (thread-safe; e.g. the
        client disconnected mid-SSE). The worker reclaims the slot —
        and in paged mode the pages — at its next scheduling point
        instead of decoding the remaining max_new tokens for nobody.
        The stream still ends with DONE."""
        token = getattr(out, "cancel_token", None)
        if token is not None and token in self._live:
            self._cancelled.add(token)
            self._wake.set()

    def stats(self) -> dict:
        """Operational snapshot (reads are racy-but-harmless: ints)."""
        out = {
            "slots": self.slots,
            "active": sum(1 for r in self.active if r is not None),
            "queued": self.pending.qsize()
            + (1 if self._held else 0)
            + (1 if self._adm is not None else 0),
            "admitting": self._adm is not None,
            "mode": "paged" if self.kv_pages > 0 else "ring",
        }
        if self.spec_k > 0:
            out["spec_tokens_per_step"] = (
                round(self.spec_emitted / self.spec_steps, 3)
                if self.spec_steps else None
            )
        if self.kv_pages > 0:
            out.update(
                pages_total=self.kv_pages - 1,  # page 0 is scratch
                kv_dtype="int8" if self.kv_int8 else str(self.cfg.dtype.__name__),
                pages_free=len(self._free_pages),
                pages_cached=len(self._prefix_map),
                prefix_hits=self.prefix_hits,
                prefix_lookups=self.prefix_lookups,
                backpressure_waits=self.backpressure_waits,
            )
        return out

    def flush_prefix_cache(self) -> None:
        """Drop every cached prefix page with no live user (frees them
        for reallocation). Pages still referenced by active rows keep
        their cache entries. Only safe while no admission is in flight
        (the worker owns these structures); meant for tests/benchmarks
        and operator resets."""
        if self.kv_pages <= 0:
            return
        for h, pg in list(self._prefix_map.items()):
            if self._page_ref[pg] == 0:
                del self._prefix_map[h]
                del self._page_hash[pg]
                self._free_pages.append(pg)

    def close(self) -> None:
        """Stop the worker; active and pending requests get DONE so no
        caller blocks forever on a dead batcher.

        The worker thread is the only writer of batcher state, so the
        teardown below must not run concurrently with it: a worker stuck
        in a 20-70 s remote-TPU compile outlives a bounded join, and
        mutating ``_adm``/``_held``/``active`` (or double-putting DONE)
        under it corrupts the slot accounting. Join until the thread is
        actually dead; if it is wedged far past any plausible compile,
        leave the state to it — callers still unblock because the worker
        runs ``_drain_done`` when its loop exits on ``_stop``.
        """
        self._stop = True
        self._wake.set()
        deadline = 18  # x10s ≈ 3 min, past any observed remote compile
        for _ in range(deadline):
            self._thread.join(timeout=10)
            if not self._thread.is_alive():
                break
        if self._thread.is_alive():
            import logging

            logging.getLogger(__name__).error(
                "decode batcher worker did not exit within %ss; "
                "skipping teardown of worker-owned state",
                deadline * 10,
            )
            return
        # the worker already ran _drain_done on its way out; one more
        # sweep catches a request that raced past submit()'s closed check
        # before _stop was visible
        self._drain_done()

    # -- worker ------------------------------------------------------------

    def _free_slot(self) -> int | None:
        reserved = self._adm["row"] if self._adm is not None else -1
        for i, r in enumerate(self.active):
            if r is None and i != reserved:
                return i
        return None

    def _row_seed(self, req: _Request) -> int:
        return req.seed or (abs(hash(tuple(req.prompt_ids))) % (2**31))

    def _sample_first(self, req: _Request, logits, offset: int) -> int:
        jnp, jax = self._jnp, self._jax
        from outline_rag_tpu.models.decoder import _sample_one, key_at

        # the first token lands at position t=len(prompt): same
        # positional-key convention as the step programs, so the whole
        # stream for a (seed, prompt) pair is one deterministic sequence
        t = len(req.prompt_ids)
        base = jax.random.fold_in(self._key0, self._row_seed(req))
        first = _sample_one(
            logits[0, offset, :].astype(jnp.float32),
            key_at(base, t),
            jnp.float32(req.temperature),
            jnp.float32(req.top_p),
        )
        return int(first)

    def _set_row_state(self, req: _Request, row: int, first_id: int) -> None:
        jnp = self._jnp
        t = len(req.prompt_ids)
        if self.tok_buf is not None:
            row_buf = np.zeros((1, self.cfg.max_cache), np.int32)
            row_buf[0, :t] = req.prompt_ids
            self.tok_buf = self._insert_buf(
                self.tok_buf, jnp.asarray(row_buf), jnp.int32(row)
            )
        self.tok[row] = first_id
        self.pos[row] = t
        self.seed[row] = self._row_seed(req)
        self.temp[row] = req.temperature
        self.tp[row] = req.top_p
        self.active[row] = req
        self.produced[row] = 1
        req.out.put([first_id])

    def _admit(self, req: _Request, row: int) -> bool:
        """Admit ``req`` into slot ``row``. Returns False when the paged
        pool cannot supply the request's pages yet (backpressure: the
        caller holds the request until a finish frees pages). Paged mode
        only *stages* the admission here; prefill advances chunk-by-chunk
        in the worker loop."""
        if self.kv_pages > 0:
            return self._start_admission(req, row)
        jnp = self._jnp
        t = len(req.prompt_ids)
        bucket = next(
            (b for b in self.prompt_buckets if b >= t), self.prompt_buckets[-1]
        )
        padded = req.prompt_ids + [0] * (bucket - t)
        logits, row_cache = self._prefill(
            self.params, jnp.asarray([padded], jnp.int32), self._init_row_cache()
        )
        first_id = self._sample_first(req, logits, t - 1)
        if first_id == self.eos_id or req.max_new < 1:
            self._retire(req)
            req.out.put(DONE)
            return True
        self.cache = self._insert(self.cache, row_cache, row)
        self._set_row_state(req, row, first_id)
        return True

    # -- paged-pool bookkeeping (worker thread only) -----------------------

    def _block_hashes(self, ids: list[int]) -> list[bytes]:
        """Cumulative content hash per full page-size block: block i's
        key commits to every token in [0, (i+1)*page_size)."""
        import hashlib

        s = self.page_size
        hs: list[bytes] = []
        prev = b""
        for i in range(len(ids) // s):
            m = hashlib.blake2b(prev, digest_size=16)
            m.update(np.asarray(ids[i * s:(i + 1) * s], np.int32).tobytes())
            prev = m.digest()
            hs.append(prev)
        return hs

    def _evict_one(self) -> bool:
        """Free the least-recently-used cached page with no live user."""
        victim = None
        for h, pg in self._prefix_map.items():
            if self._page_ref[pg] == 0:
                victim = (h, pg)
                break
        if victim is None:
            return False
        h, pg = victim
        del self._prefix_map[h]
        del self._page_hash[pg]
        self._free_pages.append(pg)
        return True

    def _release_pages(self, pages: list[int]) -> None:
        for pg in reversed(pages):
            self._page_ref[pg] -= 1
            if self._page_ref[pg] <= 0 and pg not in self._page_hash:
                self._free_pages.append(pg)

    def _register_prompt_pages(
        self, hashes: list[bytes], pages: list[int], n_full: int
    ) -> None:
        """Content-address the request's full prompt pages so later
        requests with the same prefix can share them. Generated tokens
        are never cached (their pages mutate until finish)."""
        if not self.prefix_cache:
            return
        for i in range(n_full):
            h = hashes[i]
            if h in self._prefix_map or pages[i] in self._page_hash:
                continue
            self._prefix_map[h] = pages[i]
            self._page_hash[pages[i]] = h

    def _start_admission(self, req: _Request, row: int) -> bool:
        """Allocate pages for ``req`` and stage an incremental admission
        (host-side only — no device work). Returns False under
        backpressure. Prefill then advances ONE chunk per worker-loop
        iteration (``_advance_admission``), interleaved with decode
        steps, so a long prompt never stalls active streams for more
        than one chunk (vLLM's chunked-prefill scheduling)."""
        s = self.page_size
        t = len(req.prompt_ids)
        hashes = self._block_hashes(req.prompt_ids) if self.prefix_cache else []

        # longest cached chain of full prompt pages — capped so at least
        # one suffix token remains to forward (its logits seed sampling)
        shared: list[int] = []
        for i in range(min(len(hashes), (t - 1) // s)):
            pg = self._prefix_map.get(hashes[i])
            if pg is None:
                break
            shared.append(pg)
        # take refs up front: a ref-0 cached page we are about to share
        # must not double as an eviction candidate below
        for pg in shared:
            self._page_ref[pg] += 1
            h = self._page_hash[pg]  # LRU touch
            self._prefix_map.pop(h)
            self._prefix_map[h] = pg
        self.prefix_lookups += 1
        self.prefix_hits += len(shared)

        # worst-case pages for prompt + generation (+ the speculative
        # write window), so the row can never starve mid-flight
        span = t + req.max_new + 1 + self.spec_k
        need = min(-(-span // s), self._maxp)
        fresh_needed = need - len(shared)
        while len(self._free_pages) < fresh_needed:
            if not self._evict_one():
                for pg in shared:  # roll back; hold for backpressure
                    self._page_ref[pg] -= 1
                self.backpressure_waits += 1
                return False
        fresh = [self._free_pages.pop() for _ in range(fresh_needed)]
        for pg in fresh:
            self._page_ref[pg] = 1
        pages = shared + fresh

        row_table = np.zeros((self._maxp,), np.int32)
        row_table[: len(pages)] = pages
        self._adm = {
            "req": req, "row": row, "pages": pages, "hashes": hashes,
            "table": self._jnp.asarray(row_table), "t": t,
            "c0": len(shared) * s, "logits": None,
        }
        return True

    def _advance_admission(self) -> None:
        """One prefill chunk of the staged admission; finalizes (first
        token, prefix registration, row activation) after the last.
        Chunk sequence and per-position math are identical to a
        monolithic prefill, so interleaving never changes output."""
        jnp = self._jnp
        adm = self._adm
        assert adm is not None
        req, t, c0 = adm["req"], adm["t"], adm["c0"]
        if req.token in self._cancelled:
            self._retire(req)
            self._release_pages(adm["pages"])
            self._adm = None
            req.out.put(DONE)
            return
        pfc = self._pfc
        try:
            chunk = req.prompt_ids[c0:c0 + pfc]
            chunk = chunk + [0] * (pfc - len(chunk))
            logits, self.cache = self._prefill_paged(
                self.params, self.cache, adm["table"],
                jnp.asarray([chunk], jnp.int32),
                jnp.asarray(c0, jnp.int32),
            )
            adm["c0"] = c0 + pfc
            if adm["c0"] < t:
                return  # more chunks to go; let decode steps interleave
            first_id = self._sample_first(req, logits, (t - 1) - c0)
        except Exception:
            # keep the pool accounting coherent (refs dropped, fresh
            # pages freed) before the caller's fail-fast policy runs
            self._release_pages(adm["pages"])
            self._adm = None
            raise
        self._adm = None
        s = self.page_size
        self._register_prompt_pages(adm["hashes"], adm["pages"], t // s)
        if first_id == self.eos_id or req.max_new < 1:
            self._retire(req)
            self._release_pages(adm["pages"])
            req.out.put(DONE)
            return
        row = adm["row"]
        self._row_pages[row] = adm["pages"]
        self.cache = self._set_table_row(
            self.cache, adm["table"], jnp.int32(row)
        )
        self._set_row_state(req, row, first_id)

    def _finish(self, row: int) -> None:
        req = self.active[row]
        self.active[row] = None
        self._retire(req)
        if self.kv_pages > 0 and self._row_pages[row]:
            # drop the row's refs (cached prefix pages stay resident for
            # reuse until evicted); point its table at the scratch page 0
            # so the (still-running) row's garbage writes can never land
            # in a reallocated page
            self._release_pages(self._row_pages[row])
            self._row_pages[row] = []
            self.cache = self._set_table_row(
                self.cache,
                self._jnp.zeros((self._maxp,), self._jnp.int32),
                self._jnp.int32(row),
            )
        if req is not None:
            req.out.put(DONE)

    def _stage_admissions(self) -> None:
        """Admit pending requests into free slots (in order; a request
        the paged pool cannot serve yet is held, blocking later ones,
        until a finishing request frees pages). Paged mode stages at
        most one admission at a time; ring mode admits fully inline."""
        while not (self.kv_pages > 0 and self._adm is not None):
            row = self._free_slot()
            if row is None:
                break
            if self._held is not None:
                req, self._held = self._held, None
            else:
                try:
                    req = self.pending.get_nowait()
                except queue.Empty:
                    break
            if req.token in self._cancelled:
                self._retire(req)
                req.out.put(DONE)
                continue
            try:
                if not self._admit(req, row):
                    self._held = req
                    break
            except Exception as e:  # surface failures to the caller
                self._retire(req)
                req.out.put(e)
                req.out.put(DONE)

    def _run(self) -> None:
        jnp = self._jnp
        jax = self._jax

        while not self._stop:
            self._stage_admissions()
            if self._cancelled:
                # cancel() raced a completion: drop tokens no longer live
                self._cancelled &= self._live
            # Advance the staged paged admission. At full load: one
            # prefill chunk per decode step (latency fairness for the
            # active streams). With idle slots: burn through idle
            # capacity — up to min(8, idle) chunks, staging follow-up
            # admissions as each completes. Without this, a burst of
            # arrivals ramps at one admission per ~prompt_len/chunk
            # decode steps and steady-state concurrency stalls near 2
            # active rows while every step pays full-slot-count compute
            # (the measured slot-scaling inversion: 233 tok/s at 8
            # slots falling to 118 at 32).
            idle = sum(1 for r in self.active if r is None)
            budget = min(8, max(1, idle))
            while budget > 0 and self._adm is not None:
                adm_req = self._adm["req"]
                try:
                    self._advance_admission()
                except Exception as e:
                    # a failed paged prefill may have died mid-way
                    # through donated pool updates: cache integrity is
                    # unknown, so fail the whole batcher fast rather
                    # than decode from a corrupt pool
                    self._retire(adm_req)
                    adm_req.out.put(e)
                    adm_req.out.put(DONE)
                    self._die(e)
                    return
                budget -= 1
                if self._adm is None:
                    self._stage_admissions()

            if self._adm is None and not any(
                r is not None for r in self.active
            ):
                self._wake.wait(timeout=0.1)
                self._wake.clear()
                continue
            if not any(r is not None for r in self.active):
                continue  # only the staged admission is in flight

            try:
                active_mask = np.asarray(
                    [r is not None for r in self.active], bool
                )
                counts = None
                if self.tok_buf is not None:
                    emitted, cnt, self.cache, self.tok_buf, tok_dev, pos_dev = (
                        self._step_spec(
                            self.params,
                            self.cache,
                            self.tok_buf,
                            jnp.asarray(self.tok),
                            jnp.asarray(self.pos),
                            jnp.asarray(self.seed),
                            jnp.asarray(self.temp),
                            jnp.asarray(self.tp),
                            jnp.asarray(~active_mask),
                        )
                    )
                    # one device_get tree-fetch: a single host<->device
                    # round trip for all step outputs (4 sequential
                    # np.asarray fetches each pay the full tunnel RTT)
                    toks_np, counts, tok_np, pos_np = jax.device_get(
                        (emitted, cnt, tok_dev, pos_dev)
                    )  # toks_np: [slots, steps*(K+1)]
                    self.spec_emitted += int(counts[active_mask].sum())
                    self.spec_steps += (
                        int(active_mask.sum()) * self.chunk_tokens
                    )
                else:
                    toks, self.cache, tok_dev, pos_dev = self._step_chunk(
                        self.params,
                        self.cache,
                        jnp.asarray(self.tok),
                        jnp.asarray(self.pos),
                        jnp.asarray(self.seed),
                        jnp.asarray(self.temp),
                        jnp.asarray(self.tp),
                        jnp.asarray(active_mask),
                    )
                    toks_np, tok_np, pos_np = jax.device_get(
                        (toks, tok_dev, pos_dev)
                    )  # toks_np: [slots, chunk]
                # np.array copies: device_get can return read-only
                # zero-copy views and the admit path writes rows in place
                self.tok = np.array(tok_np, np.int32)
                self.pos = np.array(pos_np, np.int32)
                for row, req in enumerate(self.active):
                    if req is None:
                        continue
                    if req.token in self._cancelled:
                        self._finish(row)  # reclaims slot/pages; DONE
                        continue
                    ids = toks_np[row].tolist()
                    if counts is not None:
                        ids = ids[: int(counts[row])]
                        if not ids:  # capacity-frozen row: end the stream
                            self._finish(row)
                            continue
                    stop = self.eos_id in ids
                    if stop:
                        ids = ids[: ids.index(self.eos_id)]
                    room = req.max_new - self.produced[row]
                    if len(ids) >= room:
                        ids = ids[:room]
                        stop = True
                    self.produced[row] += len(ids)
                    if ids:
                        req.out.put(ids)
                    if stop:
                        self._finish(row)
            except Exception as e:  # device/runtime failure: fail every
                self._die(e)  # waiter, mark dead so submit() fails fast
                return
        # normal stop: the worker owns the final drain (see _drain_done)
        self._drain_done()

    def _drain_done(self) -> None:
        """Worker-side final drain: every staged/held/active/pending
        request gets DONE and the state is cleared. Runs when the worker
        loop exits on ``_stop`` — so even if ``close()`` gave up joining
        a wedged worker (blocked minutes in a remote compile/fetch) and
        skipped its own teardown, the streams still terminate the moment
        the worker comes back and observes the stop flag."""
        if self._adm is not None:
            self._retire(self._adm["req"])
            self._adm["req"].out.put(DONE)
            self._adm = None
        if self._held is not None:
            self._retire(self._held)
            self._held.out.put(DONE)
            self._held = None
        for row, req in enumerate(self.active):
            if req is not None:
                self.active[row] = None
                self._retire(req)
                req.out.put(DONE)
        while True:
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
                break
            self._retire(req)
            req.out.put(DONE)

    def _die(self, exc: Exception) -> None:
        self.dead = exc
        if self._adm is not None:
            self._retire(self._adm["req"])
            self._adm["req"].out.put(exc)
            self._adm["req"].out.put(DONE)
            self._adm = None
        if self._held is not None:
            self._retire(self._held)
            self._held.out.put(exc)
            self._held.out.put(DONE)
            self._held = None
        for row, req in enumerate(self.active):
            if req is not None:
                self.active[row] = None
                self._retire(req)
                req.out.put(exc)
                req.out.put(DONE)
        while True:
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
                break
            self._retire(req)
            req.out.put(exc)
            req.out.put(DONE)
