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
    ):
        import functools

        import jax
        import jax.numpy as jnp

        from outline_rag_tpu.models.decoder import (
            decoder_forward,
            generate_chunk_spec,
            init_cache,
            init_paged_cache,
            sample_token,
        )

        self._jax, self._jnp = jax, jnp
        self.params = params
        self.cfg = cfg
        self.slots = slots
        self.chunk_tokens = chunk_tokens
        self.eos_id = eos_id
        self.prompt_buckets = tuple(
            b for b in prompt_buckets if b <= cfg.max_cache
        ) or (cfg.max_cache,)

        # paged-KV mode (ops/paged_attention.py): slots share a pool of
        # kv_pages fixed-size pages, allocated per request by actual
        # prompt+max_new need and reclaimed at finish — HBM scales with
        # live sequence lengths, not slots x max_cache. Page 0 is the
        # reserved scratch target of inactive rows. Admission applies
        # backpressure: a request that cannot get its pages waits (in
        # order) until a finishing request frees them.
        self.page_size = page_size
        self.kv_pages = int(kv_pages)
        self._held: _Request | None = None
        if self.kv_pages > 0:
            self.cache = init_paged_cache(cfg, slots, self.kv_pages, page_size)
            self._maxp = cfg.max_cache // page_size
            self._free_pages = list(range(self.kv_pages - 1, 0, -1))
            self._row_pages: list[list[int]] = [[] for _ in range(slots)]

            def set_table_row(cache, row_table, row):
                table = jax.lax.dynamic_update_slice(
                    cache.table, row_table[None, :], (row, 0)
                )
                return dataclasses.replace(cache, table=table)

            self._set_table_row = jax.jit(set_table_row)

            def copy_page(cache, ring_k, ring_v, pg, src_off):
                # ring [L, 1, KvH, C, Dh] -> pool page [L, pg, KvH, S, Dh]
                l, _, kvh, _, dh = ring_k.shape
                blk_k = jax.lax.dynamic_slice(
                    ring_k, (0, 0, 0, src_off, 0), (l, 1, kvh, page_size, dh)
                )[:, 0]  # [L, KvH, S, Dh]
                blk_v = jax.lax.dynamic_slice(
                    ring_v, (0, 0, 0, src_off, 0), (l, 1, kvh, page_size, dh)
                )[:, 0]
                k = jax.lax.dynamic_update_slice(
                    cache.k, blk_k[:, None], (0, pg, 0, 0, 0)
                )
                v = jax.lax.dynamic_update_slice(
                    cache.v, blk_v[:, None], (0, pg, 0, 0, 0)
                )
                return dataclasses.replace(cache, k=k, v=v)

            self._copy_page = jax.jit(copy_page)
        else:
            self.cache = init_cache(cfg, slots)
        self._init_row_cache = functools.partial(init_cache, cfg, 1)
        self.tok = np.zeros((slots,), np.int32)
        self.pos = np.zeros((slots,), np.int32)
        self.temp = np.zeros((slots,), np.float32)
        self.tp = np.ones((slots,), np.float32)
        self.active: list[_Request | None] = [None] * slots
        self.produced = [0] * slots
        self.pending: "queue.Queue[_Request]" = queue.Queue()
        self._wake = threading.Event()
        self._stop = False
        self.dead: Exception | None = None  # set when the worker crashes
        self._key = jax.random.key(0)

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

        self._insert = jax.jit(insert)

        def step_chunk(p, cache, tok, pos, key, temp, tp, active):
            cap = cfg.max_cache - 2

            def body(carry, k_step):
                cache, tok, pos, done = carry
                logits, cache = decoder_forward(p, tok[:, None], cache, pos, cfg)
                nxt = sample_token(logits[:, -1, :], k_step, temp, tp)
                nxt = jnp.where(done, jnp.int32(eos_id), nxt)
                done = jnp.logical_or(done, nxt == eos_id)
                pos = jnp.minimum(pos + 1, cap)
                return (cache, nxt, pos, done), nxt

            done0 = jnp.logical_not(active)
            keys = jax.random.split(key, chunk_tokens)
            (cache, tok, pos, _), toks = jax.lax.scan(
                body, (cache, tok, pos, done0), keys
            )
            return toks.T, cache, tok, pos

        self._step_chunk = jax.jit(step_chunk)

        # speculative mode: each of chunk_tokens verify steps advances a
        # row by 1..spec_k+1 tokens (prompt-lookup drafts; output is
        # distribution-identical — models/decoder.py::generate_chunk_spec).
        # Rows diverge freely: positions, cursors, and counts are per-row.
        self.spec_k = int(spec_k)
        self.tok_buf = None
        if self.spec_k > 0:
            self.tok_buf = jnp.zeros((slots, cfg.max_cache), jnp.int32)
            self._spec_key = jax.random.key(0)

            def insert_buf(buf, row_buf, row):
                return jax.lax.dynamic_update_slice(buf, row_buf, (row, 0))

            self._insert_buf = jax.jit(insert_buf)

            def step_spec(p, cache, buf, tok, pos, key, temp, tp, inactive):
                return generate_chunk_spec(
                    p, cache, buf, tok, pos, key, cfg,
                    n_steps=chunk_tokens, draft_k=self.spec_k,
                    gram=int(spec_gram), temperature=temp, top_p=tp,
                    eos_id=eos_id, done0=inactive,
                )

            self._step_spec = jax.jit(step_spec)

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
        out: "queue.Queue[Any]" = queue.Queue()
        limit = self.cfg.max_cache - max_new - 2
        prompt_ids = list(prompt_ids)[-max(limit, 4):]
        # cap generation so positions never reach the ring capacity
        max_new = min(max_new, self.cfg.max_cache - len(prompt_ids) - 2)
        self.pending.put(
            _Request(prompt_ids, float(temperature), float(top_p), max_new, out, seed)
        )
        self._wake.set()
        if self.dead is not None:  # worker died between the check and the put
            self._die(self.dead)
        return out

    def close(self) -> None:
        """Stop the worker; active and pending requests get DONE so no
        caller blocks forever on a dead batcher."""
        self._stop = True
        self._wake.set()
        self._thread.join(timeout=10)
        if self._held is not None:
            self._held.out.put(DONE)
            self._held = None
        for row, req in enumerate(self.active):
            if req is not None:
                self.active[row] = None
                req.out.put(DONE)
        while True:
            try:
                self.pending.get_nowait().out.put(DONE)
            except queue.Empty:
                break

    # -- worker ------------------------------------------------------------

    def _free_slot(self) -> int | None:
        for i, r in enumerate(self.active):
            if r is None:
                return i
        return None

    def _admit(self, req: _Request, row: int) -> bool:
        """Admit ``req`` into slot ``row``. Returns False when the paged
        pool cannot supply the request's pages yet (backpressure: the
        caller holds the request until a finish frees pages)."""
        jnp = self._jnp
        jax = self._jax
        from outline_rag_tpu.models.decoder import sample_token

        t = len(req.prompt_ids)
        pages: list[int] = []
        if self.kv_pages > 0:
            # worst-case pages for prompt + generation (+ the speculative
            # write window), so the row can never starve mid-flight
            span = t + req.max_new + 1 + self.spec_k
            need = min(-(-span // self.page_size), self._maxp)
            if len(self._free_pages) < need:
                return False
            pages = [self._free_pages.pop() for _ in range(need)]
        bucket = next(
            (b for b in self.prompt_buckets if b >= t), self.prompt_buckets[-1]
        )
        padded = req.prompt_ids + [0] * (bucket - t)
        logits, row_cache = self._prefill(
            self.params, jnp.asarray([padded], jnp.int32), self._init_row_cache()
        )
        key = jax.random.key(req.seed or (abs(hash(tuple(req.prompt_ids))) % (2**31)))
        first = sample_token(
            logits[:, t - 1, :],
            key,
            jnp.full((1,), req.temperature, jnp.float32),
            jnp.full((1,), req.top_p, jnp.float32),
        )
        first_id = int(first[0])
        if first_id == self.eos_id or req.max_new < 1:
            if pages:
                self._free_pages.extend(reversed(pages))
            req.out.put(DONE)
            return True
        if self.kv_pages > 0:
            self._row_pages[row] = pages
            row_table = np.zeros((self._maxp,), np.int32)
            row_table[: len(pages)] = pages
            self.cache = self._set_table_row(
                self.cache, jnp.asarray(row_table), jnp.int32(row)
            )
            # copy the prefilled ring KV into the row's prompt pages
            n_prompt = -(-t // self.page_size)
            for i in range(n_prompt):
                self.cache = self._copy_page(
                    self.cache, row_cache[0], row_cache[1],
                    jnp.int32(pages[i]), jnp.int32(i * self.page_size),
                )
        else:
            self.cache = self._insert(self.cache, row_cache, row)
        if self.tok_buf is not None:
            row_buf = np.zeros((1, self.cfg.max_cache), np.int32)
            row_buf[0, :t] = req.prompt_ids
            self.tok_buf = self._insert_buf(
                self.tok_buf, jnp.asarray(row_buf), jnp.int32(row)
            )
        self.tok[row] = first_id
        self.pos[row] = t
        self.temp[row] = req.temperature
        self.tp[row] = req.top_p
        self.active[row] = req
        self.produced[row] = 1
        req.out.put([first_id])
        return True

    def _finish(self, row: int) -> None:
        req = self.active[row]
        self.active[row] = None
        if self.kv_pages > 0 and self._row_pages[row]:
            # reclaim the row's pages; point its table at the scratch
            # page 0 so the (still-running) row's garbage writes can
            # never land in a reallocated page
            self._free_pages.extend(reversed(self._row_pages[row]))
            self._row_pages[row] = []
            self.cache = self._set_table_row(
                self.cache,
                self._jnp.zeros((self._maxp,), self._jnp.int32),
                self._jnp.int32(row),
            )
        if req is not None:
            req.out.put(DONE)

    def _run(self) -> None:
        jnp = self._jnp
        jax = self._jax

        while not self._stop:
            # admit pending requests into free slots (in order; a request
            # the paged pool cannot serve yet is held, blocking later
            # ones, until a finishing request frees pages)
            while True:
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
                try:
                    if not self._admit(req, row):
                        self._held = req
                        break
                except Exception as e:  # surface failures to the caller
                    req.out.put(e)
                    req.out.put(DONE)

            if not any(r is not None for r in self.active):
                self._wake.wait(timeout=0.1)
                self._wake.clear()
                continue

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
                            self._spec_key,
                            jnp.asarray(self.temp),
                            jnp.asarray(self.tp),
                            jnp.asarray(~active_mask),
                        )
                    )
                    toks_np = np.asarray(emitted)  # [slots, steps*(K+1)]
                    counts = np.asarray(cnt)
                else:
                    self._key, sub = jax.random.split(self._key)
                    toks, self.cache, tok_dev, pos_dev = self._step_chunk(
                        self.params,
                        self.cache,
                        jnp.asarray(self.tok),
                        jnp.asarray(self.pos),
                        sub,
                        jnp.asarray(self.temp),
                        jnp.asarray(self.tp),
                        jnp.asarray(active_mask),
                    )
                    toks_np = np.asarray(toks)  # [slots, chunk]
                # np.array copies: np.asarray of a jax array is read-only and
                # the admit path writes rows in place
                self.tok = np.array(tok_dev, np.int32)
                self.pos = np.array(pos_dev, np.int32)
                for row, req in enumerate(self.active):
                    if req is None:
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

    def _die(self, exc: Exception) -> None:
        self.dead = exc
        if self._held is not None:
            self._held.out.put(exc)
            self._held.out.put(DONE)
            self._held = None
        for row, req in enumerate(self.active):
            if req is not None:
                self.active[row] = None
                req.out.put(exc)
                req.out.put(DONE)
        while True:
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
                break
            req.out.put(exc)
            req.out.put(DONE)
