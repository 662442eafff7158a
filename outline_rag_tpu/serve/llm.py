"""Chat LLM provider clients.

Per the north star (SURVEY.md section 2b), answer generation stays a
provider call: this module is the seam. ``OpenAICompatProvider`` speaks the
OpenAI-compatible chat-completions protocol (streaming SSE, JSON mode,
``reasoning_content`` thinking passthrough) that the reference's
``ChatSiliconFlow`` uses (reference ``app/llm_services.py:146-173``), with
an answer cache on non-streaming calls (TTL semantics of the reference's
``AsyncRedisCache(ttl=3600)``, reference ``app/llm_services.py:160-173``).
``FakeChatProvider`` is the deterministic test/offline seam.
"""

from __future__ import annotations

import hashlib
import json
import logging
import queue
from typing import AsyncIterator

import httpx

log = logging.getLogger(__name__)


class OpenAICompatProvider:
    def __init__(
        self,
        api_base: str,
        api_key: str,
        bus=None,
        cache_ttl: float = 3600.0,
        transport: httpx.AsyncBaseTransport | None = None,
        timeout: float = 120.0,
    ):
        self.api_base = api_base.rstrip("/")
        self.bus = bus
        self.cache_ttl = cache_ttl
        self._client = httpx.AsyncClient(
            transport=transport,
            timeout=timeout,
            headers={"Authorization": f"Bearer {api_key}"},
        )

    async def aclose(self):
        await self._client.aclose()

    def _cache_key(self, payload: dict) -> str:
        digest = hashlib.sha256(
            json.dumps(payload, sort_keys=True).encode()
        ).hexdigest()
        return f"llm_cache:{digest}"

    async def complete(
        self,
        model: str,
        messages: list[dict],
        temperature: float = 0.0,
        top_p: float | None = None,
        json_mode: bool = False,
        max_tokens: int | None = None,
    ) -> str:
        payload: dict = {
            "model": model,
            "messages": messages,
            "temperature": temperature,
            "stream": False,
        }
        if top_p is not None:
            payload["top_p"] = top_p
        if max_tokens:
            payload["max_tokens"] = max_tokens
        if json_mode:
            payload["response_format"] = {"type": "json_object"}
        key = self._cache_key(payload)
        if self.bus is not None:
            cached = await self.bus.get(key)
            if cached is not None:
                return cached
        resp = await self._client.post(
            f"{self.api_base}/chat/completions", json=payload
        )
        resp.raise_for_status()
        content = resp.json()["choices"][0]["message"]["content"] or ""
        if self.bus is not None:
            await self.bus.set(key, content, ex=self.cache_ttl)
        return content

    async def stream(
        self,
        model: str,
        messages: list[dict],
        temperature: float = 0.7,
        top_p: float = 0.9,
        extra_body: dict | None = None,
    ) -> AsyncIterator[dict]:
        """Yields {"content": str|None, "thinking": str|None, "model": str}
        deltas until the upstream closes."""
        payload = {
            "model": model,
            "messages": messages,
            "temperature": temperature,
            "top_p": top_p,
            "stream": True,
            "stream_options": {"include_usage": False},
        }
        if extra_body:
            payload.update(extra_body)
        async with self._client.stream(
            "POST", f"{self.api_base}/chat/completions", json=payload
        ) as resp:
            resp.raise_for_status()
            async for line in resp.aiter_lines():
                line = line.strip()
                if not line.startswith("data:"):
                    continue
                data = line[5:].strip()
                if data == "[DONE]":
                    return
                try:
                    obj = json.loads(data)
                except json.JSONDecodeError:
                    continue
                choices = obj.get("choices") or []
                if not choices:
                    continue
                delta = choices[0].get("delta") or {}
                yield {
                    "content": delta.get("content"),
                    "thinking": delta.get("reasoning_content")
                    or delta.get("thinking"),
                    "model": obj.get("model", model),
                }


class FakeChatProvider:
    """Deterministic offline provider: the classifier routes by keyword,
    the rewriter echoes, the answer streams a canned summary of its context
    word by word (with a thinking prelude for thinking-capable models)."""

    def __init__(self, thinking: bool = False, answer_words: int = 24,
                 cite: bool = False):
        self.thinking = thinking
        self.answer_words = answer_words
        self.cite = cite  # end the answer with "[source 1]" when context has one
        self.calls: list[dict] = []

    async def complete(
        self, model, messages, temperature=0.0, top_p=None,
        json_mode=False, max_tokens=None,
    ) -> str:
        self.calls.append({"kind": "complete", "model": model, "messages": messages})
        text = messages[-1]["content"] if messages else ""
        if json_mode:
            lower = text.lower()
            if any(w in lower for w in ("story", "poem", "write me")):
                cat = "Creative"
            elif any(w in lower for w in ("act as", "roleplay", "pretend")):
                cat = "Roleplay"
            elif any(w in lower for w in ("hello", "hi!", "thanks", "who are you")):
                cat = "General"
            else:
                cat = "Query"
            return json.dumps({"category": cat})
        # rewriter: echo the last question line
        for line in reversed(text.splitlines()):
            if line.strip():
                return line.strip().removeprefix("Message:").strip()
        return text

    async def stream(
        self, model, messages, temperature=0.7, top_p=0.9, extra_body=None
    ):
        self.calls.append({"kind": "stream", "model": model, "messages": messages})
        if self.thinking:
            for w in ["considering", "the", "context..."]:
                yield {"content": None, "thinking": w + " ", "model": model}
        ctx = ""
        for m in messages:
            if m["role"] == "system":
                ctx = m["content"]
        words = (
            f"Answer based on: {ctx[:160]}" if ctx else "I have no context"
        ).split()
        for w in words[: self.answer_words]:
            yield {"content": w + " ", "thinking": None, "model": model}
        if self.cite and "[source 1]" in ctx:
            yield {"content": "[source 1]", "thinking": None, "model": model}


class LocalChatProvider:
    """On-TPU decoder LM behind the same provider seam.

    The reference can ONLY call a remote API for generation (reference
    ``app/llm_services.py:151``); this provider runs a Llama/Qwen-family
    checkpoint on the chip (``models/decoder.py``), so embed -> retrieve
    -> rerank -> generate all execute locally. Generation is dispatched
    in token *chunks* (device-side ``lax.scan`` with sampling fused in),
    and each chunk's new text streams out as a delta — the same
    {"content", "thinking", "model"} contract as the remote provider.
    """

    def __init__(
        self,
        params,
        cfg,
        tokenizer,  # needs .encode(str)->list[int], .decode(list[int])->str;
        # HF tokenizers (with chat templates) and the test stub both fit
        eos_id: int | None = None,
        chunk_tokens: int = 16,
        max_new_tokens: int = 512,
        model_name: str = "local-tpu",
        prompt_buckets: tuple = (64, 128, 256, 512, 1024, 2048),
        batch_slots: int = 0,  # >1 -> continuous batching across requests
        int8_weights: bool = False,  # halve decode HBM traffic (DECODER_INT8)
        int4_weights: bool = False,  # halve it again: w4a16 grouped (DECODER_INT4)
        spec_k: int = 0,  # >0 -> prompt-lookup speculative decoding
        spec_gram: int = 3,
        kv_pages: int = 0,  # >0 -> paged KV pool for the batcher
        page_size: int = 128,
        prefix_cache: bool = True,  # paged mode: share repeated prompt prefixes
        kv_int8: bool = False,  # paged mode: int8 KV pool
        tp_devices: int = 0,  # >1 -> Megatron-TP decode over a device mesh
        prequantized: bool = False,  # params already stacked+fused+quantized
        # (init_quantized_decoder_params — for models whose float tree
        # exceeds HBM; int8_weights/int4_weights must still say which)
    ):
        import functools

        import jax

        from outline_rag_tpu.models.decoder import (
            cast_decoder_params,
            decoder_forward,
            fuse_decoder_params,
            generate_chunk,
            generate_chunk_spec,
            init_cache,
            quantize_decoder_params,
            quantize_decoder_params_int4,
            stack_decoder_params,
        )

        self.cfg = cfg
        if int8_weights and int4_weights:
            raise ValueError(
                "DECODER_INT8 and DECODER_INT4 are mutually exclusive "
                "(pick one weight quantization)"
            )
        # tensor parallelism (parallel/tp.py): pure GSPMD — params are
        # sharded Megatron-style and every already-jitted program below
        # partitions automatically (XLA inserts the two per-layer
        # all-reduces). Unfused weights are required (the TP layouts
        # shard wq/wk/wv individually). Composes with w8a8 int8 weights
        # (quantized {'q','s'} leaves have their own TP layouts) and
        # with the paged KV pool (the page-walk kernel runs per-device
        # under shard_map on the KvH slice).
        self.mesh = None
        if tp_devices and int(tp_devices) > 1:
            if cfg.heads % int(tp_devices) or cfg.kv_heads % int(tp_devices):
                raise ValueError(
                    f"heads={cfg.heads}/kv_heads={cfg.kv_heads} not "
                    f"divisible by tp_devices={tp_devices}"
                )
            from outline_rag_tpu.models.decoder import _INT8_MODE
            from outline_rag_tpu.parallel.tp import (
                model_mesh,
                shard_decoder_params,
            )

            if int8_weights and _INT8_MODE != "w8a8":
                raise ValueError(
                    "DECODER_TP with DECODER_INT8 requires "
                    "DECODER_INT8_MODE=w8a8 (the in-VMEM dequant kernel "
                    "is a single-device program)"
                )
            if prequantized:
                raise ValueError(
                    "prequantized trees are fused; DECODER_TP shards the "
                    "unfused names — quantize under TP instead"
                )
            self.mesh = model_mesh(int(tp_devices))
            p = stack_decoder_params(cast_decoder_params(params, cfg.dtype))
            if int8_weights:
                p = quantize_decoder_params(p)  # unfused names keep TP layouts
            elif int4_weights:
                p = quantize_decoder_params_int4(p)
            self.params = shard_decoder_params(p, self.mesh)
        elif prequantized:
            if not (int8_weights or int4_weights):
                raise ValueError(
                    "prequantized=True needs int8_weights or int4_weights "
                    "to say which layout the tree carries"
                )
            # already stacked+fused+quantized — casting/re-quantizing a
            # {'q','s'}/{'q4','s4'} tree would clobber the integer leaves
            self.params = params
        else:
            self.params = fuse_decoder_params(
                stack_decoder_params(cast_decoder_params(params, cfg.dtype))
            )
            if int8_weights:
                self.params = quantize_decoder_params(self.params)
            elif int4_weights:
                self.params = quantize_decoder_params_int4(self.params)
        self.tokenizer = tokenizer
        self.eos_id = eos_id if eos_id is not None else getattr(
            tokenizer, "eos_token_id", 2
        )
        self.chunk_tokens = chunk_tokens
        self.max_new_tokens = max_new_tokens
        self.model_name = model_name
        kept = tuple(b for b in prompt_buckets if b <= cfg.max_cache)
        # the ladder must reach max_cache: a prompt longer than the
        # largest bucket would otherwise prefill UNBUCKETED (negative pad
        # -> empty pad list), compiling a fresh 20-70s program per
        # distinct long-prompt length while the decode worker is blocked
        if not kept or kept[-1] < cfg.max_cache:
            kept = kept + (cfg.max_cache,)
        self.prompt_buckets = kept
        if self.mesh is not None:
            from outline_rag_tpu.parallel.tp import shard_decoder_cache

            self._init_cache = lambda: shard_decoder_cache(
                init_cache(cfg, 1), self.mesh
            )
        else:
            self._init_cache = lambda: init_cache(cfg, 1)
        self._prefill = jax.jit(
            lambda p, toks, cache, start: decoder_forward(
                p, toks, cache, start, cfg
            )
        )
        # temperature/top_p are traced scalars (the samplers accept
        # arrays): a user-supplied pair must never trigger a 20-70 s
        # remote recompile, which static args would (ADVICE r2)
        self._chunk = jax.jit(
            functools.partial(
                generate_chunk,
                cfg=cfg,
                n_steps=chunk_tokens,
                eos_id=self.eos_id,
            )
        )
        # speculative decode: chunk_tokens verify steps per dispatch,
        # each advancing 1..spec_k+1 tokens (prompt-lookup drafts —
        # models/decoder.py::generate_chunk_spec). With batch_slots > 1
        # the continuous batcher runs its own speculative step instead
        # (per-row counts); this single-stream program stays unused.
        self.spec_k = int(spec_k)
        self._chunk_spec = None
        if self.spec_k > 0 and not (batch_slots and batch_slots > 1):
            self._chunk_spec = jax.jit(
                functools.partial(
                    generate_chunk_spec,
                    cfg=cfg,
                    n_steps=chunk_tokens,
                    draft_k=self.spec_k,
                    gram=int(spec_gram),
                    eos_id=self.eos_id,
                )
            )
        self._batcher = None
        if batch_slots and batch_slots > 1:
            from outline_rag_tpu.serve.decode_batcher import DecodeBatcher

            self._batcher = DecodeBatcher(
                self.params,
                cfg,
                slots=batch_slots,
                chunk_tokens=chunk_tokens,
                eos_id=self.eos_id,
                prompt_buckets=self.prompt_buckets,
                spec_k=self.spec_k,
                spec_gram=int(spec_gram),
                kv_pages=int(kv_pages),
                page_size=int(page_size),
                prefix_cache=bool(prefix_cache),
                kv_int8=bool(kv_int8),
                mesh=self.mesh,
            )

    def stats(self) -> dict:
        """Decode-path operational stats for /chat/api/metrics."""
        out = {"model": self.model_name}
        if self.mesh is not None:
            out["tp"] = int(self.mesh.size)
        if self._batcher is not None:
            out.update(self._batcher.stats())
        else:
            out["mode"] = "single-stream"
        return out

    # -- prompt rendering -------------------------------------------------

    def _render(self, messages: list[dict]) -> str:
        tok = self.tokenizer
        if hasattr(tok, "apply_chat_template"):
            try:
                return tok.apply_chat_template(
                    messages, tokenize=False, add_generation_prompt=True
                )
            except Exception:  # no template in the checkpoint
                pass
        parts = [f"{m['role']}: {m['content']}" for m in messages]
        return "\n".join(parts) + "\nassistant:"

    def _encode_prompt(self, text: str) -> list[int]:
        ids = self.tokenizer.encode(text)
        if hasattr(ids, "ids"):  # raw tokenizers.Encoding
            ids = ids.ids
        limit = self.cfg.max_cache - self.max_new_tokens - 1
        return list(ids)[-max(limit, 8):]

    # -- blocking generator (runs under asyncio.to_thread) ----------------

    def _generate_blocking(self, messages, temperature, top_p, max_new):
        import jax
        import jax.numpy as jnp
        import numpy as np

        ids = self._encode_prompt(self._render(messages))
        t = len(ids)
        # never generate past the KV ring capacity (callers may pass a
        # max_tokens larger than the cache allows)
        max_new = min(max_new, self.cfg.max_cache - t - 1)
        bucket = next((b for b in self.prompt_buckets if b >= t),
                      self.prompt_buckets[-1])
        padded = ids + [0] * (bucket - t)
        cache = self._init_cache()
        logits, cache = self._prefill(
            self.params,
            jnp.asarray([padded], jnp.int32),
            cache,
            jnp.zeros((1,), jnp.int32),
        )
        # traced scalars: any user-supplied pair reuses the one compiled
        # program (values are data, not part of the jit cache key)
        temp = jnp.float32(temperature or 0.0)
        tp = jnp.float32(top_p if top_p is not None else 1.0)
        key = jax.random.key(abs(hash(tuple(ids))) % (2**31))
        from outline_rag_tpu.models.decoder import sample_token

        if self._chunk_spec is not None:
            yield from self._generate_spec(
                ids, t, padded, cache, logits, key, temp, tp, max_new
            )
            return
        tok = sample_token(logits[:, t - 1, :], key, temp, tp)
        out_ids: list[int] = []
        pos = t
        emitted = ""

        def flush():
            nonlocal emitted
            text = self.tokenizer.decode(out_ids) if out_ids else ""
            # hold back while the tail is an incomplete UTF-8 sequence
            if text and not text.endswith("�") and len(text) > len(emitted):
                piece = text[len(emitted):]
                emitted = text
                return piece
            return None

        if int(tok[0]) == self.eos_id:
            return
        out_ids.append(int(tok[0]))
        piece = flush()
        if piece:
            yield piece

        # Pipelined chunk loop (one chunk of lookahead): the next chunk
        # is dispatched BEFORE this chunk's tokens are fetched, so the
        # host<->device round-trip of the fetch overlaps the next
        # chunk's compute instead of serializing with it (through the
        # remote tunnel the fetch IS the decode bottleneck). Only the
        # dispatch order changes — the device-side chain (cache/tok/key
        # futures) is identical, so streams stay bit-exact with the
        # serial loop. A stop (eos / budget) discards one speculative
        # in-flight chunk: its tokens are never emitted and its cache
        # writes are dropped with the buffers.
        def dispatch():
            nonlocal key, pos, cache, tok
            key, sub = jax.random.split(key)
            toks, cache, tok, _ = self._chunk(
                self.params, cache, tok,
                jnp.full((1,), pos, jnp.int32), sub,
                temperature=temp, top_p=tp,
            )
            pos += self.chunk_tokens
            return toks

        # Gate each dispatch on the serial loop's `len(out_ids) <
        # max_new` as of the tokens already planned: every non-stop
        # chunk comes back with exactly chunk_tokens tokens, so
        # len(out_ids) + pending*chunk_tokens is what len(out_ids)
        # will be when the in-flight work lands.
        pending = 0
        inflight = None
        if len(out_ids) < max_new:
            inflight = dispatch()
            pending = 1
        while inflight is not None:
            nxt = None
            if len(out_ids) + pending * self.chunk_tokens < max_new:
                nxt = dispatch()
                pending += 1
            chunk = [int(x) for x in np.asarray(inflight)[0]]
            pending -= 1
            stop = self.eos_id in chunk
            if stop:
                chunk = chunk[: chunk.index(self.eos_id)]
            room = max_new - len(out_ids)
            if len(chunk) >= room:
                chunk = chunk[:room]
                stop = True
            out_ids.extend(chunk)
            piece = flush()
            if piece:
                yield piece
            inflight = None if stop else nxt

    def _batched_blocking(self, messages, temperature, top_p, max_new):
        """Text-piece generator over the continuous batcher."""
        from outline_rag_tpu.serve.decode_batcher import DONE as B_DONE

        ids = self._encode_prompt(self._render(messages))
        out_q = self._batcher.submit(
            ids,
            float(temperature or 0.0),
            float(top_p if top_p is not None else 1.0),
            max_new,
        )
        out_ids: list[int] = []
        emitted = ""
        finished = False
        try:
            while True:
                try:
                    item = out_q.get(timeout=30.0)
                except queue.Empty:
                    # No progress: either the worker died (surface it) or the
                    # queue is congested / a remote compile is in flight (wait on).
                    if self._batcher.dead is not None:
                        raise RuntimeError(
                            "decode batcher worker died mid-stream"
                        ) from self._batcher.dead
                    continue
                if item is B_DONE:
                    finished = True
                    break
                if isinstance(item, Exception):
                    raise item
                out_ids.extend(item)
                text = self.tokenizer.decode(out_ids)
                if not text.endswith("�") and len(text) > len(emitted):
                    yield text[len(emitted):]
                    emitted = text
        finally:
            if not finished:
                # generator closed early (client disconnected mid-SSE):
                # reclaim the slot instead of decoding for nobody
                self._batcher.cancel(out_q)

    def _generate_spec(
        self, ids, t, padded, cache, logits, key, temp, tp, max_new
    ):
        """Speculative (prompt-lookup) generation loop.

        Same streaming contract as the plain loop; each dispatch runs
        ``chunk_tokens`` verify steps and returns 1..spec_k+1 tokens per
        step. Positional sampler keys make the emitted text
        distribution-identical to plain positional-key decoding
        (``models/decoder.py::generate_chunk_spec``)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from outline_rag_tpu.models.decoder import _sample_one, key_at

        tok_buf = np.zeros((1, self.cfg.max_cache), np.int32)
        tok_buf[0, :t] = ids  # prompt tokens (bucket pad stays unwritten)
        tok_buf = jnp.asarray(tok_buf)
        tok = _sample_one(
            logits[0, t - 1].astype(jnp.float32),
            key_at(key, t), jnp.float32(temp), jnp.float32(tp),
        )[None]
        if int(tok[0]) == self.eos_id:
            return
        out_ids = [int(tok[0])]
        emitted = ""

        def flush():
            nonlocal emitted
            text = self.tokenizer.decode(out_ids) if out_ids else ""
            if text and not text.endswith("�") and len(text) > len(emitted):
                piece = text[len(emitted):]
                emitted = text
                return piece
            return None

        piece = flush()
        if piece:
            yield piece
        pos = jnp.full((1,), t, jnp.int32)

        # Pipelined with one chunk of lookahead — same scheme as the
        # plain loop (see _generate_blocking). The spec stream is a pure
        # function of (seed, prompt) by the positional-key contract, so
        # chunk boundaries — and therefore the occasional extra
        # dispatched-then-discarded chunk — cannot change emitted text.
        # Each dispatch advances >= chunk_tokens tokens (one per verify
        # step) unless the capacity guard froze the row, so gating on
        # that guaranteed minimum keeps the lookahead bounded.
        def dispatch():
            nonlocal cache, tok_buf, tok, pos
            chunk_out, cnt, cache, tok_buf, tok, pos = self._chunk_spec(
                self.params, cache, tok_buf, tok, pos, key,
                temperature=temp, top_p=tp,
            )
            return chunk_out, cnt

        pending = 0
        inflight = None
        if len(out_ids) < max_new:
            inflight = dispatch()
            pending = 1
        while inflight is not None:
            nxt = None
            if len(out_ids) + pending * self.chunk_tokens < max_new:
                nxt = dispatch()
                pending += 1
            chunk_out, cnt = inflight
            pending -= 1
            chunk_np, cnt_np = jax.device_get((chunk_out, cnt))
            n = int(cnt_np[0])
            if n == 0:  # KV ring full (capacity guard froze the row)
                break
            chunk = [int(x) for x in chunk_np[0, :n]]
            stop = self.eos_id in chunk
            if stop:
                chunk = chunk[: chunk.index(self.eos_id)]
            room = max_new - len(out_ids)
            if len(chunk) >= room:
                chunk = chunk[:room]
                stop = True
            out_ids.extend(chunk)
            piece = flush()
            if piece:
                yield piece
            inflight = None if stop else nxt

    def _pieces(self, messages, temperature, top_p, max_new):
        if self._batcher is not None:
            return self._batched_blocking(messages, temperature, top_p, max_new)
        return self._generate_blocking(messages, temperature, top_p, max_new)

    async def complete(
        self, model, messages, temperature=0.0, top_p=None,
        json_mode=False, max_tokens=None,
    ) -> str:
        import asyncio

        if json_mode:
            # no grammar enforcement on a raw decoder: steer with an
            # explicit instruction instead of silently dropping the
            # flag (an unparseable classifier reply falls back to
            # General and skips retrieval entirely — chat.py:83)
            messages = list(messages) + [
                {
                    "role": "user",
                    "content": (
                        "Respond with ONLY a single valid JSON object, "
                        "no prose, no code fences."
                    ),
                }
            ]

        def run():
            return "".join(
                self._pieces(
                    messages, temperature, top_p, max_tokens or self.max_new_tokens
                )
            )

        return await asyncio.to_thread(run)

    async def stream(
        self, model, messages, temperature=0.7, top_p=0.9, extra_body=None
    ):
        import asyncio
        import queue as _q

        q: _q.Queue = _q.Queue()
        DONE = object()

        import threading

        stop = threading.Event()

        def worker():
            try:
                gen = self._pieces(
                    messages, temperature, top_p, self.max_new_tokens
                )
                for piece in gen:
                    if stop.is_set():
                        gen.close()  # fires the cancel path above
                        break
                    q.put(piece)
            finally:
                q.put(DONE)

        task = asyncio.get_running_loop().run_in_executor(None, worker)
        try:
            while True:
                piece = await asyncio.to_thread(q.get)
                if piece is DONE:
                    break
                yield {"content": piece, "thinking": None, "model": self.model_name}
            await task
        finally:
            stop.set()  # aclose() mid-stream: stop the feeding thread

            def _log_worker_exc(fut):
                if not fut.cancelled() and fut.exception() is not None:
                    logging.getLogger(__name__).warning(
                        "decode stream worker failed after client "
                        "disconnect: %r", fut.exception(),
                    )

            task.add_done_callback(_log_worker_exc)
