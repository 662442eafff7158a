"""The fused query program: embed -> score -> top-K -> gather -> rerank,
one jitted XLA computation.

Where the reference crosses process/network boundaries four times per query
(embed HTTP call, pgvector SQL, parent fetch SQL, rerank HTTP call —
reference call stack in SURVEY.md section 3.1), this program executes the
entire candidate-selection pipeline in a single device computation over
device-resident state: the corpus matrix, the validity penalty, and the
chunk-token cache. Only the final (rerank_k row ids, scores) — a few
hundred bytes — returns to the host.

Stages (all static shapes):
1. query encoder forward (XLM-R, ``models/encoder.py``) -> [B, H] unit vecs
2. fused score+top-K kernel over the corpus (``ops/topk.py``) -> [B, K]
3. on-device gather of candidate chunk tokens from the token cache
4. cross-encoder forward over B*K (query, chunk) pairs -> [B, K] scores
5. top rerank_k by cross-encoder score (invalid candidates masked)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from outline_rag_tpu.models.encoder import (
    EncoderConfig,
    cast_params,
    colbert_vectors_from_hidden,
    encoder_forward,
    late_interaction_scores,
    sparse_weights_from_hidden,
)
from outline_rag_tpu.models.reranker import reranker_forward
from outline_rag_tpu.ops.topk import NEG, cosine_topk
from outline_rag_tpu.index.store import VectorIndex


def _encode_queries(enc_params, q_ids, q_mask, enc_cfg):
    """One query-encoder forward feeds all three BGE-m3 heads (dense CLS
    pooling, sparse lexical weights, ColBERT token vectors)."""
    q_hidden = encoder_forward(enc_params, q_ids, q_mask, enc_cfg)  # [B,Tq,H]
    cls = q_hidden[:, 0, :].astype(jnp.float32)
    q_emb = cls / jnp.linalg.norm(cls, axis=-1, keepdims=True).clip(1e-9)
    return q_hidden, q_emb


def _rescore_and_rerank(
    enc_params,
    rr_params,
    q_hidden,  # [B, Tq, H] encoder hidden states
    q_ids,
    q_mask,
    vals,  # [B, K] retrieval scores
    idx,  # [B, K] corpus row ids
    cand_ids,  # [B, K, Tc] candidate chunk tokens (CLS-first)
    cand_mask,
    cand_w,  # [B, K, Tc] lexical weights (zeros when unused)
    cand_cvecs=None,  # [B, K, Tc, r] int8 cached ColBERT codes
    cand_cscale=None,  # [B, K, Tc] f32 dequant scales
    colbert_proj=None,  # [Hc, r] query-side projection (models/encoder.py)
    *,
    enc_cfg: EncoderConfig,
    rr_cfg: EncoderConfig,
    rerank_k: int,
    eos_id: int,
    lex_weight: float,
    colbert_weight: float,
):
    """Stages 3b-5 of the fused program, shared between the single-device
    and mesh variants (candidates arrive already gathered)."""
    b = q_ids.shape[0]

    # 3b. hybrid lexical rescoring (BGE-m3 sparse head): candidate dense
    # scores are blended with the lexical-overlap score before the
    # cross-encoder sees them (requires "sparse" head params + cached
    # chunk token weights)
    if lex_weight > 0.0 and "sparse" in enc_params:
        from outline_rag_tpu.models.encoder import lexical_overlap_scores

        q_w = sparse_weights_from_hidden(enc_params, q_hidden, q_ids, q_mask)
        lex = lexical_overlap_scores(q_ids, q_w, cand_ids, cand_w)
        vals = vals + lex_weight * lex

    # 3c. ColBERT late interaction (BGE-m3 multi-vector mode). Two forms:
    # - cached (``colbert_rank`` on the index): candidates' projected int8
    #   token vectors gather by row index from the device cache — no
    #   encoder forward at query time (~free vs the 35% QPS cost of
    #   re-encoding; docs/BENCHMARKS.md). Scores are JL approximations of
    #   the full-dim MaxSim (exact at rank == Hc up to int8 rounding).
    # - recompute: the K candidates re-encode with the full encoder (same
    #   cost class as the cross-encoder stage; exact scores). Runs on the
    #   CLS-first chunk rows, before slot 0 becomes the pair separator.
    if colbert_weight > 0.0 and "colbert" in enc_params:
        k_ = idx.shape[1]
        tc_ = cand_ids.shape[2]
        q_cb = colbert_vectors_from_hidden(enc_params, q_hidden, q_mask)
        if cand_cvecs is not None:
            # f32 score-path matmul: HIGHEST or the MXU truncates the
            # projected query vectors to bf16 and near-tie rankings
            # drift off the oracle (repo precision rule)
            q_cb = jnp.matmul(
                q_cb, colbert_proj.astype(q_cb.dtype),
                precision=jax.lax.Precision.HIGHEST,
            ).astype(jnp.float32)
            c_cb = cand_cvecs.astype(jnp.float32) * cand_cscale[..., None]
        else:
            flat_ids = cand_ids.reshape(b * k_, tc_)
            flat_mask = cand_mask.reshape(b * k_, tc_)
            cand_hidden = encoder_forward(
                enc_params, flat_ids, flat_mask, enc_cfg
            )
            c_cb = colbert_vectors_from_hidden(
                enc_params, cand_hidden, flat_mask
            ).reshape(b, k_, tc_, -1)
        cb = late_interaction_scores(q_cb, q_mask, c_cb)
        vals = vals + colbert_weight * cb

    # chunk rows are stored CLS-first; overwrite slot 0 with the pair
    # separator (EOS EOS p EOS layout of XLM-R second segments)
    cand_ids = cand_ids.at[:, :, 0].set(eos_id)

    # 4. cross-encode (query ++ chunk) pairs
    tq = q_ids.shape[1]
    tc = cand_ids.shape[2]
    k = idx.shape[1]
    pair_ids = jnp.concatenate(
        [jnp.broadcast_to(q_ids[:, None, :], (b, k, tq)), cand_ids], axis=2
    ).reshape(b * k, tq + tc)
    pair_mask = jnp.concatenate(
        [jnp.broadcast_to(q_mask[:, None, :], (b, k, tq)), cand_mask], axis=2
    ).reshape(b * k, tq + tc)
    rr_scores = reranker_forward(rr_params, pair_ids, pair_mask, rr_cfg)
    rr_scores = rr_scores.reshape(b, k)

    # 5. final top rerank_k by cross-encoder score; dead candidates masked
    live = vals > NEG / 2
    rr_scores = jnp.where(live, rr_scores, NEG)
    r_vals, r_pos = jax.lax.top_k(rr_scores, rerank_k)
    r_rows = jnp.take_along_axis(idx, r_pos, axis=1)
    retr_vals = jnp.take_along_axis(vals, r_pos, axis=1)
    return r_rows, r_vals, retr_vals, idx, vals


@functools.partial(
    jax.jit,
    static_argnames=(
        "enc_cfg",
        "rr_cfg",
        "top_k",
        "rerank_k",
        "eos_id",
        "block_n",
        "lex_weight",
        "colbert_weight",
    ),
)
def fused_query(
    enc_params,
    rr_params,
    q_ids: jax.Array,  # [B, Tq] int32
    q_mask: jax.Array,  # [B, Tq] int32
    vectors: jax.Array,  # [N, D]
    scales: jax.Array,  # [N] (int8 mode; unused otherwise)
    penalty: jax.Array,  # [N]
    tok_ids: jax.Array,  # [N, Tc] int32
    tok_mask: jax.Array,  # [N, Tc] int32
    tok_weights: jax.Array | None = None,  # [N, Tc] f32 lexical weights
    tok_cvecs: jax.Array | None = None,  # [N, Tc, r] int8 ColBERT cache
    tok_cscale: jax.Array | None = None,  # [N, Tc] f32
    colbert_proj: jax.Array | None = None,  # [Hc, r]
    residual: jax.Array | None = None,  # [N, D] int8 (int8r rescore plane)
    *,
    enc_cfg: EncoderConfig,
    rr_cfg: EncoderConfig,
    top_k: int,
    rerank_k: int,
    eos_id: int = 2,
    block_n: int = 1024,
    lex_weight: float = 0.0,
    colbert_weight: float = 0.0,
):
    # 1. encode queries
    q_hidden, q_emb = _encode_queries(enc_params, q_ids, q_mask, enc_cfg)

    # 2. fused retrieval top-K
    if vectors.dtype == jnp.int8:
        from outline_rag_tpu.ops.quant import int8_topk, quantize_rows_int8

        qq, qs = quantize_rows_int8(q_emb)
        vals, idx = int8_topk(
            qq, qs, vectors, scales, top_k, penalty, rescore_queries=q_emb,
            rescore_residual=residual,
        )
    else:
        vals, idx = cosine_topk(q_emb, vectors, top_k, penalty, block_n=block_n)

    # 3. gather candidate chunk tokens on device
    cand_ids = jnp.take(tok_ids, idx, axis=0)  # [B, K, Tc]
    cand_mask = jnp.take(tok_mask, idx, axis=0)
    cand_w = (
        jnp.take(tok_weights, idx, axis=0)
        if tok_weights is not None
        else jnp.zeros(cand_ids.shape, jnp.float32)
    )
    cand_cvecs = cand_cscale = None
    if tok_cvecs is not None:
        cand_cvecs = jnp.take(tok_cvecs, idx, axis=0)  # [B, K, Tc, r]
        cand_cscale = jnp.take(tok_cscale, idx, axis=0)

    return _rescore_and_rerank(
        enc_params, rr_params, q_hidden, q_ids, q_mask, vals, idx,
        cand_ids, cand_mask, cand_w, cand_cvecs, cand_cscale, colbert_proj,
        enc_cfg=enc_cfg, rr_cfg=rr_cfg, rerank_k=rerank_k, eos_id=eos_id,
        lex_weight=lex_weight, colbert_weight=colbert_weight,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "enc_cfg",
        "rr_cfg",
        "top_k",
        "rerank_k",
        "eos_id",
        "block_n",
        "lex_weight",
        "colbert_weight",
        "mesh",
    ),
)
def fused_query_mesh(
    enc_params,
    rr_params,
    q_ids: jax.Array,
    q_mask: jax.Array,
    vectors: jax.Array,  # [N, D] row-sharded over mesh "data"
    scales: jax.Array,  # [N] row-sharded
    penalty: jax.Array,  # [N] row-sharded
    tok_ids: jax.Array,  # [N, Tc] row-sharded
    tok_mask: jax.Array,  # [N, Tc] row-sharded
    tok_weights: jax.Array,  # [N, Tc] row-sharded
    tok_cvecs: jax.Array | None = None,  # [N, Tc, r] int8, row-sharded
    tok_cscale: jax.Array | None = None,  # [N, Tc] f32, row-sharded
    colbert_proj: jax.Array | None = None,  # [Hc, r] replicated
    residual: jax.Array | None = None,  # [N, D] int8 (int8r), row-sharded
    *,
    enc_cfg: EncoderConfig,
    rr_cfg: EncoderConfig,
    top_k: int,
    rerank_k: int,
    eos_id: int = 2,
    block_n: int = 1024,
    lex_weight: float = 0.0,
    colbert_weight: float = 0.0,
    mesh=None,
):
    """Mesh variant of :func:`fused_query` — still ONE XLA program.

    Encoder and reranker run replicated (their params are tiny next to the
    corpus); retrieval runs per-shard through ``shard_map`` + the fused
    kernel with an all-gather of only the [B, K] lists and their cached
    candidate tokens (``parallel/query.py::sharded_retrieve_tokens``).
    Per-shard exact top-K + shard-major merge keeps the candidate set and
    tie-breaks bit-identical to the single-device program. This is the
    serving form of the BASELINE 10M-chunk mesh rung (reference seam
    ``app/rag.py:85-87`` at scale).
    """
    from outline_rag_tpu.parallel.query import sharded_retrieve_tokens

    q_hidden, q_emb = _encode_queries(enc_params, q_ids, q_mask, enc_cfg)
    vals, idx, cand_ids, cand_mask, cand_w, cand_cvecs, cand_cscale = (
        sharded_retrieve_tokens(
            q_emb, vectors, scales, penalty, tok_ids, tok_mask, tok_weights,
            top_k, tok_cvecs=tok_cvecs, tok_cscale=tok_cscale,
            residual=residual, mesh=mesh, block_n=block_n,
        )
    )
    return _rescore_and_rerank(
        enc_params, rr_params, q_hidden, q_ids, q_mask, vals, idx,
        cand_ids, cand_mask, cand_w, cand_cvecs, cand_cscale, colbert_proj,
        enc_cfg=enc_cfg, rr_cfg=rr_cfg, rerank_k=rerank_k, eos_id=eos_id,
        lex_weight=lex_weight, colbert_weight=colbert_weight,
    )


class FusedEngine:
    """Host wrapper: tokenization, state snapshot, row-id translation."""

    def __init__(
        self,
        embedder,  # EncoderEmbedder (provides params/cfg/tokenizer)
        reranker,  # CrossEncoderReranker
        index: VectorIndex,
        top_k: int = 12,
        rerank_k: int = 3,
        q_width: int = 64,
        lex_weight: float = 0.0,  # >0 enables hybrid lexical rescoring
        colbert_weight: float = 0.0,  # >0 enables ColBERT late interaction
    ):
        assert index.tokens is not None, "FusedEngine needs a token cache"
        self.embedder = embedder
        self.reranker = reranker
        self.index = index
        self.top_k = top_k
        self.rerank_k = rerank_k
        self.q_width = q_width
        self.lex_weight = lex_weight
        self.colbert_weight = colbert_weight
        # cached-ColBERT mode: the index carries projected int8 token
        # vectors; the query-side projection is the index-pinned matrix
        # (persisted with the snapshot, so it matches ingest by
        # construction rather than by seed-recomputation)
        self._colbert_proj = None
        if (
            colbert_weight > 0.0
            and index.tokens is not None
            and index.tokens.colbert is not None
            # encoders without the colbert head degrade (scoring skips
            # the term, same guard as _rescore_and_rerank) rather than
            # KeyError-ing app startup
            and "colbert" in embedder.params
        ):
            hc = embedder.params["colbert"]["w"].shape[1]
            # index-pinned matrix (persisted in snapshots): provably the
            # same matrix the cached codes were projected with. The
            # source np array is kept for an identity check per dispatch:
            # a snapshot adopt() at startup can replace the index's
            # matrix AFTER engine construction, and scoring with the
            # stale one would silently corrupt cached ColBERT scores.
            self._colbert_proj_src = index.colbert_projection_for(hc)
            self._colbert_proj = jnp.asarray(self._colbert_proj_src)
        # batch sizes served so far: a capacity warm recompiles exactly
        # these variants at the new capacity (index.register_warm_hook).
        # Guarded by a lock: query() adds from serving threads while the
        # index's background warm thread iterates.
        import threading

        self._seen_batches: set[int] = set()
        self._seen_lock = threading.Lock()
        index.register_warm_hook(self.warm)

    def _dispatch(self, tb, state, tok_state, colbert):
        """Run the fused program on an explicit (state, token-cache)
        pair. Callers own the locking discipline: ``query`` passes the
        live snapshot inside a read section; ``warm`` passes throwaway
        next-capacity states that no lock protects."""
        tok = self.embedder.tokenizer
        mesh = self.index.mesh
        ndev = mesh.size if mesh is not None else 1
        common = dict(
            enc_cfg=self.embedder.cfg,
            rr_cfg=self.reranker.cfg,
            top_k=min(self.top_k, state.capacity // ndev),
            rerank_k=min(self.rerank_k, self.top_k),
            eos_id=getattr(tok, "eos_id", 2),
            block_n=self.index.block_n,
            lex_weight=self.lex_weight,
            colbert_weight=self.colbert_weight,
        )
        fn = fused_query if mesh is None else functools.partial(
            fused_query_mesh, mesh=mesh
        )
        use_cb = colbert is not None and self._colbert_proj is not None
        if use_cb and self.index.colbert_proj is not self._colbert_proj_src:
            # the index adopted a snapshot with its own (possibly
            # legacy) matrix after this engine was built: re-pin
            hc = self._colbert_proj.shape[0]
            self._colbert_proj_src = (
                self.index.colbert_proj
                if self.index.colbert_proj is not None
                else self.index.colbert_projection_for(hc)
            )
            self._colbert_proj = jnp.asarray(self._colbert_proj_src)
        return fn(
            self.embedder.params,
            self.reranker.params,
            jnp.asarray(tb.input_ids),
            jnp.asarray(tb.attention_mask),
            state.vectors,
            state.scales,
            state.penalty,
            tok_state.ids,
            tok_state.mask,
            tok_state.weights,
            colbert.codes if use_cb else None,
            colbert.scales if use_cb else None,
            self._colbert_proj if use_cb else None,
            state.residual if state.residual.shape[1] else None,
            **common,
        )

    def warm(self, capacity: int, shard=None, tokens=None) -> None:
        """Compile the fused query program at ``capacity`` for every
        batch size served so far — the index calls this (outside its
        locks) before growing, so the first post-growth query doesn't
        pay a 20-70 s remote compile inside its read section. The
        throwaway ``shard``/``tokens`` come from ``warm_capacity`` and
        match the avals growth will create; built here when absent so
        the hook also works standalone."""
        if shard is None:
            from outline_rag_tpu.index.shard import DeviceShard

            shard = DeviceShard(
                capacity, self.index.dim, self.index.dtype,
                self.index._sharding,
            )
        if tokens is None:
            from outline_rag_tpu.index.tokens import TokenCache

            tokens = TokenCache(
                capacity, self.index.token_width, self.index.token_pad_id,
                self.index._sharding, colbert_rank=self.index.colbert_rank,
            )
        tok = self.embedder.tokenizer
        with self._seen_lock:
            buckets = sorted(self._seen_batches) or [1]
        for b in buckets:
            tb = tok.batch(["warm"] * b, self.q_width, buckets=(self.q_width,))
            out = self._dispatch(tb, shard.state, tokens.state, tokens.colbert)
            jax.block_until_ready(out)

    def query(self, texts: list[str]):
        if not texts:
            return []
        tok = self.embedder.tokenizer
        tb = tok.batch(texts, self.q_width, buckets=(self.q_width,))
        n_real = tb.input_ids.shape[0]
        # Pad the batch to a power-of-two bucket: under concurrent
        # serving the micro-batcher produces many distinct batch sizes,
        # and each would compile its own fused program (20-70 s through
        # the remote compiler — a compile storm on the first busy
        # burst). Buckets bound the variant count at log2(max_batch);
        # the padded rows' scoring is nearly free (the corpus sweep is
        # HBM-bound and shared across queries) and their outputs are
        # sliced off below.
        bucket = 1
        while bucket < n_real:
            bucket *= 2
        if bucket != n_real:
            import numpy as _np

            pad = bucket - n_real
            pad_ids = _np.full(
                (pad, tb.input_ids.shape[1]),
                getattr(tok, "pad_id", 1),
                tb.input_ids.dtype,
            )
            pad_ids[:, 0] = tb.input_ids[0, 0]  # keep one real token:
            # an all-masked row must not NaN the pooled embedding
            pad_mask = _np.zeros((pad, tb.attention_mask.shape[1]),
                                 tb.attention_mask.dtype)
            pad_mask[:, 0] = 1
            tb = type(tb)(
                input_ids=_np.concatenate([tb.input_ids, pad_ids]),
                attention_mask=_np.concatenate([tb.attention_mask, pad_mask]),
            )
        with self._seen_lock:
            self._seen_batches.add(bucket)
        with self.index.read_section():
            # snapshot inside the read section: mutations donate device
            # buffers only after in-flight readers drain, and queries run
            # concurrently with each other (index/store.py concurrency
            # notes)
            state, row_ids, gen = self.index._shard.snapshot()
            r_rows, r_vals, retr_vals, idx, vals = self._dispatch(
                tb, state, self.index.tokens.state, self.index.tokens.colbert
            )
            r_rows = np.asarray(r_rows)[:n_real]
            r_vals = np.asarray(r_vals)[:n_real]
            retr_vals = np.asarray(retr_vals)[:n_real]
            results = []
            for b in range(r_rows.shape[0]):
                row = []
                for j in range(r_rows.shape[1]):
                    if r_vals[b, j] <= NEG / 2:
                        continue
                    row.append(
                        (
                            str(row_ids[r_rows[b, j]]),
                            float(r_vals[b, j]),  # cross-encoder score
                            float(retr_vals[b, j]),  # retrieval (dense/hybrid)
                        )
                    )
                results.append(row)
        return results
