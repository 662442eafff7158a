"""XLM-RoBERTa-family encoder in pure functional JAX.

The BGE-m3 embedding model the reference calls remotely
(``BAAI/bge-m3`` via HTTP, reference ``app/llm_services.py:199-206``,
``app/config.py:29``) is an XLM-RoBERTa-large encoder with CLS pooling and
L2 normalization. This module implements that architecture as an explicit
params-pytree + forward function:

- params are a nested dict (easy to shard with ``NamedSharding``, easy to
  fill from a HF torch checkpoint — see ``models/convert.py``);
- the forward is a single jittable function with static shapes (fixed
  padded sequence buckets, see ``models/tokenizer.py``), attention via one
  fused ``einsum`` chain that XLA maps onto the MXU, bf16 activations with
  f32 layernorm statistics;
- no flax module tree: the model *is* a function, which keeps the fused
  serve program (embed -> score -> rerank, ``engine/query.py``) a single
  XLA computation.

Architecture notes (must match HF ``XLMRobertaModel`` semantics for weight
compatibility): learned absolute position embeddings with the RoBERTa
padding-offset quirk (positions start at ``pad_id + 1``), post-layer-norm
transformer blocks, GELU (tanh-free exact erf variant), token type vocab of
size 1.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 250_002
    hidden: int = 1024
    layers: int = 24
    heads: int = 16
    intermediate: int = 4096
    max_positions: int = 8194  # bge-m3 long-context variant
    pad_id: int = 1
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16  # activation / weight compute dtype
    # "einsum" = fused einsum chain (materializes [B,H,S,S]; fine to ~512),
    # "flash" = Pallas streaming kernel (ops/attention.py; O(S·D) HBM),
    # "auto" = flash on TPU once S*S traffic dominates, einsum otherwise.
    attn_impl: str = "auto"

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads

    @classmethod
    def bge_m3(cls, dtype=jnp.bfloat16) -> "EncoderConfig":
        return cls(dtype=dtype)

    @classmethod
    def tiny(cls, dtype=jnp.float32) -> "EncoderConfig":
        """Small config for tests / CPU parity checks."""
        return cls(
            vocab_size=1024,
            hidden=64,
            layers=2,
            heads=4,
            intermediate=128,
            max_positions=130,
            dtype=dtype,
        )


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _dense_init(key, shape, scale=0.02):
    return scale * jax.random.normal(key, shape, jnp.float32)


def init_encoder_params(key: jax.Array, cfg: EncoderConfig) -> Params:
    keys = iter(jax.random.split(key, 16 + 16 * cfg.layers))
    p: Params = {
        "embed": {
            "word": _dense_init(next(keys), (cfg.vocab_size, cfg.hidden)),
            "position": _dense_init(next(keys), (cfg.max_positions, cfg.hidden)),
            "token_type": _dense_init(next(keys), (1, cfg.hidden)),
            "ln_scale": jnp.ones((cfg.hidden,), jnp.float32),
            "ln_bias": jnp.zeros((cfg.hidden,), jnp.float32),
        },
        "layers": [],
    }
    for _ in range(cfg.layers):
        layer = {
            "attn": {
                "wq": _dense_init(next(keys), (cfg.hidden, cfg.hidden)),
                "bq": jnp.zeros((cfg.hidden,), jnp.float32),
                "wk": _dense_init(next(keys), (cfg.hidden, cfg.hidden)),
                "bk": jnp.zeros((cfg.hidden,), jnp.float32),
                "wv": _dense_init(next(keys), (cfg.hidden, cfg.hidden)),
                "bv": jnp.zeros((cfg.hidden,), jnp.float32),
                "wo": _dense_init(next(keys), (cfg.hidden, cfg.hidden)),
                "bo": jnp.zeros((cfg.hidden,), jnp.float32),
                "ln_scale": jnp.ones((cfg.hidden,), jnp.float32),
                "ln_bias": jnp.zeros((cfg.hidden,), jnp.float32),
            },
            "mlp": {
                "wi": _dense_init(next(keys), (cfg.hidden, cfg.intermediate)),
                "bi": jnp.zeros((cfg.intermediate,), jnp.float32),
                "wo": _dense_init(next(keys), (cfg.intermediate, cfg.hidden)),
                "bo": jnp.zeros((cfg.hidden,), jnp.float32),
                "ln_scale": jnp.ones((cfg.hidden,), jnp.float32),
                "ln_bias": jnp.zeros((cfg.hidden,), jnp.float32),
            },
        }
        p["layers"].append(layer)
    return p


def cast_params(params: Params, dtype) -> Params:
    """Cast weight matrices to ``dtype`` (layernorm params stay f32)."""

    def cast(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name.startswith("ln_") or name.startswith("b"):
            return x
        return x.astype(dtype)

    return jax.tree_util.tree_map_with_path(cast, params)


def quantize_encoder_params(params: Params) -> Params:
    """w8a8 int8 inference for the encoder trunk (opt-in, ENCODER_INT8).

    Each per-layer dense projection (attn wq/wk/wv/wo, mlp wi/wo) becomes
    ``{"q": [..., N, K] int8, "s": [..., N] f32}`` with per-output-channel
    scales — the same layout and strategy as the decoder's w8a8 path
    (``models/decoder.py::quantize_decoder_params``), but aimed at the
    opposite regime: encoder forwards are large-M (B*S tokens), where the
    int8 MXU's ~2x bf16 peak is the win (the decoder's win is halved
    weight HBM at M=8). Embeddings (a gather, not a matmul), layernorms,
    biases, and every task head (pooled CLS norm, sparse, ColBERT,
    classifier — the score paths carrying the repo's f32 HIGHEST parity
    rules) stay in their original dtypes. Apply AFTER
    ``stack_layer_params``/``cast_params``; never cast afterwards.
    """
    from outline_rag_tpu.ops.int8_linear import quantize_linear_weight

    params = stack_layer_params(params)

    # jit + lax.map keep the quantizer's f32 temporaries bounded to one
    # layer's projection (eager vmap materialized the whole stacked
    # leaf's worth — the decoder-side version of this OOM'd a 16 GB
    # chip; see models/decoder.py::quantize_decoder_params)
    _q2d = jax.jit(quantize_linear_weight)
    _q3d = jax.jit(lambda w: jax.lax.map(quantize_linear_weight, w))

    def quant(w):  # [L, K, N] (or [K, N]) -> {"q": [..., N, K], "s": [..., N]}
        q, s = (_q3d if w.ndim == 3 else _q2d)(w)
        return {"q": q, "s": s}

    out = dict(params)
    layers = {grp: dict(params["layers"][grp]) for grp in params["layers"]}
    for grp, names in (
        ("attn", ("wq", "wk", "wv", "wqkv", "wo")),  # wqkv when fused
        ("mlp", ("wi", "wo")),
    ):
        for nm in names:
            if nm in layers[grp]:
                layers[grp][nm] = quant(layers[grp][nm])
    out["layers"] = layers
    return out


def _emm(x: jax.Array, w, dt) -> jax.Array:
    """``x [..., K] @ w`` for dense ``[K, N]`` weights or w8a8 int8
    ``{"q": [N, K], "s": [N]}`` leaves: dynamic per-row (per-token)
    activation quantization -> int8 x int8 MXU dot -> f32 rescale on the
    output (O(M*N), fused by XLA). One path for every M: the encoder
    never runs the decoder's M=8 latency-critical shape."""
    if not isinstance(w, dict):
        return x @ w.astype(dt)
    from outline_rag_tpu.ops.int8_linear import w8a8_matmul

    q, s = w["q"], w["s"]
    lead = x.shape[:-1]
    out = w8a8_matmul(x.reshape(-1, x.shape[-1]), q, s)
    return out.reshape(*lead, q.shape[0]).astype(dt)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _layer_norm(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    out = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (out * scale + bias).astype(x.dtype)


def _use_flash(cfg: EncoderConfig, batch: int, seq_len: int) -> bool:
    if cfg.attn_impl == "flash":
        return True
    if cfg.attn_impl == "einsum":
        return False
    # auto: measured on v5e post tile-skip + 512/1024 mid-range blocks
    # (tools/bench_attention.py, two interleaved windows each): flash
    # wins S=2048 (2.2-3.1x) and S=4096 (1.6x); einsum wins S=1024
    # (~1.5x, consistent); S=512 is a wash. At S=8192 einsum OOMs a 16G
    # chip while flash runs at ~52 TFLOP/s — and fully-masked key tiles
    # are skipped, so short docs in a long bucket cost ~proportionally.
    logits_bytes = batch * cfg.heads * seq_len * seq_len * 4
    return jax.default_backend() == "tpu" and (
        seq_len >= 2048 or logits_bytes > (4 << 30)
    )


def _attention(x, mask_bias, ap, cfg: EncoderConfig):
    b, s, h = x.shape
    nh, hd = cfg.heads, cfg.head_dim
    dt = x.dtype
    if "wqkv" in ap:
        # fused projection (fuse_encoder_params): one [H, 3H] matmul
        qkv = _emm(x, ap["wqkv"], dt) + ap["bqkv"].astype(dt)
        q = qkv[..., :h].reshape(b, s, nh, hd)
        k = qkv[..., h : 2 * h].reshape(b, s, nh, hd)
        v = qkv[..., 2 * h :].reshape(b, s, nh, hd)
    else:
        q = (_emm(x, ap["wq"], dt) + ap["bq"].astype(dt)).reshape(b, s, nh, hd)
        k = (_emm(x, ap["wk"], dt) + ap["bk"].astype(dt)).reshape(b, s, nh, hd)
        v = (_emm(x, ap["wv"], dt) + ap["bv"].astype(dt)).reshape(b, s, nh, hd)
    if _use_flash(cfg, b, s):
        from outline_rag_tpu.ops.attention import flash_attention  # noqa: PLC0415

        ctx = flash_attention(q, k, v, mask_bias[:, 0, 0, :]).reshape(b, s, h)
    else:
        logits = jnp.einsum(
            "bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32
        )
        logits = logits / math.sqrt(hd) + mask_bias  # [B,1,1,S] broadcast
        probs = jax.nn.softmax(logits, axis=-1).astype(dt)
        ctx = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, s, h)
    return _emm(ctx, ap["wo"], dt) + ap["bo"].astype(dt)


def _layer_apply(x, mask_bias, layer, cfg: EncoderConfig):
    dt = x.dtype
    attn_out = _attention(x, mask_bias, layer["attn"], cfg)
    x = _layer_norm(
        x + attn_out,
        layer["attn"]["ln_scale"],
        layer["attn"]["ln_bias"],
        cfg.layer_norm_eps,
    )
    hmid = jax.nn.gelu(
        _emm(x, layer["mlp"]["wi"], dt) + layer["mlp"]["bi"].astype(dt),
        approximate=False,
    )
    mlp_out = _emm(hmid, layer["mlp"]["wo"], dt) + layer["mlp"]["bo"].astype(dt)
    return _layer_norm(
        x + mlp_out,
        layer["mlp"]["ln_scale"],
        layer["mlp"]["ln_bias"],
        cfg.layer_norm_eps,
    )


def fuse_encoder_params(params: Params) -> Params:
    """Fuse each layer's three attention projections into one
    ``wqkv [H, 3H]`` / ``bqkv [3H]`` matmul (the decoder's measured
    launch-count lever, ``fuse_decoder_params``). Output-channel
    concatenation, so the per-channel int8 quantization of the fused
    leaf is bit-identical to quantizing the three separately. Accepts
    the per-layer list form (fuse BEFORE :func:`stack_layer_params`);
    already-fused or stacked trees pass through unchanged."""
    layers = params["layers"]
    if isinstance(layers, dict) or not layers or "wqkv" in layers[0]["attn"]:
        return params
    out_layers = []
    for layer in layers:
        ap = layer["attn"]
        fused_attn = {
            "wqkv": jnp.concatenate([ap["wq"], ap["wk"], ap["wv"]], axis=1),
            "bqkv": jnp.concatenate([ap["bq"], ap["bk"], ap["bv"]]),
            "wo": ap["wo"],
            "bo": ap["bo"],
            "ln_scale": ap["ln_scale"],
            "ln_bias": ap["ln_bias"],
        }
        out_layers.append({"attn": fused_attn, "mlp": layer["mlp"]})
    out = dict(params)
    out["layers"] = out_layers
    return out


def maybe_fuse_encoder_params(params: Params) -> Params:
    """Serving-path QKV-fusion policy, in one place so code and ledger
    cannot drift apart again: the on-chip A/B measured fusion at
    **0.92x** at the ingest shape (64x256, M=16,384 activation rows —
    docs/BENCHMARKS.md "Encoder", measurements/r4/encode_ab.out), so
    the encoder ships with six separate projections per layer and
    113.8 TFLOP/s stands. ``ORT_ENCODER_FUSE=1`` opts back in (the
    M<=4k serve-time query shape is A/B'd separately — see
    tools/bench_encode_ab.py)."""
    import os

    if os.environ.get("ORT_ENCODER_FUSE", "0") == "1":
        return fuse_encoder_params(params)
    return params


def stack_layer_params(params: Params) -> Params:
    """Stack the per-layer param list into one pytree with a leading layer
    dimension, enabling the ``lax.scan`` forward (one traced layer instead
    of L — much faster compiles) and per-layer rematerialization in
    training. Returns a new params dict; the unstacked list form remains
    valid everywhere."""
    layers = params["layers"]
    if isinstance(layers, dict):
        return params
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    out = dict(params)
    out["layers"] = stacked
    return out


def encoder_forward(
    params: Params,
    input_ids: jax.Array,  # [B, S] int32
    attention_mask: jax.Array,  # [B, S] int32/bool, 1 = real token
    cfg: EncoderConfig,
    remat: bool = False,
) -> jax.Array:
    """Returns the final hidden states [B, S, H] (cfg.dtype).

    Accepts either per-layer param lists (python loop; exact tracing) or
    stacked params from :func:`stack_layer_params` (``lax.scan``; with
    ``remat=True`` each layer is rematerialized in the backward pass —
    the ``jax.checkpoint`` memory/FLOPs trade for contrastive training)."""
    dt = cfg.dtype
    mask = attention_mask.astype(jnp.int32)
    # RoBERTa position ids: cumulative count of non-pad tokens + pad_id
    positions = jnp.cumsum(mask, axis=1) * mask + cfg.pad_id
    emb = (
        jnp.take(params["embed"]["word"], input_ids, axis=0)
        + jnp.take(params["embed"]["position"], positions, axis=0)
        + params["embed"]["token_type"][0][None, None, :]
    )
    x = _layer_norm(
        emb.astype(dt),
        params["embed"]["ln_scale"],
        params["embed"]["ln_bias"],
        cfg.layer_norm_eps,
    )
    # additive attention bias: 0 for real tokens, -inf-ish for padding
    mask_bias = (1.0 - mask.astype(jnp.float32))[:, None, None, :] * -1e9

    layers = params["layers"]
    if isinstance(layers, dict):  # stacked -> scan

        def body(carry, layer):
            return _layer_apply(carry, mask_bias, layer, cfg), None

        if remat:
            body = jax.checkpoint(body)
        x, _ = jax.lax.scan(body, x, layers)
        return x

    for layer in layers:
        x = _layer_apply(x, mask_bias, layer, cfg)
    return x


def pooled_embeddings(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: EncoderConfig,
    remat: bool = False,
) -> jax.Array:
    """BGE-m3 dense embedding: CLS hidden state, L2-normalized, f32 [B, H]."""
    hidden = encoder_forward(params, input_ids, attention_mask, cfg, remat=remat)
    cls = hidden[:, 0, :].astype(jnp.float32)
    return cls / jnp.linalg.norm(cls, axis=-1, keepdims=True).clip(1e-9)


def init_sparse_head(key: jax.Array, cfg: EncoderConfig) -> Params:
    """BGE-m3 sparse (lexical-weight) head: Linear(H -> 1) + ReLU over
    token hidden states. Stored under params["sparse"]."""
    return {
        "w": _dense_init(key, (cfg.hidden, 1)),
        "b": jnp.zeros((1,), jnp.float32),
    }


def sparse_weights_from_hidden(
    params: Params,
    hidden: jax.Array,  # [B, S, H]
    input_ids: jax.Array,
    attention_mask: jax.Array,
    min_token_id: int = 3,
) -> jax.Array:
    w = params["sparse"]["w"].astype(hidden.dtype)
    b = params["sparse"]["b"].astype(hidden.dtype)
    raw = jax.nn.relu((hidden @ w)[..., 0] + b[0]).astype(jnp.float32)
    keep = (attention_mask > 0) & (input_ids >= min_token_id)
    return jnp.where(keep, raw, 0.0)


def sparse_token_weights(
    params: Params,
    input_ids: jax.Array,  # [B, S]
    attention_mask: jax.Array,  # [B, S]
    cfg: EncoderConfig,
    min_token_id: int = 3,  # zero out CLS/PAD/EOS specials (XLM-R layout)
) -> jax.Array:
    """Per-token lexical weights [B, S] f32 (BGE-m3 sparse embedding:
    relu(W h_t), special tokens and padding zeroed)."""
    hidden = encoder_forward(params, input_ids, attention_mask, cfg)
    return sparse_weights_from_hidden(
        params, hidden, input_ids, attention_mask, min_token_id
    )


# ---------------------------------------------------------------------------
# BGE-m3 multi-vector (ColBERT) head
# ---------------------------------------------------------------------------


def init_colbert_head(
    key: jax.Array, cfg: EncoderConfig, out_dim: int | None = None
) -> Params:
    """BGE-m3 multi-vector head: Linear(H -> Hc) over token hidden states
    followed by per-token L2 normalization (late-interaction / ColBERT
    mode; the reference's remote BGE-m3 endpoint exposes this as
    ``return_colbert_vecs``). Stored under params["colbert"]."""
    out = out_dim or cfg.hidden
    return {
        "w": _dense_init(key, (cfg.hidden, out)),
        "b": jnp.zeros((out,), jnp.float32),
    }


def colbert_vectors_from_hidden(
    params: Params,
    hidden: jax.Array,  # [B, S, H]
    attention_mask: jax.Array,  # [B, S]
) -> jax.Array:
    """Per-token late-interaction vectors [B, S, Hc] f32, L2-normalized.

    Matches FlagEmbedding's BGEM3 semantics: the CLS position and padding
    are zeroed (so a MaxSim over them contributes the 0 floor, exactly as
    the torch implementation's mask multiply does)."""
    w = params["colbert"]["w"].astype(hidden.dtype)
    b = params["colbert"]["b"].astype(hidden.dtype)
    vecs = (hidden @ w + b).astype(jnp.float32)
    norm = jnp.linalg.norm(vecs, axis=-1, keepdims=True).clip(1e-9)
    vecs = vecs / norm
    keep = (attention_mask > 0).astype(jnp.float32)
    keep = keep.at[:, 0].set(0.0)  # drop CLS (FlagEmbedding [:, 1:])
    return vecs * keep[:, :, None]


def colbert_token_vectors(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: EncoderConfig,
) -> jax.Array:
    hidden = encoder_forward(params, input_ids, attention_mask, cfg)
    return colbert_vectors_from_hidden(params, hidden, attention_mask)


def late_interaction_scores(
    q_vecs: jax.Array,  # [B, Tq, Hc] f32 (zeroed at CLS/pad)
    q_mask: jax.Array,  # [B, Tq]
    c_vecs: jax.Array,  # [B, K, Tc, Hc] f32 (zeroed at CLS/pad)
    precision=None,
) -> jax.Array:
    """ColBERT MaxSim: mean over real query tokens of the best candidate
    token dot product. [B, K] f32.

    One einsum -> [B, K, Tq, Tc] -> max over candidate tokens -> masked
    mean over query tokens; the sim tensor is small (K=12, T<=192) so XLA
    keeps the whole thing fused on device.
    """
    if precision is None and q_vecs.dtype == jnp.float32:
        # the [B,K,Tq,Tc] tensor is tiny (K=12, T<=192); full fp32 MXU
        # passes keep the score exact vs the reference implementation
        precision = jax.lax.Precision.HIGHEST
    sim = jnp.einsum(
        "bqh,bkth->bkqt", q_vecs, c_vecs, preferred_element_type=jnp.float32,
        precision=precision,
    )
    best = jnp.max(sim, axis=-1)  # [B, K, Tq]; zero vecs floor at 0
    q_valid = (q_mask > 0).astype(jnp.float32).at[:, 0].set(0.0)  # drop CLS
    denom = jnp.sum(q_valid, axis=1, keepdims=True).clip(1.0)  # [B, 1]
    return jnp.sum(best * q_valid[:, None, :], axis=-1) / denom


def colbert_projection(dim: int, rank: int) -> jax.Array:
    """Deterministic [dim, rank] projection for the cached-ColBERT path.

    Orthonormal columns (QR of a fixed-seed Gaussian) scaled by
    sqrt(dim/rank) so projected dot products are unbiased estimates of
    the full-dimension dots (JL-style); at rank == dim the map is exactly
    orthogonal and dots are preserved bit-for-bit up to fp rounding.
    Shared between ingest (chunk side) and query (query side) — both
    sides MUST use the same matrix. QR column signs are an
    implementation choice, so Q is sign-normalized (R's diagonal forced
    positive) to be backend-independent; for provable sharing across
    backends the ingest-time matrix is additionally persisted in the
    index snapshot (``VectorIndex.colbert_projection_for``).
    """
    g = jax.random.normal(jax.random.key(0x0C01BE47), (dim, rank), jnp.float32)
    q, r = jnp.linalg.qr(g)
    q = q * jnp.where(jnp.diagonal(r) < 0, -1.0, 1.0)[None, :]
    return q * jnp.sqrt(jnp.float32(dim) / jnp.float32(rank))


def colbert_cache_codes(
    params: Params,
    input_ids: jax.Array,  # [B, S]
    attention_mask: jax.Array,  # [B, S]
    cfg: EncoderConfig,
    proj: jax.Array,  # [Hc, rank] from colbert_projection
) -> tuple[jax.Array, jax.Array]:
    """Projected + int8-quantized per-token ColBERT vectors for the index
    token cache: (codes [B, S, rank] int8, scales [B, S] f32).

    Trades HBM for query-time encoder FLOPs: with the cache, late
    interaction gathers candidate token vectors by row index instead of
    re-encoding B*K candidates per query (engine/fused.py). Zeroed
    positions (CLS/pad) quantize to scale 0, preserving the MaxSim floor.
    """
    vecs = colbert_token_vectors(params, input_ids, attention_mask, cfg)
    # ingest side of the same score path: HIGHEST so cached codes carry
    # the exact projection the query side computes
    p = jnp.matmul(
        vecs, proj, precision=jax.lax.Precision.HIGHEST
    ).astype(jnp.float32)  # [B, S, rank]
    amax = jnp.max(jnp.abs(p), axis=-1)  # [B, S]
    scale = amax / 127.0
    codes = jnp.where(
        scale[..., None] > 0.0,
        jnp.round(p / jnp.maximum(scale, 1e-12)[..., None]),
        0.0,
    )
    return jnp.clip(codes, -127, 127).astype(jnp.int8), scale


def lexical_overlap_scores(
    q_ids: jax.Array,  # [B, Tq]
    q_weights: jax.Array,  # [B, Tq] f32
    cand_ids: jax.Array,  # [B, K, Tc]
    cand_weights: jax.Array,  # [B, K, Tc] f32
) -> jax.Array:
    """BGE-m3 lexical matching score per (query, candidate): for each query
    token present in the candidate, add qw * max-matching cw. [B, K] f32."""
    eq = q_ids[:, None, :, None] == cand_ids[:, :, None, :]  # [B,K,Tq,Tc]
    pair_w = cand_weights[:, :, None, :] * eq.astype(jnp.float32)
    best = jnp.max(pair_w, axis=-1)  # [B, K, Tq]
    return jnp.sum(best * q_weights[:, None, :], axis=-1)


def encode_texts_config(cfg: EncoderConfig):
    """Jitted (params, ids, mask) -> normalized embeddings for ``cfg``."""
    import functools

    @functools.partial(jax.jit, static_argnums=())
    def fn(params, input_ids, attention_mask):
        return pooled_embeddings(params, input_ids, attention_mask, cfg)

    return fn
