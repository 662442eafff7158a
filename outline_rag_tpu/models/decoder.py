"""Llama/Qwen-family decoder LM in pure functional JAX — the optional
on-TPU chat provider.

The reference delegates answer generation to a remote OpenAI-compatible
API (reference ``app/llm_services.py:146-173``) and the north star keeps
that seam; this module is the *local* implementation behind it
(``serve/llm.py::LocalChatProvider``), so the whole RAG stack — embed,
retrieve, rerank, generate — can run on one TPU with no external service.

Architecture (HF ``LlamaForCausalLM`` / ``Qwen2ForCausalLM`` semantics for
weight compatibility): RMSNorm (pre-norm), rotary position embeddings
(half-split rotate, configurable theta), grouped-query attention,
SwiGLU MLP, optional attention biases (Qwen2), optional tied embeddings.

TPU shape discipline:
- layers are stacked and scanned (one traced layer — same compile-time
  trick as ``models/encoder.py``);
- the KV cache is a static-capacity ring of ``[L, B, KvH, C, Dh]``
  updated with ``dynamic_update_slice`` — no reallocation, no recompiles
  as generation advances;
- generation runs as a device-side ``lax.scan`` over token chunks
  (sampling included), so the host only dispatches once per chunk —
  essential through a high-latency tunnel and cheap everywhere else.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 32000
    hidden: int = 2048
    layers: int = 16
    heads: int = 16
    kv_heads: int = 8
    intermediate: int = 5632
    head_dim: int | None = None  # default hidden // heads
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    attn_bias: bool = False  # Qwen2 uses q/k/v biases
    tie_embeddings: bool = False
    max_cache: int = 2048  # KV ring capacity
    dtype: Any = jnp.bfloat16

    @property
    def hd(self) -> int:
        return self.head_dim or self.hidden // self.heads

    @classmethod
    def tiny(cls, dtype=jnp.float32) -> "DecoderConfig":
        return cls(
            vocab_size=256,
            hidden=64,
            layers=2,
            heads=4,
            kv_heads=2,
            intermediate=128,
            max_cache=64,
            dtype=dtype,
        )


# ---------------------------------------------------------------------------
# init / conversion helpers
# ---------------------------------------------------------------------------


def _init(key, shape, scale=0.02):
    return scale * jax.random.normal(key, shape, jnp.float32)


def init_decoder_params(key: jax.Array, cfg: DecoderConfig) -> Params:
    keys = iter(jax.random.split(key, 8 + 12 * cfg.layers))
    hd = cfg.hd
    p: Params = {
        "embed": _init(next(keys), (cfg.vocab_size, cfg.hidden)),
        "final_norm": jnp.ones((cfg.hidden,), jnp.float32),
        "layers": [],
    }
    if not cfg.tie_embeddings:
        p["lm_head"] = _init(next(keys), (cfg.hidden, cfg.vocab_size))
    for _ in range(cfg.layers):
        layer = {
            "ln1": jnp.ones((cfg.hidden,), jnp.float32),
            "ln2": jnp.ones((cfg.hidden,), jnp.float32),
            "wq": _init(next(keys), (cfg.hidden, cfg.heads * hd)),
            "wk": _init(next(keys), (cfg.hidden, cfg.kv_heads * hd)),
            "wv": _init(next(keys), (cfg.hidden, cfg.kv_heads * hd)),
            "wo": _init(next(keys), (cfg.heads * hd, cfg.hidden)),
            "wg": _init(next(keys), (cfg.hidden, cfg.intermediate)),
            "wu": _init(next(keys), (cfg.hidden, cfg.intermediate)),
            "wd": _init(next(keys), (cfg.intermediate, cfg.hidden)),
        }
        if cfg.attn_bias:
            layer["bq"] = jnp.zeros((cfg.heads * hd,), jnp.float32)
            layer["bk"] = jnp.zeros((cfg.kv_heads * hd,), jnp.float32)
            layer["bv"] = jnp.zeros((cfg.kv_heads * hd,), jnp.float32)
        p["layers"].append(layer)
    return p


def stack_decoder_params(params: Params) -> Params:
    layers = params["layers"]
    if isinstance(layers, dict):
        return params
    out = dict(params)
    out["layers"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    return out


def cast_decoder_params(params: Params, dtype) -> Params:
    def cast(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in ("ln1", "ln2", "final_norm") or name.startswith("b"):
            return x
        return x.astype(dtype)

    return jax.tree_util.tree_map_with_path(cast, params)


_INT8_WEIGHT_NAMES = ("wq", "wk", "wv", "wo", "wg", "wu", "wd")


def quantize_decoder_params(params: Params) -> Params:
    """int8-quantize the decode-bandwidth-dominant weights.

    Every projection matrix (attention + MLP + lm_head) becomes
    ``{"q": [N, K] int8, "s": [N] f32}`` with per-output-channel scales;
    the forward dequantizes tile-by-tile in VMEM (``ops/int8_linear.py``),
    so decode — which reads every weight once per token — moves half the
    HBM bytes. Norm scales, biases, and the embedding table (a gather,
    not a matmul) stay as-is. Apply AFTER ``stack_decoder_params`` /
    ``cast_decoder_params``; quantized params must not be cast again.
    """
    from outline_rag_tpu.ops.int8_linear import quantize_linear_weight

    params = stack_decoder_params(params)

    # same HBM discipline as the int4 quantizer below: jit fuses the
    # abs/max/round chain and lax.map bounds the f32 temporaries to one
    # layer's projection (eager vmap materialized them for the whole
    # stacked [L, K, N] leaf at once)
    _q2d = jax.jit(quantize_linear_weight)
    _q3d = jax.jit(lambda w: jax.lax.map(quantize_linear_weight, w))

    def quant(w):  # [K, N] (or [L, K, N] stacked) -> {"q", "s"}
        q, s = (_q3d if w.ndim == 3 else _q2d)(w)
        return {"q": q, "s": s}

    out = dict(params)
    if "lm_head" in params:
        out["lm_head"] = quant(params["lm_head"])
    layers = dict(params["layers"])
    for name in _INT8_WEIGHT_NAMES + ("wqkv", "wgu"):
        if name in layers:
            layers[name] = quant(layers[name])
    out["layers"] = layers
    return out


def _quant_one_int4(w, group_size=128):
    """[K, N] float -> ({"q4": [N, K//2] packed uint8}, {"s4": [N, G]}).

    THE int4 numerics+packing contract (see
    :func:`quantize_decoder_params_int4`); both the full-tree quantizer
    and the layer-streamed builder route here. Block-pair layout with
    asymmetric nibble encoding — packed lane ``128c + j`` holds element
    ``256c + j`` as the BIASED value ``v + 8`` in the low nibble and
    element ``256c + 128 + j`` two's-complement in the high nibble
    (ops/int4_linear.py explains why Mosaic's vector-op support forces
    exactly this shape). K not divisible by 256 degenerates to one
    K/2-wide pair block (kernel-ineligible shapes; the XLA path
    handles them)."""
    k = w.shape[0]
    if k % 2:
        raise ValueError(f"int4 packing needs an even K, got {k}")
    gsz = group_size if k % group_size == 0 else k
    wt = jnp.asarray(w, jnp.float32).T  # [N, K]
    n = wt.shape[0]
    wg = wt.reshape(n, k // gsz, gsz)
    amax = jnp.max(jnp.abs(wg), axis=2, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-12)
    q = jnp.clip(jnp.round(wg / scale), -8, 7)
    q = q.reshape(n, k).astype(jnp.int32)
    pw = 128 if k % 256 == 0 else k // 2  # pair-block width
    qb = q.reshape(n, k // (2 * pw), 2, pw)
    lo = (qb[:, :, 0, :] + 8) & 15  # biased low nibble
    hi = qb[:, :, 1, :] & 15  # two's-complement high nibble
    packed = (lo | (hi << 4)).reshape(n, k // 2)
    return (
        packed.astype(jnp.uint8),
        scale[:, :, 0].astype(jnp.float32),
    )


def quantize_decoder_params_int4(
    params: Params, group_size: int = 128
) -> Params:
    """int4-quantize the decode-bandwidth-dominant weights (w4a16).

    Every projection matrix becomes ``{"q4": [N, K//2] uint8
    nibble-packed, "s4": [N, K//gsz] f32}`` with symmetric group-wise
    scales along the contraction dim (GPTQ/AWQ-style groups, default
    128); byte ``j`` packs elements ``2j`` (low nibble) and ``2j+1``
    (high nibble), two's-complement in [-8, 7]. Decode is
    weight-HBM-bound, so streaming 4-bit weights halves the bytes of
    the int8 path again; the forward unpacks + upcasts groups to the
    activation dtype and runs a group-batched MXU dot (``_mm``).
    Packed uint8 rather than ``jnp.int4`` deliberately: sub-byte
    arrays crossing jit boundaries break this TPU backend (the
    producing executable reports its int4 output layout with
    ``sub_byte_element_size_in_bits=0``, every consumer compiles
    expecting 4, and the dispatch-time relayout dies in a
    ``RecursionError`` — and even eager scalar int4 ops fail the same
    way), while bytes-on-HBM are identical. Per-channel int8 scales
    can't survive 4-bit rounding — group-wise keeps each 128-wide
    block's dynamic range local, which is what makes w4 usable. Same
    application order as :func:`quantize_decoder_params` (after
    stack/cast/fuse; never cast again)."""
    params = stack_decoder_params(params)
    quant_one = functools.partial(_quant_one_int4, group_size=group_size)

    # One-time setup, but it must stay within HBM: eager full-tensor
    # math over the stacked [L, K, N] leaves materializes multi-GB f32
    # temporaries per op (the fused MLP leaf alone OOM'd the 16 GB chip
    # quantizing a 1.1B tree). jit fuses the chain and lax.map bounds
    # the live temporaries to ONE layer's projection at a time.
    @functools.partial(jax.jit, static_argnums=1)
    def _quant2d(w, _gsz_key):
        return quant_one(w)

    @functools.partial(jax.jit, static_argnums=1)
    def _quant3d(w, _gsz_key):
        return jax.lax.map(quant_one, w)

    def quant(w):
        key = (w.shape[-2], group_size)
        q, s = (_quant3d if w.ndim == 3 else _quant2d)(w, key)
        return {"q4": q, "s4": s}

    out = dict(params)
    if "lm_head" in params:
        out["lm_head"] = quant(params["lm_head"])
    layers = dict(params["layers"])
    for name in _INT8_WEIGHT_NAMES + ("wqkv", "wgu"):
        if name in layers:
            layers[name] = quant(layers[name])
    out["layers"] = layers
    return out


def init_quantized_decoder_params(
    key: jax.Array,
    cfg: DecoderConfig,
    *,
    mode: str = "int4",
    group_size: int = 128,
) -> Params:
    """Layer-streamed random init -> quantize, for models whose
    full-precision tree exceeds HBM.

    A 7B-class config on a 16 GB v5e: the bf16 tree alone is ~13.4 GB
    and the f32 init tree ~27 GB, so ``init_decoder_params`` +
    ``quantize_decoder_params*`` cannot run — but the int4 tree is
    ~3.4 GB (int8 ~6.7 GB) and fits with room for the KV pool. This
    builds one layer at a time (init f32 -> fuse -> quantize -> drop
    the float leaves) and stacks the quantized leaves at the end, so
    peak HBM is the quantized tree + one float layer + the stack copy.
    Output layout matches ``fuse_decoder_params`` +
    ``quantize_decoder_params{_int4}`` (fused wqkv/wgu, stacked [L,...]
    leaves); randomness is NOT key-stream-compatible with
    ``init_decoder_params`` (irrelevant for a random init)."""
    if mode not in ("int4", "int8"):
        raise ValueError(f"mode must be int4|int8, got {mode!r}")
    from outline_rag_tpu.ops.int8_linear import quantize_linear_weight

    if mode == "int4":
        _q2d = jax.jit(
            functools.partial(_quant_one_int4, group_size=group_size)
        )
        names = ("q4", "s4")
    else:
        _q2d = jax.jit(quantize_linear_weight)
        names = ("q", "s")

    def quant(w):
        q, s = _q2d(w)
        return {names[0]: q, names[1]: s}

    hd = cfg.hd
    kroot, key = jax.random.split(key)
    p: Params = {
        "embed": _init(kroot, (cfg.vocab_size, cfg.hidden)).astype(cfg.dtype),
        "final_norm": jnp.ones((cfg.hidden,), jnp.float32),
    }
    if not cfg.tie_embeddings:
        kroot, key = jax.random.split(key)
        p["lm_head"] = quant(
            _init(kroot, (cfg.hidden, cfg.vocab_size)).astype(cfg.dtype)
        )
    per_layer: list[Params] = []
    for li in range(cfg.layers):
        lkey = jax.random.fold_in(key, li)
        ks = iter(jax.random.split(lkey, 8))
        wq = _init(next(ks), (cfg.hidden, cfg.heads * hd))
        wk = _init(next(ks), (cfg.hidden, cfg.kv_heads * hd))
        wv = _init(next(ks), (cfg.hidden, cfg.kv_heads * hd))
        layer: Params = {
            "ln1": jnp.ones((cfg.hidden,), jnp.float32),
            "ln2": jnp.ones((cfg.hidden,), jnp.float32),
            "wqkv": quant(
                jnp.concatenate([wq, wk, wv], axis=-1).astype(cfg.dtype)
            ),
            "wo": quant(
                _init(next(ks), (cfg.heads * hd, cfg.hidden)).astype(cfg.dtype)
            ),
            "wgu": quant(
                jnp.concatenate(
                    [
                        _init(next(ks), (cfg.hidden, cfg.intermediate)),
                        _init(next(ks), (cfg.hidden, cfg.intermediate)),
                    ],
                    axis=-1,
                ).astype(cfg.dtype)
            ),
            "wd": quant(
                _init(next(ks), (cfg.intermediate, cfg.hidden)).astype(
                    cfg.dtype
                )
            ),
        }
        if cfg.attn_bias:
            layer["bqkv"] = jnp.zeros(
                ((cfg.heads + 2 * cfg.kv_heads) * hd,), jnp.float32
            )
        jax.block_until_ready(layer)  # bound the float transients to one layer
        per_layer.append(layer)
    p["layers"] = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *per_layer
    )
    return p


def _pick_block_n(n: int) -> int | None:
    for b in (512, 256, 128, 64, 32, 16, 8):
        if n % b == 0:
            return b
    return None


import os as _os

# int8 matmul strategy (measured end-to-end in tools/bench_decode.py):
#   "w8a8"  — dynamic per-row activation quantization + int8 x int8 MXU dot
#             + f32 output rescale (pure XLA; weights stream from HBM as
#             int8, dequant cost is O(M*N) on the output, not O(N*K)).
#   "kernel" — bf16 activations, per-tile in-VMEM weight dequant
#             (ops/int8_linear.py Pallas kernel).
_INT8_MODE = _os.environ.get("DECODER_INT8_MODE", "w8a8")

# int4 decode-path strategy: "xla" = grouped-dot with XLA-materialized
# nibble unpack (slow — kept as the oracle and the CPU path), "kernel" =
# Pallas w4a16 tile dequant (float decode, exact activation numerics),
# "w4a8" (default) = Pallas int8-dot kernel with per-row int8 activation
# quantization — the same activation treatment as the production int8
# w8a8 mode, and ~5x the w4a16 kernel's effective weight bandwidth
# (ops/int4_linear.py module docstring). TPU only; shapes must block on
# 128s — non-qualifying shapes fall back to "xla" silently.
_INT4_MODE = _os.environ.get("DECODER_INT4_MODE", "w4a8")


def _unpack_int4(p: jax.Array) -> jax.Array:
    """[..., Kp] uint8 nibble-packed -> [..., 2*Kp] int8 in [-8, 7].

    Inverse of _quant_one_int4's block-pair layout: packed lane
    ``128c + j`` holds element ``256c + j`` (low nibble, BIASED by +8)
    and element ``256c + 128 + j`` (high nibble, two's complement)."""
    kp = p.shape[-1]
    pw = 128 if kp % 128 == 0 else kp
    lo = (p & 15).astype(jnp.int8) - 8  # debias
    hi = (p >> 4).astype(jnp.int8)
    hi = hi - ((hi & 8) << 1)  # sign-extend the nibble
    st = jnp.stack(
        [
            lo.reshape(*p.shape[:-1], kp // pw, pw),
            hi.reshape(*p.shape[:-1], kp // pw, pw),
        ],
        axis=-2,
    )
    return st.reshape(*p.shape[:-1], kp * 2)


def _mm_int4(x: jax.Array, q4: jax.Array, s4: jax.Array, dt) -> jax.Array:
    """x @ dequant(q4) with group-wise scales (w4a16).

    q4: [N, K//2] nibble-packed uint8 (transposed like the int8
    layout); s4: [N, G] f32, G groups along K. Decode-size calls
    (small M) contract each group separately — a G-batched MXU dot on
    unpacked+upcast weights — then apply the per-(N, group) scale on
    the [G, M, N] partials, so the weight's HBM stream is the 4-bit
    packed bytes. Prefill (large M) amortizes one full dequant
    instead."""
    n, kp = q4.shape
    k = kp * 2
    g = s4.shape[-1]
    gsz = k // g
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k)
    if (
        m <= 32
        and _INT4_MODE in ("kernel", "w4a8")
        and jax.default_backend() == "tpu"
        and k % 256 == 0
        and gsz % 128 == 0
        and n % 128 == 0
        and (k // 2) % 128 == 0
    ):
        # decode-size M: the Pallas kernels stream the packed 4-bit
        # bytes from HBM and dequantize tiles in VMEM — the XLA grouped
        # path below materializes the whole unpacked weight per step
        # (measured 46 tok/s vs bf16's 248, BENCHMARKS.md). "w4a8"
        # decodes nibbles straight to int8 MXU operands (two vector ops
        # per byte) with w8a8-style per-row activation quantization;
        # "kernel" keeps the float decode (exact w4a16 numerics).
        if _INT4_MODE == "w4a8":
            from outline_rag_tpu.ops.int4_linear import w4a8_matmul

            out = w4a8_matmul(x2, q4, s4)
        else:
            from outline_rag_tpu.ops.int4_linear import w4a16_matmul

            out = w4a16_matmul(x2, q4, s4, dt)
        return out.reshape(*lead, n).astype(dt)
    if m <= 256:
        # operands in the model dtype: bf16 MXU in production, f32 when
        # the model runs f32 (keeps this path equal to the prefill-path
        # dequant); int4 values are exact in either
        lhs = x2.reshape(m, g, gsz).astype(dt)
        rhs = _unpack_int4(q4).reshape(n, g, gsz).astype(dt)
        # [G, M, N] partial products, one batch entry per scale group
        raw = jax.lax.dot_general(
            lhs, rhs,
            dimension_numbers=(((2,), (2,)), ((1,), (1,))),
            preferred_element_type=jnp.float32,
        )
        out = jnp.sum(raw * s4.T[:, None, :], axis=0)
        return out.reshape(*lead, n).astype(dt)
    wd = (
        _unpack_int4(q4).reshape(n, g, gsz).astype(dt)
        * s4.astype(dt)[:, :, None]
    ).reshape(n, k)
    return x @ wd.T


def _mm(x: jax.Array, w, dt) -> jax.Array:
    """x @ w for dense weights ([K, N]) or int8 ``{"q": [N,K], "s": [N]}``.

    int8 path: the default w8a8 mode serves EVERY M through the shared
    ``w8a8_matmul`` (decode steps and prefill alike — see the comment
    below). The non-w8a8 strategies are the measured-and-kept
    alternatives: the Pallas ``int8_linear`` at small M, and a
    dequantize-to-bf16 (w8a16) XLA fallback at large M.
    """
    if not isinstance(w, dict):
        return x @ w.astype(dt)
    if "q4" in w:
        return _mm_int4(x, w["q4"], w["s4"], dt)
    q, s = w["q"], w["s"]
    lead = x.shape[:-1]
    k = x.shape[-1]
    m = 1
    for d in lead:
        m *= d
    # w8a8 serves EVERY M: at decode (M=8) the win is halved weight HBM;
    # at prefill (M up to the 2048 prompt bucket) it is the int8 MXU's
    # ~2x bf16 peak — the dequant-to-bf16 fallback below paid O(N*K) VPU
    # dequant AND ran the matmul at half throughput. Activation scales
    # are per ROW (per token), so a token's quantization never depends
    # on its neighbors — prefill stays chunk-boundary-independent and
    # the paged prefix-cache exactness invariant (CLAUDE.md: warm ==
    # cold under the same chunked-prefill program) is preserved.
    if _INT8_MODE == "w8a8":
        from outline_rag_tpu.ops.int8_linear import w8a8_matmul

        out = w8a8_matmul(x.reshape(m, k), q, s)
        return out.reshape(*lead, q.shape[0]).astype(dt)
    block_n = _pick_block_n(q.shape[0])
    if block_n is not None and m <= 256:
        from outline_rag_tpu.ops.int8_linear import int8_linear

        x2 = x.reshape(m, k)
        pad = (-m) % 8
        if pad:
            x2 = jnp.concatenate(
                [x2, jnp.zeros((pad, k), x2.dtype)], axis=0
            )
        out = int8_linear(x2, q, s, block_n=block_n)
        if pad:
            out = out[:m]
        return out.reshape(*lead, q.shape[0]).astype(dt)
    wd = (q.astype(dt) * s.astype(dt)[:, None]).T  # [K, N]
    return x @ wd


# ---------------------------------------------------------------------------
# forward pieces
# ---------------------------------------------------------------------------


def _rms_norm(x, scale, eps):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * scale).astype(x.dtype)


def _rope(x, positions, theta):
    """Half-split rotary embedding (HF llama rotate_half convention).

    x: [B, T, H, Dh]; positions: [B, T] int32.
    """
    b, t, h, d = x.shape
    half = d // 2
    freqs = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    ang = positions.astype(jnp.float32)[:, :, None] * freqs[None, None, :]
    cos = jnp.cos(ang)[:, :, None, :]  # [B, T, 1, half]
    sin = jnp.sin(ang)[:, :, None, :]
    x1, x2 = x[..., :half].astype(jnp.float32), x[..., half:].astype(jnp.float32)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def _qkv(h, layer, positions, cfg: DecoderConfig):
    """Q/K/V projections for T new tokens from the ln1-normed input.

    Returns (q [B,T,H,Dh] rotated, k [B,T,KvH,Dh] rotated, v [B,T,KvH,Dh]).
    When the layer carries a fused ``wqkv`` (``fuse_decoder_params``), the
    three projections run as ONE matmul — decode at M=1 is launch- and
    tile-efficiency-bound, so fewer, wider matmuls win.
    """
    dt = h.dtype
    b, t, _ = h.shape
    nq, nkv = cfg.heads * cfg.hd, cfg.kv_heads * cfg.hd
    if "wqkv" in layer:
        qkv = _mm(h, layer["wqkv"], dt)
        if cfg.attn_bias:
            qkv = qkv + layer["bqkv"].astype(dt)
        q = qkv[..., :nq]
        k = qkv[..., nq : nq + nkv]
        v = qkv[..., nq + nkv :]
    else:
        q = _mm(h, layer["wq"], dt)
        k = _mm(h, layer["wk"], dt)
        v = _mm(h, layer["wv"], dt)
        if cfg.attn_bias:
            q = q + layer["bq"].astype(dt)
            k = k + layer["bk"].astype(dt)
            v = v + layer["bv"].astype(dt)
    q = _rope(q.reshape(b, t, cfg.heads, cfg.hd), positions, cfg.rope_theta)
    k = _rope(k.reshape(b, t, cfg.kv_heads, cfg.hd), positions, cfg.rope_theta)
    return q, k, v.reshape(b, t, cfg.kv_heads, cfg.hd)


def _attn_out(q, cache_kv, mask_bias, layer, cfg: DecoderConfig):
    """GQA attention of q [B,T,H,Dh] against the KV cache, + output proj."""
    dt = q.dtype
    hd, nh, nkv = cfg.hd, cfg.heads, cfg.kv_heads
    b, t = q.shape[0], q.shape[1]
    k_cache, v_cache = cache_kv  # [B, KvH, C, Dh]
    group = nh // nkv
    qg = q.reshape(b, t, nkv, group, hd)
    logits = jnp.einsum(
        "btngd,bncd->btngc", qg, k_cache, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(hd))
    logits = logits + mask_bias[:, :, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(dt)
    ctx = jnp.einsum("btngc,bncd->btngd", probs, v_cache)
    ctx = ctx.reshape(b, t, nh * hd)
    return _mm(ctx, layer["wo"], dt)


def _mlp(h, layer, cfg: DecoderConfig):
    """SwiGLU MLP; fused ``wgu`` runs gate+up as one matmul."""
    dt = h.dtype
    if "wgu" in layer:
        gu = _mm(h, layer["wgu"], dt)
        gate = gu[..., : cfg.intermediate]
        up = gu[..., cfg.intermediate :]
    else:
        gate = _mm(h, layer["wg"], dt)
        up = _mm(h, layer["wu"], dt)
    return _mm(jax.nn.silu(gate) * up, layer["wd"], dt)


def fuse_decoder_params(params: Params) -> Params:
    """Concatenate per-layer QKV (and gate/up) along the output axis so
    decode runs 4 matmuls per layer instead of 7. Column-independence of
    the contraction makes the fused results bit-identical; per-output-
    channel int8 scales survive fusion the same way (quantize after).
    Not applied under tensor parallelism (``parallel/tp.py`` shards the
    unfused names)."""
    params = stack_decoder_params(params)
    out = dict(params)
    layers = dict(params["layers"])
    layers["wqkv"] = jnp.concatenate(
        [layers.pop("wq"), layers.pop("wk"), layers.pop("wv")], axis=-1
    )
    layers["wgu"] = jnp.concatenate(
        [layers.pop("wg"), layers.pop("wu")], axis=-1
    )
    if "bq" in layers:
        layers["bqkv"] = jnp.concatenate(
            [layers.pop("bq"), layers.pop("bk"), layers.pop("bv")], axis=-1
        )
    out["layers"] = layers
    return out


def init_cache(cfg: DecoderConfig, batch: int) -> tuple[jax.Array, jax.Array]:
    """KV ring: (k, v), each [L, B, KvH, C, Dh] in cfg.dtype."""
    shape = (cfg.layers, batch, cfg.kv_heads, cfg.max_cache, cfg.hd)
    return jnp.zeros(shape, cfg.dtype), jnp.zeros(shape, cfg.dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKV:
    """Paged KV cache: a shared pool of fixed-size pages + per-row page
    tables (``ops/paged_attention.py``). HBM is allocated by actual
    sequence length instead of ``batch x max_cache`` — the batcher's
    allocator (``serve/decode_batcher.py``) grants pages per request and
    reclaims them at finish. Page 0 is reserved as the scratch target of
    inactive rows (their forwards still write; the scratch page absorbs
    the garbage so reclaimed pages are never corrupted).

    ``k``/``v``: [L, P, KvH, Dh, page] (position minor — the page axis
    is a full 128-lane tile, so the pool is lane-padding-free for any
    head dim); ``table``: [B, MAXP] int32 —
    row b's absolute positions [i*page, (i+1)*page) live in pool page
    ``table[b, i]``. Effective per-row capacity is MAXP * page, which
    callers must keep <= cfg.max_cache (the position-guard contract of
    the generation loops).

    ``kv_dtype="int8"`` stores the pool quantized (symmetric per-token
    per-head int8; ``k_scale``/``v_scale``: [L, P, KvH, page] f32) —
    half the KV HBM of bf16, so twice the live context per chip, with
    the page-walk kernel dequantizing in VMEM.

    ``mesh`` (static pytree metadata) marks a tensor-parallel pool: the
    pools shard on their KvH axis (``parallel/tp.py`` Megatron layout,
    same as the ring cache) and the forward routes attention through the
    shard_map page walk (``ops/paged_attention.py``); page tables are
    replicated host state either way.
    """

    k: jax.Array
    v: jax.Array
    table: jax.Array
    k_scale: jax.Array | None = None
    v_scale: jax.Array | None = None
    mesh: jax.sharding.Mesh | None = dataclasses.field(
        default=None, metadata=dict(static=True)
    )

    @property
    def page(self) -> int:
        return self.k.shape[4]


def init_paged_cache(
    cfg: DecoderConfig,
    batch: int,
    pages: int,
    page_size: int = 128,
    kv_dtype: str | None = None,  # "int8" -> quantized pool
    mesh: "jax.sharding.Mesh | None" = None,  # TP: shard pools on KvH
) -> PagedKV:
    if cfg.max_cache % page_size:
        # a remainder would silently shrink per-row capacity below
        # max_cache while every position guard still assumes max_cache —
        # tail tokens would write to scratch and attention would run
        # with recent KV missing
        raise ValueError(
            f"max_cache={cfg.max_cache} not divisible by "
            f"page_size={page_size}"
        )
    maxp = cfg.max_cache // page_size
    # position-MINOR page slabs ([.., Dh, page], page = 128 lanes): the
    # pool is lane-padding-free for any head dim. With position major
    # (.., page, Dh) a Dh=64 model pads 64->128 lanes: the pool doubles
    # in HBM and XLA relayout-copies it around the per-layer scan
    # (ops/paged_attention.py module docstring has the measurement)
    shape = (cfg.layers, pages, cfg.kv_heads, cfg.hd, page_size)
    scale_shape = (cfg.layers, pages, cfg.kv_heads, page_size)
    if mesh is not None and cfg.kv_heads % mesh.size:
        raise ValueError(
            f"kv_heads={cfg.kv_heads} not divisible by TP mesh size "
            f"{mesh.size}"
        )

    def place(x, kvh_axis):
        if mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec

        spec = [None] * x.ndim
        spec[kvh_axis] = mesh.axis_names[0]
        return jax.device_put(x, NamedSharding(mesh, PartitionSpec(*spec)))

    if kv_dtype == "int8":
        return PagedKV(
            k=place(jnp.zeros(shape, jnp.int8), 2),
            v=place(jnp.zeros(shape, jnp.int8), 2),
            table=jnp.zeros((batch, maxp), jnp.int32),
            k_scale=place(jnp.zeros(scale_shape, jnp.float32), 2),
            v_scale=place(jnp.zeros(scale_shape, jnp.float32), 2),
            mesh=mesh,
        )
    if kv_dtype is not None:
        raise ValueError(
            f"unsupported kv_dtype {kv_dtype!r} (use 'int8' or None)"
        )
    return PagedKV(
        k=place(jnp.zeros(shape, cfg.dtype), 2),
        v=place(jnp.zeros(shape, cfg.dtype), 2),
        table=jnp.zeros((batch, maxp), jnp.int32),
        mesh=mesh,
    )


def _quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-token per-head int8: x [B, T, KvH, Dh] ->
    (q int8 same shape, scale f32 [B, T, KvH])."""
    a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    s = a / 127.0 + 1e-12
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s[..., 0]


def decoder_forward(
    params: Params,  # stacked (see stack_decoder_params)
    tokens: jax.Array,  # [B, T] int32 — new tokens
    cache,  # KV ring tuple [L, B, KvH, C, Dh] or PagedKV
    start_pos: jax.Array,  # [B] int32 — absolute position of tokens[:, 0]
    cfg: DecoderConfig,
):
    """Run T tokens (prefill T>1, decode T=1) against the cache.

    Returns (logits [B, T, V] f32, updated cache — same form as passed).
    Causality: token i may attend to all cache slots < start+i+1; cache
    slots beyond the current length are masked by position. With a
    :class:`PagedKV` cache the slots live in pooled pages addressed
    through the page table and attention runs the page-walk kernel.
    """
    dt = cfg.dtype
    b, t = tokens.shape
    x = jnp.take(params["embed"], tokens, axis=0).astype(dt)
    positions = start_pos[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
    paged = isinstance(cache, PagedKV)

    if paged:
        import functools as _ft

        from outline_rag_tpu.ops.paged_attention import (
            paged_attention,
            paged_attention_sharded,
            paged_kv_write,
            paged_kv_write_sharded,
        )

        if cache.mesh is not None:
            # TP pool: the pallas page walk / page write cannot be
            # GSPMD-partitioned, so they run per-device under shard_map
            # on the KvH slice
            paged_attention = _ft.partial(
                paged_attention_sharded,
                mesh=cache.mesh,
                axis=cache.mesh.axis_names[0],
            )
            paged_kv_write = _ft.partial(
                paged_kv_write_sharded,
                mesh=cache.mesh,
                axis=cache.mesh.axis_names[0],
            )
        table = cache.table

        quant = cache.k_scale is not None

        def layer_math(x, layer, k_pool, v_pool, ks_pool, vs_pool, tbl):
            h = _rms_norm(x, layer["ln1"], cfg.norm_eps)
            q, k_new, v_new = _qkv(h, layer, positions, cfg)
            # pool [P, KvH, Dh, S] (position minor); the pallas page
            # write RMWs the target page slabs in place — the XLA
            # scatter alternative wins layout assignment over the page
            # walk and relayout-copies the whole pool around the
            # per-layer scan (it OOM'd a 16 GB chip at 64 slots).
            if quant:
                k_q, k_s = _quantize_kv(k_new)
                v_q, v_s = _quantize_kv(v_new)
                k_pool, v_pool, ks_pool, vs_pool = paged_kv_write(
                    k_pool, v_pool, tbl, start_pos, k_q, v_q,
                    ks_pool, vs_pool, k_s, v_s,
                )
            else:
                k_pool, v_pool = paged_kv_write(
                    k_pool, v_pool, tbl, start_pos,
                    k_new.astype(dt), v_new.astype(dt),
                )
            ctx = paged_attention(
                q, k_pool, v_pool, tbl, start_pos,
                k_scale=ks_pool, v_scale=vs_pool,
            )
            x = x + _mm(ctx.reshape(b, t, -1), layer["wo"], dt)
            h2 = _rms_norm(x, layer["ln2"], cfg.norm_eps)
            x = x + _mlp(h2, layer, cfg)
            return x, k_pool, v_pool, ks_pool, vs_pool

        import os as _os

        # carry is the measured default: the xs/ys form stacks every
        # layer's updated pool slab into a fresh ys buffer (B=64 A/B:
        # 18.32 -> 11.28 ms/step; 64-slot serving 1,720 -> 3,990 tok/s,
        # measurements/r4/dissect64_carry + slots64_carry)
        scan_mode = _os.environ.get("ORT_PAGED_SCAN", "carry")
        layers = params["layers"]
        if scan_mode == "carry":
            # Pools as scan CARRY over a layer-flattened [(L*P), ...]
            # view; each layer's page ids are resolved by offsetting
            # the (dynamic) page table by li*P, so the kernels need no
            # layer axis. The xs/ys form below makes lax.scan stack
            # every layer's updated pool slab into a fresh ys buffer —
            # a full pool-slab copy per layer per step (2x67 MB at
            # B=64/1.1B; the dominant batched-decode cost, see
            # measurements/r4 kvwrite probe) — while a carried pool
            # flows through the aliased pallas writes copy-free. Dead
            # or padding table entries (0) land in layer li's
            # never-allocated slot 0; kernel scratch stays global
            # page 0.
            n_p = cache.k.shape[1]

            def _flat(a):
                return a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])

            def body_c(carry, layer):
                if quant:
                    x, kp, vp, ksp, vsp, li = carry
                else:
                    x, kp, vp, li = carry
                    ksp = vsp = None
                tbl = table + li * n_p
                x, kp, vp, ksp, vsp = layer_math(
                    x, layer, kp, vp, ksp, vsp, tbl
                )
                if quant:
                    return (x, kp, vp, ksp, vsp, li + 1), None
                return (x, kp, vp, li + 1), None

            li0 = jnp.int32(0)
            if quant:
                carry0 = (
                    x, _flat(cache.k), _flat(cache.v),
                    _flat(cache.k_scale), _flat(cache.v_scale), li0,
                )
                (x, k_pool, v_pool, ks_pool, vs_pool, _), _ = jax.lax.scan(
                    body_c, carry0, layers
                )
                out_cache = PagedKV(
                    k=k_pool.reshape(cache.k.shape),
                    v=v_pool.reshape(cache.v.shape),
                    table=table,
                    k_scale=ks_pool.reshape(cache.k_scale.shape),
                    v_scale=vs_pool.reshape(cache.v_scale.shape),
                    mesh=cache.mesh,
                )
            else:
                carry0 = (x, _flat(cache.k), _flat(cache.v), li0)
                (x, k_pool, v_pool, _), _ = jax.lax.scan(
                    body_c, carry0, layers
                )
                out_cache = PagedKV(
                    k=k_pool.reshape(cache.k.shape),
                    v=v_pool.reshape(cache.v.shape),
                    table=table, mesh=cache.mesh,
                )
        else:

            def body(carry, inputs):
                x = carry
                if quant:
                    layer, k_pool, v_pool, ks_pool, vs_pool = inputs
                else:
                    layer, k_pool, v_pool = inputs
                    ks_pool = vs_pool = None
                x, k_pool, v_pool, ks_pool, vs_pool = layer_math(
                    x, layer, k_pool, v_pool, ks_pool, vs_pool, table
                )
                if quant:
                    return x, (k_pool, v_pool, ks_pool, vs_pool)
                return x, (k_pool, v_pool)

            if quant:
                x, (k_pool, v_pool, ks_pool, vs_pool) = jax.lax.scan(
                    body, x,
                    (layers, cache.k, cache.v, cache.k_scale, cache.v_scale),
                )
                out_cache = PagedKV(
                    k=k_pool, v=v_pool, table=table,
                    k_scale=ks_pool, v_scale=vs_pool, mesh=cache.mesh,
                )
            else:
                x, (k_pool, v_pool) = jax.lax.scan(
                    body, x, (layers, cache.k, cache.v)
                )
                out_cache = PagedKV(
                    k=k_pool, v=v_pool, table=table, mesh=cache.mesh
                )
    else:
        c = cfg.max_cache
        # attention bias [B, T, C]: slot j visible to token i iff j <= pos_i
        slot = jnp.arange(c, dtype=jnp.int32)
        mask = slot[None, None, :] <= positions[:, :, None]
        mask_bias = jnp.where(mask, 0.0, -1e9).astype(jnp.float32)

        k_ring, v_ring = cache

        def body(carry, inputs):
            x = carry
            layer, k_layer, v_layer = inputs
            h = _rms_norm(x, layer["ln1"], cfg.norm_eps)
            q, k_new, v_new = _qkv(h, layer, positions, cfg)
            # write the T new entries at start_pos (per batch row)
            def write(ring, new):
                # ring [B, KvH, C, Dh]; new [B, T, KvH, Dh]
                def one(ring_b, new_b, pos0):
                    return jax.lax.dynamic_update_slice(
                        ring_b, new_b.transpose(1, 0, 2), (0, pos0, 0)
                    )

                return jax.vmap(one)(ring, new, start_pos)

            k_layer = write(k_layer, k_new.astype(dt))
            v_layer = write(v_layer, v_new.astype(dt))
            x = x + _attn_out(q, (k_layer, v_layer), mask_bias, layer, cfg)
            h2 = _rms_norm(x, layer["ln2"], cfg.norm_eps)
            x = x + _mlp(h2, layer, cfg)
            return x, (k_layer, v_layer)

        layers = params["layers"]
        x, (k_ring, v_ring) = jax.lax.scan(body, x, (layers, k_ring, v_ring))
        out_cache = (k_ring, v_ring)
    x = _rms_norm(x, params["final_norm"], cfg.norm_eps)
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    logits = _mm(x, head, dt).astype(jnp.float32)
    return logits, out_cache


# ---------------------------------------------------------------------------
# sampling + chunked generation
# ---------------------------------------------------------------------------


def sample_token(
    logits: jax.Array,  # [B, V] f32
    key: jax.Array,
    temperature: float | jax.Array,
    top_p: float | jax.Array,
    top_k_cap: int = 64,
) -> jax.Array:
    """Temperature + nucleus sampling; temperature <= 0 means greedy.

    The nucleus is taken within the top ``top_k_cap`` logits (the
    standard top-k+top-p combination): a full-vocab sort per decode step
    costs more than a whole transformer layer, while the probability
    mass beyond the top-64 of a trained LM is negligible."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    # temperature/top_p accept scalars or per-row [B] arrays (the
    # continuous batcher mixes requests with different sampling params)
    temp = jnp.broadcast_to(
        jnp.asarray(temperature, jnp.float32), (logits.shape[0],)
    )
    tp = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (logits.shape[0],))
    scaled = logits / jnp.maximum(temp, 1e-4)[:, None]
    cap = min(top_k_cap, scaled.shape[-1])
    top_vals, top_idx = jax.lax.top_k(scaled, cap)  # [B, cap] desc
    probs = jax.nn.softmax(top_vals, axis=-1)
    csum = jnp.cumsum(probs, axis=-1)
    # smallest prefix with cumulative mass >= top_p; keep at least 1
    keep = jnp.concatenate(
        [jnp.ones((scaled.shape[0], 1), bool), csum[:, :-1] < tp[:, None]],
        axis=1,
    )
    masked = jnp.where(keep, top_vals, -jnp.inf)
    choice = jax.random.categorical(key, masked, axis=-1)  # [B] in [0, cap)
    sampled = jnp.take_along_axis(top_idx, choice[:, None], axis=-1)[:, 0]
    return jnp.where(temp <= 0.0, greedy, sampled.astype(jnp.int32))


def _sample_one(
    logits: jax.Array,  # [V] f32
    key: jax.Array,
    temperature: jax.Array,
    top_p: jax.Array,
    top_k_cap: int = 64,
) -> jax.Array:
    """Single-row nucleus sampler (same math as :func:`sample_token`).

    Kept 1-D so the speculative path can vmap it with a *per-position*
    key: sampling for absolute position q always consumes
    ``fold_in(base, q)``, which makes speculative and plain decoding
    consume identical randomness and therefore emit identical tokens.
    """
    greedy = jnp.argmax(logits).astype(jnp.int32)
    temp = jnp.asarray(temperature, jnp.float32)
    tp = jnp.asarray(top_p, jnp.float32)
    scaled = logits / jnp.maximum(temp, 1e-4)
    cap = min(top_k_cap, scaled.shape[-1])
    top_vals, top_idx = jax.lax.top_k(scaled, cap)
    probs = jax.nn.softmax(top_vals)
    csum = jnp.cumsum(probs)
    keep = jnp.concatenate([jnp.ones((1,), bool), csum[:-1] < tp])
    masked = jnp.where(keep, top_vals, -jnp.inf)
    choice = jax.random.categorical(key, masked)
    return jnp.where(temp <= 0.0, greedy, top_idx[choice].astype(jnp.int32))


def key_at(base: jax.Array, pos: jax.Array) -> jax.Array:
    """Sampler key for absolute position ``pos`` — the shared convention
    of the speculative and positional-solo decode paths."""
    return jax.random.fold_in(base, pos)


def propose_ngram(
    buf: jax.Array,  # [B, C] int32 — tokens 0..pos are trustworthy
    pos: jax.Array,  # [B] int32 — position of the current (fed) token
    *,
    gram: int,
    k: int,
) -> jax.Array:
    """Prompt-lookup draft proposal (n-gram speculative decoding).

    Finds the most recent earlier occurrence of the ``gram`` tokens
    ending at ``pos`` and proposes the ``k`` tokens that followed it.
    RAG answers quote retrieved context verbatim, so the continuation of
    a repeated n-gram is a strong draft — and a *wrong* draft costs
    nothing: acceptance compares the model's own samples against the
    draft, so emitted text never depends on draft quality.

    Returns drafts ``[B, k]`` (hypotheses for positions pos+1..pos+k).
    When no match exists the drafts are arbitrary tokens that simply
    fail acceptance.
    """
    b, c = buf.shape
    start = jnp.maximum(pos - (gram - 1), 0)
    suffix = jax.vmap(
        lambda row, s: jax.lax.dynamic_slice(row, (s,), (gram,))
    )(buf, start)
    nj = c - gram - k + 1  # candidate gram starts with a full draft slice
    eq = jnp.ones((b, nj), bool)
    for i in range(gram):
        eq = eq & (buf[:, i : i + nj] == suffix[:, i : i + 1])
    j_idx = jnp.arange(nj, dtype=jnp.int32)
    # the gram (and at least its first draft token) must lie in the
    # known region, and must not be the current suffix itself
    valid = eq & (j_idx[None, :] <= (pos - gram)[:, None])
    best = jnp.max(jnp.where(valid, j_idx[None, :], -1), axis=1)
    m = jnp.where(best >= 0, best + gram, 0).astype(jnp.int32)
    return jax.vmap(
        lambda row, s: jax.lax.dynamic_slice(row, (s,), (k,))
    )(buf, m)


def generate_chunk_spec(
    params: Params,
    cache: tuple[jax.Array, jax.Array],
    tok_buf: jax.Array,  # [B, C] int32 — all tokens so far (prompt + emitted)
    token: jax.Array,  # [B] int32 — next token to feed (already emitted)
    pos: jax.Array,  # [B] int32 — its absolute position
    key: jax.Array,  # base key; per-position keys are folded in
    cfg: DecoderConfig,
    *,
    n_steps: int,
    draft_k: int,
    gram: int = 3,
    temperature,  # float, or [B] array for mixed-request batches
    top_p,
    eos_id: int,
    done0: jax.Array | None = None,  # [B] bool — rows to skip (batcher)
    force_accept: bool = False,
    seeds: jax.Array | None = None,  # [B] int32 — per-row sampler streams
) -> tuple[
    jax.Array,
    jax.Array,
    tuple[jax.Array, jax.Array],
    jax.Array,
    jax.Array,
    jax.Array,
]:
    """Speculative generation: ``n_steps`` verify steps in one dispatch.

    Each step proposes ``draft_k`` prompt-lookup drafts, runs ONE
    ``[B, 1+draft_k]`` forward (decode is weight-bandwidth-bound, so the
    extra positions are nearly free), samples every position with its
    position-folded key, and accepts the longest prefix where sample ==
    draft — emitting between 1 and ``draft_k``+1 tokens per forward.
    Output is distribution-identical to plain positional-key decoding
    (bit-exact: same keys, same sampler) because emitted tokens are
    always the model's own samples.

    KV-ring discipline: a verify writes slots ``pos..pos+K``; rejected
    slots are stale but every later window starts at the first stale
    slot and rewrites forward, and the position mask hides slots beyond
    the current token — same invariant as the token buffer.

    ``force_accept`` (bench-only) accepts all drafts regardless of
    match, to measure the all-accepted throughput ceiling; it changes
    the emitted text and must never serve.

    Returns ``(emitted [B, n_steps*(draft_k+1)], count [B], cache,
    tok_buf, next_token, next_pos)``; the caller consumes
    ``emitted[b, :count[b]]`` and stops at the first eos.
    """
    b = token.shape[0]
    c = cfg.max_cache
    kk = draft_k + 1
    offs = jnp.arange(kk, dtype=jnp.int32)
    out0 = jnp.zeros((b, n_steps * kk), jnp.int32)
    temp_b = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32), (b,))
    tp_b = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (b,))
    # per-row base keys: mixed-request batches must not share randomness
    # (identical prompts with different seeds would emit identical text);
    # None keeps the single-stream convention key_at(key, q) bit-exact
    if seeds is None:
        base_rows = jnp.broadcast_to(key, (b,))
    else:
        base_rows = jax.vmap(lambda s: jax.random.fold_in(key, s))(seeds)

    def step(carry, _):
        cache, buf, tok, pos, done, out, cursor = carry
        # capacity guard: a window needs slots pos..pos+draft_k
        done = jnp.logical_or(done, pos + kk > c)
        posf = jnp.minimum(pos, c - kk)
        buf = jax.vmap(lambda r, t, p: r.at[p].set(t))(buf, tok, posf)
        drafts = propose_ngram(buf, posf, gram=gram, k=draft_k)
        window = jnp.concatenate([tok[:, None], drafts], axis=1)
        logits, cache = decoder_forward(params, window, cache, posf, cfg)
        sample_pos = posf[:, None] + 1 + offs[None, :]
        keys = jax.vmap(
            lambda bk, ps: jax.vmap(lambda p: key_at(bk, p))(ps)
        )(base_rows, sample_pos)
        e = jax.vmap(
            jax.vmap(_sample_one, in_axes=(0, 0, None, None)),
            in_axes=(0, 0, 0, 0),
        )(
            logits.astype(jnp.float32), keys, temp_b, tp_b
        )  # [B, kk] — e[:, i] is the sample for position posf+1+i
        if force_accept:
            match = jnp.ones((b, draft_k), bool)
        else:
            match = e[:, :draft_k] == drafts
        acc = jnp.cumprod(match.astype(jnp.int32), axis=1)
        cnt = jnp.sum(acc, axis=1) + 1  # accepted drafts + bonus sample
        # truncate at the first emitted eos (inclusive), freeze after
        is_eos = (e == eos_id) & (offs[None, :] < cnt[:, None])
        has_eos = jnp.any(is_eos, axis=1)
        cnt = jnp.where(has_eos, jnp.argmax(is_eos, axis=1) + 1, cnt)
        cnt = jnp.where(done, 0, cnt)
        newdone = done | has_eos
        last = jax.vmap(lambda row, i: row[i])(e, jnp.maximum(cnt - 1, 0))
        tok2 = jnp.where(
            cnt > 0, jnp.where(newdone, jnp.int32(eos_id), last), tok
        )
        pos2 = pos + cnt
        # unmasked window writes: slots beyond cnt are stale but every
        # later window starts at the first stale slot and rewrites.
        # Only the first draft_k samples are written (max accepted prefix
        # is cnt-1 <= draft_k past posf; the bonus sample becomes tok2 and
        # is written at the new posf next step) so the slice end is
        # posf+1+draft_k <= c and dynamic_update_slice never clamps —
        # a clamped write at pos+kk == c would corrupt buf[posf].
        buf = jax.vmap(
            lambda r, v, p: jax.lax.dynamic_update_slice(r, v, (p,))
        )(buf, e[:, :draft_k], posf + 1)
        out = jax.vmap(
            lambda r, v, cu: jax.lax.dynamic_update_slice(r, v, (cu,))
        )(out, e, cursor)
        cursor2 = cursor + cnt
        return (cache, buf, tok2, pos2, newdone, out, cursor2), None

    if done0 is None:
        done0 = jnp.zeros((b,), bool)
    cursor0 = jnp.zeros((b,), jnp.int32)
    (cache, tok_buf, tok, pos, _, out, cursor), _ = jax.lax.scan(
        step, (cache, tok_buf, token, pos, done0, out0, cursor0),
        None, length=n_steps,
    )
    return out, cursor, cache, tok_buf, tok, pos


def generate_chunk(
    params: Params,
    cache: tuple[jax.Array, jax.Array],
    token: jax.Array,  # [B] int32 — next token to feed (not yet written)
    pos: jax.Array,  # [B] int32 — its absolute position
    key: jax.Array,
    cfg: DecoderConfig,
    *,
    n_steps: int,
    temperature: float,
    top_p: float,
    eos_id: int,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array], jax.Array, jax.Array]:
    """Generate n_steps tokens device-side in one dispatch.

    Caller protocol: prefill with :func:`decoder_forward` over the
    prompt, sample the first token from the final logits (that token is
    *emitted by the caller*), then call this with (token=first_sampled,
    pos=prompt_len). Each step writes ``token`` into the cache and emits
    the next sample; after eos the stream freezes on eos (callers stop
    at the first one). Returns (tokens [B, n_steps], cache, next_token,
    next_pos) for chaining chunks.
    """

    def step(carry, k_step):
        cache, tok, pos, done = carry
        logits, cache = decoder_forward(
            params, tok[:, None], cache, pos, cfg
        )
        nxt = sample_token(logits[:, -1, :], k_step, temperature, top_p)
        nxt = jnp.where(done, jnp.int32(eos_id), nxt)
        done = jnp.logical_or(done, nxt == eos_id)
        return (cache, nxt, pos + 1, done), nxt

    done0 = jnp.zeros(token.shape, bool)
    keys = jax.random.split(key, n_steps)
    (cache, tok, pos, _), toks = jax.lax.scan(
        step, (cache, token, pos, done0), keys
    )
    return toks.T, cache, tok, pos
