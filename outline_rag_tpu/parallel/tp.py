"""Tensor parallelism for the decoder LM — pure GSPMD.

The encoder-class retrieval models fit one chip, so the query path only
row-shards the *corpus* (``parallel/query.py``). The optional local chat
LM is the one model family that can outgrow a chip; this module shards
it Megatron-style with nothing but ``NamedSharding`` annotations on the
params — the forward (``models/decoder.py``) is untouched and XLA
inserts the all-reduces where the row-sharded projections need them
(the scaling-book recipe: pick a mesh, annotate, let GSPMD do the
collectives).

Layout per block (axis name ``model``):
- column-parallel: wq/wk/wv (attention heads split across devices),
  wg/wu (MLP intermediate split) — activations stay sharded head-/
  intermediate-wise, no communication;
- row-parallel: wo/wd — each device holds a slice of the contraction
  dim; XLA emits one psum per projection (2 all-reduces per layer,
  the Megatron minimum);
- replicated: norms, embeddings, lm_head (vocab-sharding the head is a
  further option; the logits matmul is a small fraction of decode time).

Constraints: heads % n and kv_heads % n must be 0 (head-granular
sharding); the KV cache shards on its KvH axis so per-device cache
memory also scales down.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"

# leaf name -> PartitionSpec for stacked layer params [L, ...]
_LAYER_SPECS = {
    "wq": P(None, None, MODEL_AXIS),  # [L, H, nh*hd]
    "wk": P(None, None, MODEL_AXIS),
    "wv": P(None, None, MODEL_AXIS),
    "bq": P(None, MODEL_AXIS),
    "bk": P(None, MODEL_AXIS),
    "bv": P(None, MODEL_AXIS),
    "wo": P(None, MODEL_AXIS, None),  # [L, nh*hd, H] row-parallel
    "wg": P(None, None, MODEL_AXIS),  # [L, H, I]
    "wu": P(None, None, MODEL_AXIS),
    "wd": P(None, MODEL_AXIS, None),  # [L, I, H] row-parallel
    "ln1": P(),
    "ln2": P(),
}

# w8a8-quantized leaves ({"q": [L, N, K] int8, "s": [L, N] f32},
# models/decoder.py::quantize_decoder_params — note q is transposed
# [out, in]): column-parallel weights shard the output dim N of both q
# and the per-output-channel scales; row-parallel weights shard the
# contraction dim K of q while the scales (indexed by the *output*
# channel) replicate. GSPMD then partitions the int8 dot and inserts
# the psum on the row-parallel contraction, same as the dense layout.
_LAYER_QSPECS = {
    "wq": {"q": P(None, MODEL_AXIS, None), "s": P(None, MODEL_AXIS)},
    "wk": {"q": P(None, MODEL_AXIS, None), "s": P(None, MODEL_AXIS)},
    "wv": {"q": P(None, MODEL_AXIS, None), "s": P(None, MODEL_AXIS)},
    "wg": {"q": P(None, MODEL_AXIS, None), "s": P(None, MODEL_AXIS)},
    "wu": {"q": P(None, MODEL_AXIS, None), "s": P(None, MODEL_AXIS)},
    "wo": {"q": P(None, None, MODEL_AXIS), "s": P()},
    "wd": {"q": P(None, None, MODEL_AXIS), "s": P()},
}

# int4 leaves ({"q4": [L, N, K//2] nibble-packed uint8, "s4":
# [L, N, G] f32} — group-wise scales along the contraction dim K,
# models/decoder.py::quantize_decoder_params_int4): column-parallel
# weights shard the output dim N of q4 and s4; row-parallel weights
# shard the packed contraction dim of q4 (block-pair layout: lane
# 128c+j = elements 256c+j / 256c+128+j, so any 128-lane-aligned split
# along K/2 lands on 256-element+group boundaries for pow-2 shapes)
# while the scales replicate — the grouped dot keeps its [G] batch dim
# aligned with the K sharding, GSPMD slices the replicated scales to
# the local groups and inserts the psum over G (when G is not
# divisible by the mesh it all-gathers instead: correct, just slower —
# real shapes have K/devices a multiple of the 128-group).
_LAYER_Q4SPECS = {
    "wq": {"q4": P(None, MODEL_AXIS, None), "s4": P(None, MODEL_AXIS, None)},
    "wk": {"q4": P(None, MODEL_AXIS, None), "s4": P(None, MODEL_AXIS, None)},
    "wv": {"q4": P(None, MODEL_AXIS, None), "s4": P(None, MODEL_AXIS, None)},
    "wg": {"q4": P(None, MODEL_AXIS, None), "s4": P(None, MODEL_AXIS, None)},
    "wu": {"q4": P(None, MODEL_AXIS, None), "s4": P(None, MODEL_AXIS, None)},
    "wo": {"q4": P(None, None, MODEL_AXIS), "s4": P()},
    "wd": {"q4": P(None, None, MODEL_AXIS), "s4": P()},
}


def model_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            # silently truncating would run a lower TP degree than the
            # divisibility guards validated (and than the HBM plan needs)
            raise ValueError(
                f"requested {n_devices}-way TP but only "
                f"{len(devs)} device(s) are visible"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (MODEL_AXIS,))


def decoder_param_shardings(params, mesh: Mesh):
    """Sharding pytree matching a *stacked* decoder params dict."""

    def spec_for(path, leaf):
        def key(entry):
            return entry.key if hasattr(entry, "key") else str(entry)

        name = key(path[-1])
        if name in _LAYER_SPECS:
            return NamedSharding(mesh, _LAYER_SPECS[name])
        if name in ("q", "s") and len(path) >= 2:
            parent = key(path[-2])
            if parent in _LAYER_QSPECS:
                return NamedSharding(mesh, _LAYER_QSPECS[parent][name])
        if name in ("q4", "s4") and len(path) >= 2:
            parent = key(path[-2])
            if parent in _LAYER_Q4SPECS:
                return NamedSharding(mesh, _LAYER_Q4SPECS[parent][name])
        return NamedSharding(mesh, P())  # embed / norms / lm_head / biases

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_decoder_params(params, mesh: Mesh):
    """Place a stacked decoder params pytree onto the TP mesh.

    ``cfg.heads % mesh.size == 0 and cfg.kv_heads % mesh.size == 0``
    is required so the head reshape keeps the sharding aligned.
    """
    return jax.device_put(params, decoder_param_shardings(params, mesh))


def shard_decoder_cache(cache, mesh: Mesh):
    """Shard the KV ring [L, B, KvH, C, Dh] on its KvH axis."""
    sharding = NamedSharding(mesh, P(None, None, MODEL_AXIS, None, None))
    k, v = cache
    return jax.device_put(k, sharding), jax.device_put(v, sharding)
