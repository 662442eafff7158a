"""HF checkpoint -> JAX params conversion.

Loads ``BAAI/bge-m3`` / ``BAAI/bge-reranker-v2-m3`` (or any
XLM-RoBERTa-family) torch ``state_dict`` into the params pytree used by
``models/encoder.py``. Torch ``nn.Linear`` stores ``[out, in]``; our
forward uses ``x @ W`` so every linear weight is transposed here. Used both
by deployment (real weights from ENCODER_WEIGHTS_PATH) and by the parity
tests, which round-trip a tiny randomly-initialized HF model through this
converter and assert output agreement (SURVEY.md section 7 step 3:
embedding parity vs reference outputs).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from outline_rag_tpu.models.encoder import EncoderConfig, Params


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu()
        # torch refuses .numpy() on bfloat16 — and bf16 is the standard
        # shipping dtype for Llama/Qwen (and many encoder) checkpoints
        if str(t.dtype) == "torch.bfloat16":
            t = t.float()
        t = t.numpy()
    return np.asarray(t, np.float32)


def _load_state_dict(path: str) -> dict:
    """Weight-file discovery shared by every loader: single-file
    pytorch_model.bin / model.safetensors, or the standard HF sharded
    layout (model.safetensors.index.json -> shards)."""
    import json
    import os

    import torch  # noqa: PLC0415

    for fname in ("pytorch_model.bin", "model.safetensors"):
        full = os.path.join(path, fname)
        if os.path.exists(full):
            if fname.endswith(".safetensors"):
                from safetensors.torch import load_file  # noqa: PLC0415

                return load_file(full)
            return torch.load(full, map_location="cpu", weights_only=True)
    index = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(index):
        from safetensors.torch import load_file  # noqa: PLC0415

        with open(index) as f:
            weight_map = json.load(f)["weight_map"]
        sd = {}
        for shard in sorted(set(weight_map.values())):
            sd.update(load_file(os.path.join(path, shard)))
        return sd
    raise FileNotFoundError(f"no weight file found under {path}")


def config_from_hf(hf_config) -> EncoderConfig:
    return EncoderConfig(
        vocab_size=hf_config.vocab_size,
        hidden=hf_config.hidden_size,
        layers=hf_config.num_hidden_layers,
        heads=hf_config.num_attention_heads,
        intermediate=hf_config.intermediate_size,
        max_positions=hf_config.max_position_embeddings,
        pad_id=hf_config.pad_token_id,
        layer_norm_eps=hf_config.layer_norm_eps,
    )


def params_from_state_dict(
    state_dict: Mapping[str, Any], cfg: EncoderConfig
) -> Params:
    sd = dict(state_dict)
    # strip the task-model prefix if present (roberta.* / model.*)
    for prefix in ("roberta.", "model.", "bert."):
        if any(k.startswith(prefix + "embeddings") for k in sd):
            sd = {
                (k[len(prefix):] if k.startswith(prefix) else k): v
                for k, v in sd.items()
            }
            break

    def lin_w(name):
        return _np(sd[name]).T  # torch [out,in] -> [in,out]

    p: Params = {
        "embed": {
            "word": _np(sd["embeddings.word_embeddings.weight"]),
            "position": _np(sd["embeddings.position_embeddings.weight"]),
            "token_type": _np(sd["embeddings.token_type_embeddings.weight"]),
            "ln_scale": _np(sd["embeddings.LayerNorm.weight"]),
            "ln_bias": _np(sd["embeddings.LayerNorm.bias"]),
        },
        "layers": [],
    }
    for i in range(cfg.layers):
        b = f"encoder.layer.{i}."
        p["layers"].append(
            {
                "attn": {
                    "wq": lin_w(b + "attention.self.query.weight"),
                    "bq": _np(sd[b + "attention.self.query.bias"]),
                    "wk": lin_w(b + "attention.self.key.weight"),
                    "bk": _np(sd[b + "attention.self.key.bias"]),
                    "wv": lin_w(b + "attention.self.value.weight"),
                    "bv": _np(sd[b + "attention.self.value.bias"]),
                    "wo": lin_w(b + "attention.output.dense.weight"),
                    "bo": _np(sd[b + "attention.output.dense.bias"]),
                    "ln_scale": _np(sd[b + "attention.output.LayerNorm.weight"]),
                    "ln_bias": _np(sd[b + "attention.output.LayerNorm.bias"]),
                },
                "mlp": {
                    "wi": lin_w(b + "intermediate.dense.weight"),
                    "bi": _np(sd[b + "intermediate.dense.bias"]),
                    "wo": lin_w(b + "output.dense.weight"),
                    "bo": _np(sd[b + "output.dense.bias"]),
                    "ln_scale": _np(sd[b + "output.LayerNorm.weight"]),
                    "ln_bias": _np(sd[b + "output.LayerNorm.bias"]),
                },
            }
        )
    if "classifier.dense.weight" in sd:
        p["classifier"] = {
            "dense_w": lin_w("classifier.dense.weight"),
            "dense_b": _np(sd["classifier.dense.bias"]),
            "out_w": lin_w("classifier.out_proj.weight"),
            "out_b": _np(sd["classifier.out_proj.bias"]),
        }
    return p


def load_pretrained(path: str):
    """Load (cfg, params) from a local HF model directory (torch format).

    Gated on torch/transformers availability; deployments without local
    weights fall back to the deterministic hash embedder
    (``models/hash_embedder.py``)."""
    import torch  # noqa: PLC0415
    from transformers import AutoConfig  # noqa: PLC0415

    hf_cfg = AutoConfig.from_pretrained(path)
    cfg = config_from_hf(hf_cfg)
    import os

    sd = _load_state_dict(path)
    params = params_from_state_dict(sd, cfg)
    # BGE-m3 ships its sparse lexical head as a sidecar Linear(H,1)
    sparse_path = os.path.join(path, "sparse_linear.pt")
    if os.path.exists(sparse_path):
        head = torch.load(sparse_path, map_location="cpu", weights_only=True)
        params["sparse"] = {
            "w": _np(head["weight"]).T,
            "b": _np(head["bias"]),
        }
    # ... and its multi-vector (ColBERT) head as Linear(H, Hc)
    colbert_path = os.path.join(path, "colbert_linear.pt")
    if os.path.exists(colbert_path):
        head = torch.load(
            colbert_path, map_location="cpu", weights_only=True
        )
        params["colbert"] = {
            "w": _np(head["weight"]).T,
            "b": _np(head["bias"]),
        }
    return cfg, params


# ---------------------------------------------------------------------------
# Decoder LM (Llama / Qwen2 family) -> models/decoder.py params
# ---------------------------------------------------------------------------


def decoder_config_from_hf(hf_config):
    from outline_rag_tpu.models.decoder import DecoderConfig

    return DecoderConfig(
        vocab_size=hf_config.vocab_size,
        hidden=hf_config.hidden_size,
        layers=hf_config.num_hidden_layers,
        heads=hf_config.num_attention_heads,
        kv_heads=getattr(
            hf_config, "num_key_value_heads", hf_config.num_attention_heads
        ),
        intermediate=hf_config.intermediate_size,
        head_dim=getattr(hf_config, "head_dim", None),
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        norm_eps=hf_config.rms_norm_eps,
        attn_bias=bool(
            getattr(hf_config, "attention_bias", False)
            or getattr(hf_config, "model_type", "") == "qwen2"
        ),
        tie_embeddings=bool(getattr(hf_config, "tie_word_embeddings", False)),
    )


def decoder_params_from_state_dict(sd: Mapping[str, Any], cfg) -> Params:
    """HF LlamaForCausalLM/Qwen2ForCausalLM state_dict -> decoder pytree."""
    p: Params = {
        "embed": _np(sd["model.embed_tokens.weight"]),
        "final_norm": _np(sd["model.norm.weight"]),
        "layers": [],
    }
    if not cfg.tie_embeddings and "lm_head.weight" in sd:
        p["lm_head"] = _np(sd["lm_head.weight"]).T
    for i in range(cfg.layers):
        pre = f"model.layers.{i}."
        layer = {
            "ln1": _np(sd[pre + "input_layernorm.weight"]),
            "ln2": _np(sd[pre + "post_attention_layernorm.weight"]),
            "wq": _np(sd[pre + "self_attn.q_proj.weight"]).T,
            "wk": _np(sd[pre + "self_attn.k_proj.weight"]).T,
            "wv": _np(sd[pre + "self_attn.v_proj.weight"]).T,
            "wo": _np(sd[pre + "self_attn.o_proj.weight"]).T,
            "wg": _np(sd[pre + "mlp.gate_proj.weight"]).T,
            "wu": _np(sd[pre + "mlp.up_proj.weight"]).T,
            "wd": _np(sd[pre + "mlp.down_proj.weight"]).T,
        }
        if cfg.attn_bias:
            layer["bq"] = _np(sd[pre + "self_attn.q_proj.bias"])
            layer["bk"] = _np(sd[pre + "self_attn.k_proj.bias"])
            layer["bv"] = _np(sd[pre + "self_attn.v_proj.bias"])
        p["layers"].append(layer)
    return p


def load_pretrained_decoder(path: str):
    """Load (cfg, params) for a local Llama/Qwen-family HF checkpoint."""
    import os

    import torch  # noqa: PLC0415
    from transformers import AutoConfig  # noqa: PLC0415

    hf_cfg = AutoConfig.from_pretrained(path)
    cfg = decoder_config_from_hf(hf_cfg)
    return cfg, decoder_params_from_state_dict(_load_state_dict(path), cfg)
