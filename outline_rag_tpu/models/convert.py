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
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


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

    for fname in ("pytorch_model.bin", "model.safetensors"):
        full = os.path.join(path, fname)
        if os.path.exists(full):
            if fname.endswith(".safetensors"):
                from safetensors.torch import load_file  # noqa: PLC0415

                sd = load_file(full)
            else:
                sd = torch.load(full, map_location="cpu", weights_only=True)
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
    raise FileNotFoundError(f"no weight file found under {path}")
