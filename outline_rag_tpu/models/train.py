"""Contrastive fine-tuning of the dual encoder.

No reference equivalent (the reference consumes frozen remote models); this
is the TPU-native capability that replaces "wait for the provider to ship a
better embedder": in-batch-negatives InfoNCE training of the XLM-R encoder
(the BGE-family recipe) so a deployment can adapt retrieval to its own
wiki. Data-parallel over a ``Mesh``: params replicated, batch row-sharded;
XLA inserts the gradient ``psum`` from the shardings.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from outline_rag_tpu.models.encoder import EncoderConfig, Params, pooled_embeddings


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array


def contrastive_loss(
    params: Params,
    q_ids: jax.Array,
    q_mask: jax.Array,
    p_ids: jax.Array,
    p_mask: jax.Array,
    cfg: EncoderConfig,
    temperature: float = 0.05,
    remat: bool = False,
) -> jax.Array:
    """Symmetric InfoNCE with in-batch negatives: query i's positive is
    passage i; all other passages in the batch are negatives. ``remat``
    rematerializes each encoder layer in the backward pass (requires
    stacked layer params; see ``encoder.stack_layer_params``)."""
    q_emb = pooled_embeddings(params, q_ids, q_mask, cfg, remat=remat)  # [B, H]
    p_emb = pooled_embeddings(params, p_ids, p_mask, cfg, remat=remat)
    logits = (q_emb @ p_emb.T) / temperature  # [B, B]
    labels = jnp.arange(logits.shape[0])
    loss_qp = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_pq = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return jnp.mean(loss_qp + loss_pq) * 0.5


def make_optimizer(lr: float = 1e-5, weight_decay: float = 0.01):
    """AdamW with the BERT-family decay mask: LayerNorm scales and every
    bias are EXCLUDED from weight decay (decaying norm parameters toward
    zero silently degrades the fine-tune relative to the standard
    recipe). Matrices (embeddings, attention/MLP weights) decay."""

    def decay_mask(params):
        def keep(path, x):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            if name.startswith("ln_") or name.startswith("b"):
                return False
            return x.ndim >= 2

        return jax.tree_util.tree_map_with_path(keep, params)

    return optax.adamw(lr, weight_decay=weight_decay, mask=decay_mask)


def init_train_state(params: Params, optimizer) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def save_train_state(path: str, state: TrainState) -> None:
    """Checkpoint via orbax (SURVEY.md section 5: the reference has no
    model checkpoints; index snapshots live in ``index.store``)."""
    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)


def load_train_state(path: str, template: TrainState) -> TrainState:
    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path), item=template)


def reranker_loss(
    params: Params,
    pair_ids: jax.Array,  # [B*group, T] pair sequences, positives first
    pair_mask: jax.Array,  # [B*group, T]
    cfg: EncoderConfig,
    group: int,
) -> jax.Array:
    """Cross-encoder fine-tuning (the bge-reranker recipe): each query
    contributes ``group`` pairs — its positive chunk at slot 0 followed
    by group-1 hard negatives — and the loss is cross-entropy over the
    group's relevance scores."""
    from outline_rag_tpu.models.reranker import reranker_forward

    scores = reranker_forward(params, pair_ids, pair_mask, cfg)  # [B*group]
    logits = scores.reshape(-1, group)
    labels = jnp.zeros((logits.shape[0],), jnp.int32)
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    )


def make_reranker_train_step(cfg: EncoderConfig, optimizer, group: int):
    """Jittable (state, batch) -> (state, metrics) for the cross-encoder.
    ``batch`` = dict(pair_ids, pair_mask) with group pairs per query."""

    def step(state: TrainState, batch: dict) -> tuple[TrainState, dict]:
        def loss_fn(p):
            return reranker_loss(
                p, batch["pair_ids"], batch["pair_mask"], cfg, group
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            {"loss": loss},
        )

    return step


def lm_loss(
    params: Any,
    tokens: jax.Array,  # [B, S] int32
    mask: jax.Array,  # [B, S] int32 — 1 for real tokens
    cfg: Any,  # DecoderConfig
) -> jax.Array:
    """Next-token cross-entropy for the local decoder (causal LM).

    Runs the full-sequence prefill forward (position 0, fresh cache) and
    scores each position's prediction of the next REAL token; padded
    positions are masked out of the mean. Used to fit the tiny local
    decoder to a corpus (e.g. the realized-speculation rung, where a
    random init never accepts prompt-lookup drafts)."""
    from outline_rag_tpu.models.decoder import decoder_forward, init_cache

    b, s = tokens.shape
    assert s <= cfg.max_cache, (s, cfg.max_cache)
    cache = init_cache(cfg, b)
    logits, _ = decoder_forward(
        params, tokens, cache, jnp.zeros((b,), jnp.int32), cfg
    )
    losses = optax.softmax_cross_entropy_with_integer_labels(
        logits[:, :-1], tokens[:, 1:]
    )
    m = mask[:, 1:].astype(jnp.float32)
    return jnp.sum(losses * m) / jnp.maximum(jnp.sum(m), 1.0)


def make_lm_train_step(cfg: Any, optimizer):
    """Jittable (state, batch) -> (state, metrics) causal-LM step for the
    local decoder. ``batch`` = dict(tokens [B, S], mask [B, S])."""

    def step(state: TrainState, batch: dict) -> tuple[TrainState, dict]:
        def loss_fn(p):
            return lm_loss(p, batch["tokens"], batch["mask"], cfg)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            {"loss": loss},
        )

    return step


def make_train_step(
    cfg: EncoderConfig, optimizer, temperature: float = 0.05, remat: bool = False
):
    """Returns the jittable (state, batch) -> (state, metrics) step.
    ``batch`` = dict(q_ids, q_mask, p_ids, p_mask)."""

    def step(state: TrainState, batch: dict) -> tuple[TrainState, dict]:
        def loss_fn(p):
            return contrastive_loss(
                p,
                batch["q_ids"],
                batch["q_mask"],
                batch["p_ids"],
                batch["p_mask"],
                cfg,
                temperature,
                remat=remat,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        return new_state, {"loss": loss}

    return step
