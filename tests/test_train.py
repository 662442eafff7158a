"""Contrastive training-step tests (data-parallel over the 8-device CPU
mesh, mirroring __graft_entry__.dryrun_multichip)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from outline_rag_tpu.models.encoder import EncoderConfig, init_encoder_params
from outline_rag_tpu.models.train import (
    init_train_state,
    make_optimizer,
    make_train_step,
)
from outline_rag_tpu.parallel.mesh import DATA_AXIS, data_mesh


def _batch(rng, b, s, vocab):
    return {
        "q_ids": jnp.asarray(rng.integers(3, vocab, size=(b, s)).astype(np.int32)),
        "q_mask": jnp.ones((b, s), jnp.int32),
        "p_ids": jnp.asarray(rng.integers(3, vocab, size=(b, s)).astype(np.int32)),
        "p_mask": jnp.ones((b, s), jnp.int32),
    }


def test_loss_decreases():
    cfg = EncoderConfig.tiny()
    params = init_encoder_params(jax.random.key(0), cfg)
    opt = make_optimizer(lr=3e-4)
    state = init_train_state(params, opt)
    step = jax.jit(make_train_step(cfg, opt))
    rng = np.random.default_rng(0)
    batch = _batch(rng, 8, 16, cfg.vocab_size)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # same-batch overfit sanity


def test_dp_sharded_step_matches_single():
    cfg = EncoderConfig.tiny()
    params = init_encoder_params(jax.random.key(0), cfg)
    opt = make_optimizer(lr=1e-4)
    step = make_train_step(cfg, opt)
    rng = np.random.default_rng(1)
    batch = _batch(rng, 8, 16, cfg.vocab_size)

    # single-device result
    s0 = init_train_state(params, opt)
    _, m_single = jax.jit(step)(s0, batch)

    # sharded result
    mesh = data_mesh()
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(DATA_AXIS))
    s1 = jax.device_put(init_train_state(params, opt), repl)
    sharded_batch = {k: jax.device_put(v, shard) for k, v in batch.items()}
    step_jit = jax.jit(
        step,
        in_shardings=(repl, {k: shard for k in batch}),
        out_shardings=(repl, repl),
    )
    _, m_sharded = step_jit(s1, sharded_batch)
    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_sharded["loss"]), rtol=1e-5
    )


def test_checkpoint_roundtrip(tmp_path):
    from outline_rag_tpu.models.train import load_train_state, save_train_state

    cfg = EncoderConfig.tiny()
    params = init_encoder_params(jax.random.key(7), cfg)
    opt = make_optimizer()
    state = init_train_state(params, opt)
    path = str(tmp_path / "ckpt")
    save_train_state(path, state)
    restored = load_train_state(path, state)
    leaves_a = jax.tree_util.tree_leaves(state.params)
    leaves_b = jax.tree_util.tree_leaves(restored.params)
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_remat_scan_train_step_matches():
    from outline_rag_tpu.models.encoder import stack_layer_params

    cfg = EncoderConfig.tiny()
    params = init_encoder_params(jax.random.key(3), cfg)
    opt = make_optimizer(lr=1e-4)
    rng = np.random.default_rng(2)
    batch = _batch(rng, 8, 16, cfg.vocab_size)

    s_list = init_train_state(params, opt)
    _, m_list = jax.jit(make_train_step(cfg, opt))(s_list, batch)

    stacked = stack_layer_params(params)
    s_scan = init_train_state(stacked, opt)
    _, m_scan = jax.jit(make_train_step(cfg, opt, remat=True))(s_scan, batch)
    np.testing.assert_allclose(
        float(m_list["loss"]), float(m_scan["loss"]), rtol=1e-5
    )


def test_reranker_loss_decreases():
    """Cross-encoder fine-tuning: loss falls over steps on a fixed batch."""
    from outline_rag_tpu.models.reranker import init_reranker_params
    from outline_rag_tpu.models.train import make_reranker_train_step

    cfg = EncoderConfig.tiny()
    params = init_reranker_params(jax.random.key(0), cfg)
    opt = make_optimizer(lr=3e-4)
    state = init_train_state(params, opt)
    group = 4
    step = jax.jit(make_reranker_train_step(cfg, opt, group))
    rng = np.random.default_rng(1)
    b, s = 4, 24
    batch = {
        "pair_ids": jnp.asarray(
            rng.integers(3, cfg.vocab_size, size=(b * group, s)).astype(np.int32)
        ),
        "pair_mask": jnp.ones((b * group, s), jnp.int32),
    }
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_lm_loss_decreases_and_model_memorizes():
    """Causal-LM fine-tuning of the local decoder: loss falls on a fixed
    repetitive batch, and the overfit model's greedy next-token
    prediction reproduces the memorized continuation (the property the
    realized-speculation rung relies on: a trained model accepts
    prompt-lookup drafts drawn from quoted context)."""
    from outline_rag_tpu.models.decoder import (
        DecoderConfig,
        decoder_forward,
        fuse_decoder_params,
        init_cache,
        init_decoder_params,
        stack_decoder_params,
    )
    from outline_rag_tpu.models.train import make_lm_train_step

    cfg = DecoderConfig.tiny()
    params = fuse_decoder_params(
        stack_decoder_params(init_decoder_params(jax.random.key(0), cfg))
    )
    opt = make_optimizer(lr=3e-3)
    state = init_train_state(params, opt)
    step = jax.jit(make_lm_train_step(cfg, opt))
    # one repeated 16-token pattern: trivially memorizable
    pat = np.arange(2, 18, dtype=np.int32)
    seq = np.tile(pat, 3)[:32]
    batch = {
        "tokens": jnp.asarray(np.tile(seq, (4, 1))),
        "mask": jnp.ones((4, 32), jnp.int32),
    }
    losses = []
    for _ in range(60):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.25 * losses[0], losses[-1]
    # greedy continuation matches the memorized pattern
    cache = init_cache(cfg, 1)
    logits, _ = decoder_forward(
        state.params,
        jnp.asarray(seq[:16][None, :]),
        cache,
        jnp.zeros((1,), jnp.int32),
        cfg,
    )
    pred = int(jnp.argmax(logits[0, -1]))
    assert pred == int(seq[16])
