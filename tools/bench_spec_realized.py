"""Realized speculative decode: measured acceptance on a TRAINED model.

The r3 record bounded speculation synthetically (0%-accepted 0.70x,
100%-accepted 2.69x at draft_k=4 on the 1.1B shape) because a random
init never agrees with prompt-lookup drafts. This measures the realized
middle on the workload speculation exists for — RAG extraction answers
that quote retrieved context:

1. Train a small decoder (default 8L x 512H, ~30M params) on a
   STREAMING quote-extraction task: ``doc(48 words) [SEP] cue(3-gram
   from doc)`` continues with the 16 words following the cue in the
   doc, then EOS. Docs are fresh every batch, so the model cannot
   memorize text — it must learn the induction behavior itself
   (find the cue in context, copy what follows), which is exactly what
   prompt-lookup speculation (models/decoder.py::propose_ngram) drafts.
2. Run HELD-OUT prompts through the continuous batcher twice,
   interleaved round-robin per the tunnel protocol: plain (spec_k=0)
   vs speculative (spec_k=4, gram=3). Both sample at the serving
   temperature; the speculative output distribution is unchanged by
   construction (tests/test_decoder_spec.py), so any tok/s delta is
   pure verify-step amortization at the REALIZED acceptance rate,
   which the batcher reports (stats()["spec_tokens_per_step"]).

Reports: training loss trajectory, quote accuracy on held-out prompts
(did the model actually learn the task), realized tokens/verify-step,
plain vs spec tok/s and the realized speedup.

Usage: python tools/bench_spec_realized.py [rounds]
Env: STEPS (default 600), BENCH_LAYERS/BENCH_HIDDEN/... shape overrides,
     BENCH_SLOTS (8), BENCH_SPEC_K (4), BENCH_CPU=1 (tiny smoke).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SEP = 2
EOS = 3
WORD0 = 4
DOC_LEN = 48
CUE = 3
# 32-token quoted answers: the batcher's acceptance stat counts every
# scan step of a chunk (a row finishing mid-chunk still "steps"), so
# short generations dilute it — longer answers bound that under ~10%
ANS = 32


def make_example(rng, n_words):
    """(tokens, mask, prompt_len, answer) for one quote-extraction row."""
    import numpy as np

    doc = rng.integers(WORD0, WORD0 + n_words, size=DOC_LEN).astype(np.int32)
    i = int(rng.integers(0, DOC_LEN - CUE - ANS))
    cue = doc[i : i + CUE]
    answer = doc[i + CUE : i + CUE + ANS]
    seq = np.concatenate([doc, [SEP], cue, answer, [EOS]])
    return seq, len(doc) + 1 + CUE, answer


def main() -> None:
    import jax

    smoke = bool(os.environ.get("BENCH_CPU"))
    if smoke:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from outline_rag_tpu.models.decoder import (
        DecoderConfig,
        fuse_decoder_params,
        init_decoder_params,
        stack_decoder_params,
    )
    from outline_rag_tpu.models.train import (
        init_train_state,
        make_lm_train_step,
        make_optimizer,
    )
    from outline_rag_tpu.serve.decode_batcher import DONE, DecodeBatcher

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    # Induction-head formation is lr-critical: the measured CPU sweep
    # (2Lx128H, this task) LEARNS at lr=1e-3 — plateau 6.27 -> 6.11,
    # then the phase transition to 0.27 at ~step 2000 — while lr=3e-3
    # (with or without warmup) never leaves the plateau in 4000-6000
    # steps (the round-4 "quote_accuracy 0.0" runs). Default to 1e-3
    # and train past the transition with an early stop below.
    steps = int(os.environ.get("STEPS", 120 if smoke else 4000))
    slots = int(os.environ.get("BENCH_SLOTS", 4 if smoke else 8))
    spec_k = int(os.environ.get("BENCH_SPEC_K", 4))
    n_words = 768
    cfg = DecoderConfig(
        vocab_size=WORD0 + n_words,
        hidden=int(os.environ.get("BENCH_HIDDEN", 128 if smoke else 512)),
        layers=int(os.environ.get("BENCH_LAYERS", 2 if smoke else 8)),
        heads=int(os.environ.get("BENCH_HEADS", 4 if smoke else 8)),
        kv_heads=int(os.environ.get("BENCH_KV_HEADS", 2 if smoke else 4)),
        intermediate=int(os.environ.get("BENCH_INTER", 256 if smoke else 1408)),
        max_cache=256,
        # train in f32 (AdamW moments inherit the params dtype — bf16
        # moments can stall exactly the small-gradient accumulation the
        # pre-transition phase runs on); the serving cast happens after.
        # BENCH_TRAIN_BF16=1 opts into bf16 training for shapes whose
        # f32 tree + moments exceed HBM (the 1.1B realized rung).
        dtype=(jnp.bfloat16 if os.environ.get("BENCH_TRAIN_BF16")
               else jnp.float32),
    )
    seq_len = DOC_LEN + 1 + CUE + ANS + 1  # 69
    batch = int(os.environ.get("BENCH_B", 16 if smoke else 32))

    params = fuse_decoder_params(
        stack_decoder_params(init_decoder_params(jax.random.key(0), cfg))
    )
    opt = make_optimizer(lr=float(os.environ.get("LR", 1e-3)))
    state = init_train_state(params, opt)
    step = jax.jit(make_lm_train_step(cfg, opt))

    rng = np.random.default_rng(0)

    def make_batch():
        toks = np.zeros((batch, seq_len), np.int32)
        mask = np.zeros((batch, seq_len), np.int32)
        for j in range(batch):
            seq, plen, _ = make_example(rng, n_words)
            toks[j, : len(seq)] = seq
            # score only the answer+EOS: the doc itself is random noise
            # (unlearnable), and training on it just burns signal
            mask[j, plen : len(seq)] = 1
        return {"tokens": jnp.asarray(toks), "mask": jnp.asarray(mask)}

    t0 = time.perf_counter()
    losses = []
    trained_steps = steps
    for s in range(steps):
        state, metrics = step(state, make_batch())
        if s % max(1, steps // 20) == 0 or s == steps - 1:
            losses.append(round(float(metrics["loss"]), 4))
            print(f"# step {s}: loss {losses[-1]}", file=sys.stderr, flush=True)
            # early stop once well past the induction transition: the
            # streaming loss lands near 0.3 and only drifts after
            if not smoke and losses[-1] < 0.35 and s >= steps // 4:
                trained_steps = s + 1
                break
    train_s = time.perf_counter() - t0
    tparams = state.params
    if not smoke:
        # serving dtype: the batcher runs the production bf16 config
        from outline_rag_tpu.models.decoder import cast_decoder_params

        cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
        tparams = cast_decoder_params(tparams, jnp.bfloat16)

    # ---- held-out prompts (fresh docs: the task must have generalized)
    eval_rng = np.random.default_rng(10_000)
    n_eval = slots * 4
    prompts, answers = [], []
    for _ in range(n_eval):
        seq, plen, ans = make_example(eval_rng, n_words)
        prompts.append([int(t) for t in seq[:plen]])
        answers.append(ans)

    max_new = ANS + 8

    def run_batcher(sk: int, prompt_rows, tag: int):
        b = DecodeBatcher(
            tparams, cfg, slots=slots,
            chunk_tokens=int(os.environ.get("BENCH_CHUNK", 8)),
            eos_id=EOS,
            spec_k=sk, prompt_buckets=(64, 128, 256),
        )
        try:
            t0 = time.perf_counter()
            qs = [
                b.submit(p, 0.7, 0.95, max_new, seed=tag * 1000 + j)
                for j, p in enumerate(prompt_rows)
            ]
            outs = []
            n_tok = 0
            for q in qs:
                toks = []
                while True:
                    item = q.get(timeout=600)
                    if item is DONE:
                        break
                    if isinstance(item, Exception):
                        raise item
                    toks.extend(item)
                n_tok += len(toks)
                outs.append(toks)
            wall = time.perf_counter() - t0
            stats = b.stats()
            return outs, n_tok / wall, stats
        finally:
            b.close()

    def quote_acc(outs, idxs):
        """Fraction of rows whose first ANS generated tokens equal the
        doc continuation exactly (the learned-extraction check)."""
        ok = 0
        for o, i in zip(outs, idxs):
            want = [int(t) for t in answers[i]]
            if o[: len(want)] == want:
                ok += 1
        return ok / len(outs)

    best = {"plain": 0.0, "spec": 0.0}
    acc_rates, accs = [], []
    for r in range(rounds):
        idxs = [(r * slots + j) % n_eval for j in range(slots)]
        rows = [prompts[i] for i in idxs]
        o_p, tps_p, _ = run_batcher(0, rows, tag=2 * r)
        o_s, tps_s, st = run_batcher(spec_k, rows, tag=2 * r + 1)
        best["plain"] = max(best["plain"], tps_p)
        best["spec"] = max(best["spec"], tps_s)
        if st.get("spec_tokens_per_step"):
            acc_rates.append(st["spec_tokens_per_step"])
        accs.append(quote_acc(o_s, idxs))
        print(
            f"[round {r + 1}/{rounds}] plain={tps_p:.1f} spec={tps_s:.1f} "
            f"tok/s accept={st.get('spec_tokens_per_step')} "
            f"quote_acc={accs[-1]:.2f}",
            file=sys.stderr, flush=True,
        )

    print(
        json.dumps(
            {
                "metric": (
                    f"realized speculative decode (trained "
                    f"{cfg.layers}Lx{cfg.hidden}H extraction model, "
                    f"draft_k={spec_k}, {slots} slots)"
                ),
                "backend": jax.default_backend(),
                "train_steps": trained_steps,
                "train_s": round(train_s, 1),
                "loss_first": losses[0],
                "loss_last": losses[-1],
                "quote_accuracy": round(float(np.mean(accs)), 3),
                "tokens_per_verify_step": (
                    round(float(np.mean(acc_rates)), 3) if acc_rates else None
                ),
                "plain_tok_s": round(best["plain"], 1),
                "spec_tok_s": round(best["spec"], 1),
                "realized_speedup": (
                    round(best["spec"] / best["plain"], 2)
                    if best["plain"] else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
