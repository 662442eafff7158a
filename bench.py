"""Retrieval-core benchmark.

Measures the fused score+top-K kernel (the pgvector replacement) on the
available accelerator: query throughput over an N x 1024 corpus at
TOP_K=12 (the reference's retrieval configuration, BASELINE.md), checked
for exact recall@12 against the on-device oracle, and compared against a
single-host NumPy exact scan (the stand-in for the reference's
CPU/pgvector exact path; pgvector publishes no numbers — BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Env knobs: BENCH_N (corpus rows, default 1M on TPU / 20k on CPU),
BENCH_B (query batch, default 32),
BENCH_DTYPE (int8r|int8|float32|f32x2|bfloat16; TPU default int8r — the
fastest mode whose ranking is fp32-oracle-exact, VERDICT r4 #3).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def bench_encode() -> None:
    """BENCH_SCENARIO=encode: index-build throughput of the bge-m3-size
    encoder (24L x 1024H, bf16) — BASELINE.md ladder rung 3."""
    import time

    import jax
    import jax.numpy as jnp

    from outline_rag_tpu.models.encoder import (
        EncoderConfig,
        cast_params,
        init_encoder_params,
        pooled_embeddings,
    )

    from outline_rag_tpu.models.encoder import (
        maybe_fuse_encoder_params,
        stack_layer_params,
    )

    cfg = EncoderConfig.bge_m3()
    # trunk layout follows the shipped serving policy (unfused by
    # default — fusion measured 0.92x at this shape; ORT_ENCODER_FUSE=1
    # opts in), so this scenario measures the config engine/embedder.py
    # actually runs
    params = stack_layer_params(
        maybe_fuse_encoder_params(
            cast_params(init_encoder_params(jax.random.key(0), cfg), jnp.bfloat16)
        )
    )
    # BENCH_INT8=1: w8a8 trunk (ENCODER_INT8 serving config) — int8 MXU
    # dots at the encoder's large-M shapes
    enc_int8 = bool(os.environ.get("BENCH_INT8"))
    if enc_int8:
        from outline_rag_tpu.models.encoder import quantize_encoder_params

        params = quantize_encoder_params(params)
    fwd = jax.jit(lambda p, ids, mask: pooled_embeddings(p, ids, mask, cfg))
    b, s = int(os.environ.get("BENCH_B", 64)), int(os.environ.get("BENCH_S", 256))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, size=(b, s)).astype(np.int32))
    mask = jnp.ones((b, s), jnp.int32)

    # chained-execution timing (see the retrieval bench below): each
    # iteration's input GENUINELY varies (token ids shifted by the
    # iteration index AND a data-dependent carry) so no layer can serve
    # cached results — bit-identical repeats violate the tunnel protocol
    # (CLAUDE.md) and have produced impossible readings.
    def chained(iters, salt):
        carry = jnp.int32(0)
        for i in range(iters):
            shifted = 3 + (ids + i + salt + carry) % (cfg.vocab_size - 3)
            out = fwd(params, shifted, mask)
            # low mantissa bits of the (unit-norm) embedding vary per input
            carry = (jnp.abs(out[0, 0]) * 1e6).astype(jnp.int32) % 7
        return float(carry)

    from outline_rag_tpu.utils.benchproto import (
        encoder_matmul_flops,
        two_point_dt,
    )

    chained(1, 0)  # compile + warm
    iters = 8
    # FLOPs roofline guard: a reading implying more than the chip's peak
    # is a tunnel artifact — retry (shared model: benchproto).
    flops_per_iter = encoder_matmul_flops(cfg, b, s)
    peak_flops = 500e12  # above any v5e bf16 peak
    dt = None
    cand = None
    for attempt in range(3):
        t0 = time.perf_counter()
        chained(1, 100 + attempt)
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        chained(1 + iters, 200 + attempt)
        t_long = time.perf_counter() - t0
        cand = two_point_dt(t_short, t_long, 1, 1 + iters)
        if cand is None:
            print(
                "# tunnel window shifted mid-round: encoder pair discarded",
                file=sys.stderr,
            )
            continue
        if flops_per_iter / cand <= peak_flops:
            dt = cand
            break
        print(
            f"# impossible encoder reading discarded "
            f"({flops_per_iter / cand / 1e12:.0f} TFLOP/s)",
            file=sys.stderr,
        )
    if dt is None:
        if cand is None:  # every pair swung: overhead-inclusive fallback
            t0 = time.perf_counter()
            chained(iters, 300)
            cand = (time.perf_counter() - t0) / iters
        dt = cand  # no plausible pair: report, labeled below
    print(
        json.dumps(
            {
                "metric": (
                    f"bge-m3-size encoder throughput (batch {b}, seq {s}, "
                    f"{'int8 w8a8' if enc_int8 else 'bf16'})"
                ),
                "value": round(b / dt, 1),
                "unit": "chunks/s",
                "vs_baseline": None,
                "implied_tflops": round(flops_per_iter / dt / 1e12, 1),
                "window": (
                    "healthy"
                    if flops_per_iter / dt <= peak_flops else "impossible"
                ),
            }
        )
    )


def _tunnel_alive(timeout_s: int = 240, attempts: int = 3) -> bool:
    """Probe the TPU tunnel in a SUBPROCESS with a hard timeout.

    Backend initialization itself goes through the remote tunnel and can
    block indefinitely when the tunnel is down (observed dead for 9+
    hours straight); a blocked JAX call cannot be interrupted in-process.
    Probing in a child keeps the parent clean: on failure we emit an
    honest, parseable result line instead of hanging the whole harness
    past the driver's patience with no output at all.

    Retries with a pause: the tunnel's failure windows are often
    minutes-long blips (measured 2026-08-21: a healthy-execution window
    whose remote COMPILER threw HTTP 500s for ~8 minutes, then
    recovered) — one-shot probing recorded two false tunnel-dead zeros
    for the round-4/5 headline task.
    """
    import subprocess

    for attempt in range(attempts):
        if attempt:
            time.sleep(60)
        try:
            r = subprocess.run(
                [
                    sys.executable,
                    "-c",
                    # default_backend() is always a non-empty string once
                    # init succeeds, so "is it truthy" was vacuous: a fast-
                    # failing axon plugin silently falls back to CPU and the
                    # probe child would pass, recording CPU throughput as a
                    # TPU result. Require a non-CPU backend explicitly.
                    "import jax, jax.numpy as jnp; "
                    "x = jnp.ones((64, 64)); float(jnp.sum(x @ x)); "
                    "import sys; "
                    "sys.exit(0 if jax.default_backend() != 'cpu' else 1)",
                ],
                timeout=timeout_s,
                capture_output=True,
            )
            if r.returncode == 0:
                return True
        except Exception:
            pass
    return False


def main() -> None:
    # Fail fast and honestly when the tunnel is dead: a hung benchmark
    # records nothing; a labeled zero records what happened. Skipped when
    # the caller already forced the CPU backend (tests, smokes) — the
    # probe child would still try the tunnel and misreport.
    import jax

    try:
        _plats = (jax.config.jax_platforms or "").strip()
    except Exception:
        _plats = ""
    if (
        _plats != "cpu"
        and not os.environ.get("BENCH_SKIP_PROBE")
        and not _tunnel_alive()
    ):
        _enc = os.environ.get("BENCH_SCENARIO") == "encode"
        print(
            json.dumps(
                {
                    "metric": (
                        ("encoder" if _enc else "retrieval")
                        + " benchmark not run: TPU tunnel dead (backend "
                        "probe timed out or fell back to CPU)"
                    ),
                    "value": 0,
                    "unit": "chunks/s" if _enc else "queries/s",
                    "vs_baseline": None,
                    "window": "tunnel-dead",
                }
            )
        )
        return
    if os.environ.get("BENCH_SCENARIO") == "encode":
        bench_encode()
        return
    import jax
    import jax.numpy as jnp

    from outline_rag_tpu.ops.topk import topk_pallas, topk_xla

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    # headline rung: 1M x 1024 — the production-scale rung the fused
    # Pallas kernel actually serves (~625 GB/s f32x2). At 100k the auto
    # policy correctly routes to the XLA 3-pass fallback (score_bytes
    # under the 48 MB crossover), so benchmarking 100k measured the
    # fallback while the README talked about the kernel (VERDICT r2
    # weak #2) — the headline now measures the rung the kernel owns.
    n = int(os.environ.get("BENCH_N", 1_000_000 if on_tpu else 20_000))
    # TPU default batch 128 (round 5): the serving reality is batched
    # queries, and the scan amortizes per-dispatch cost over B — the
    # same-window ladder (docs/ROUND5.md) measured int8r 1M at B=32 =
    # 5,021 q/s vs B=128 = 15,701 q/s, recall@12 1.000 at both. B is
    # printed in the metric line so cross-round rows stay comparable.
    b = int(os.environ.get("BENCH_B", 128 if on_tpu else 32))
    d = int(os.environ.get("BENCH_D", 1024))
    k = 12
    block_n = 1024
    n = (n // block_n) * block_n
    # TPU default int8r (round 5): two-plane int8 storage — the scan
    # reads one byte/element (4x the f32 scan bandwidth) and the top-64
    # rescore dequantizes q1*s + q2*(s/254), which measured fp32-oracle-
    # exact ranking (ops/quant.py::quantize_rows_int8_residual). The
    # recall check below is against the TRUE fp32 oracle, so the
    # pgvector-exact-parity claim (reference app/database.py:137-138)
    # is what the driver's number certifies. float32 (the round-3/4
    # default: Precision.HIGHEST scoring, exact by construction) and
    # the other modes stay selectable; CPU runs keep float32 (no pallas
    # kernel off-TPU, and tests pin that configuration).
    dtype_name = os.environ.get(
        "BENCH_DTYPE", "int8r" if on_tpu else "float32"
    )
    int8_mode = dtype_name in ("int8", "int8r")
    residual_mode = dtype_name == "int8r"
    f32x2_mode = dtype_name == "f32x2"
    dtype = {
        "float32": jnp.float32,
        "f32x2": jnp.float32,  # queries stay f32; corpus splits below
        "bfloat16": jnp.bfloat16,
        "int8": jnp.float32,  # int8 quantizes below
        "int8r": jnp.float32,  # two-plane int8 quantizes below
    }[dtype_name]

    key = jax.random.key(0)
    kc, kq = jax.random.split(key)
    corpus_scales = None
    # int8 sweep strategy: "oneprog" (default) stores the corpus as ONE
    # contiguous [N, D] int8 buffer and lets topk_pallas's windowed
    # segmentation run every >4M-row launch + merge inside one jitted
    # program (zero per-segment host dispatches — the r3 10M rung lost
    # ~6x to eager dispatch through the remote tunnel). "eager" keeps the
    # r3 per-segment dispatch for A/B.
    sweep_mode = os.environ.get("BENCH_SWEEP", "oneprog")
    corpus_residual = None
    res_placement = "device"
    seg_keys = offs = None
    # 2 GB f32 staging per generation step (env-overridable so the
    # segment-merge oracle path is testable at CPU-size corpora)
    GEN = int(os.environ.get("BENCH_GEN", 1024 * 512))
    if int8_mode and (residual_mode or sweep_mode == "oneprog"):
        import functools

        from outline_rag_tpu.ops.quant import (
            quantize_rows_int8,
            quantize_rows_int8_residual,
        )

        # generate+quantize straight into the donated contiguous buffer:
        # peak device memory = int8 corpus + one generation segment's
        # f32 staging (a 10M-row f32 staging matrix alone would be 40 GB)

        @functools.partial(jax.jit, donate_argnums=(0, 1),
                           static_argnames=("rows",))
        def gen_into(buf, scl, k_seg, off, *, rows):
            seg = jax.random.normal(k_seg, (rows, d), jnp.float32)
            seg = seg / jnp.linalg.norm(seg, axis=1, keepdims=True)
            q8, s8 = quantize_rows_int8(seg)
            return (
                jax.lax.dynamic_update_slice(buf, q8, (off, 0)),
                jax.lax.dynamic_update_slice(scl, s8, (off,)),
            )

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2),
                           static_argnames=("rows",))
        def gen_into_r(buf, scl, res, k_seg, off, *, rows):
            seg = jax.random.normal(k_seg, (rows, d), jnp.float32)
            seg = seg / jnp.linalg.norm(seg, axis=1, keepdims=True)
            q1, s8, q2 = quantize_rows_int8_residual(seg)
            return (
                jax.lax.dynamic_update_slice(buf, q1, (off, 0)),
                jax.lax.dynamic_update_slice(scl, s8, (off,)),
                jax.lax.dynamic_update_slice(res, q2, (off, 0)),
            )

        # BENCH_RESIDUAL=host (int8r only): the HOST RESCORE TIER — the
        # q2 plane lives in the host's RAM as plain numpy; the device
        # runs the q1 scan + candidate select + q1-part rescore
        # (ops/quant.py::int8_topk_candidates) and the host finishes
        # with the residual correction + final top-k
        # (ops/hostres.py::host_residual_topk). This is the >HBM exact
        # rung design: the earlier pinned_host in-program gather was
        # MEASURED OUT (tools/probe_hostres.py ratio 3.64 = hidden
        # plane-scaled cost; probe_hostres2.py: every alternative
        # in-program structure aborts on this runtime).
        if residual_mode:
            res_placement = os.environ.get("BENCH_RESIDUAL", "device")
            if res_placement.startswith("host"):
                res_placement = "host"

        @functools.partial(jax.jit, donate_argnums=(0, 1),
                           static_argnames=("rows",))
        def gen_into_r2(buf, scl, k_seg, off, *, rows):
            # host-tier generation: q1/scales into donated device
            # buffers, the q2 segment RETURNED for host-RAM assembly
            seg = jax.random.normal(k_seg, (rows, d), jnp.float32)
            seg = seg / jnp.linalg.norm(seg, axis=1, keepdims=True)
            q1, s8, q2 = quantize_rows_int8_residual(seg)
            return (
                jax.lax.dynamic_update_slice(buf, q1, (off, 0)),
                jax.lax.dynamic_update_slice(scl, s8, (off,)),
                q2,
            )

        corpus = jnp.zeros((n, d), jnp.int8)
        corpus_scales = jnp.zeros((n,), jnp.float32)
        host_q2 = None
        if residual_mode and res_placement == "host":
            host_q2 = np.empty((n, d), np.int8)
        elif residual_mode:
            corpus_residual = jnp.zeros((n, d), jnp.int8)
        offs = list(range(0, n, GEN))
        seg_keys = jax.random.split(kc, len(offs))
        for k_seg, off in zip(seg_keys, offs):
            rows_seg = min(GEN, n - off)
            if residual_mode and res_placement == "host":
                corpus, corpus_scales, q2_seg = gen_into_r2(
                    corpus, corpus_scales, k_seg, jnp.int32(off),
                    rows=rows_seg,
                )
                host_q2[off:off + rows_seg] = np.asarray(q2_seg)
            elif residual_mode:
                corpus, corpus_scales, corpus_residual = gen_into_r(
                    corpus, corpus_scales, corpus_residual, k_seg,
                    jnp.int32(off), rows=rows_seg,
                )
            else:
                corpus, corpus_scales = gen_into(
                    corpus, corpus_scales, k_seg, jnp.int32(off),
                    rows=rows_seg,
                )
        int8_segments = [(corpus, corpus_scales, 0)]
    elif int8_mode:
        # quantize in segments: a 10M-row f32 staging matrix would be
        # 40 GB; int8 codes + scales fit a single chip at 10M rows
        from outline_rag_tpu.ops.quant import quantize_rows_int8

        # segment size MUST be a block_n multiple: ops/quant.py routes
        # impl="pallas" to the XLA fallback when n % block_n != 0, so a
        # 1,000,000-row segment would silently benchmark XLA as "pallas"
        SEG = 999_424  # 976 * 1024

        @jax.jit
        def gen_int8(k_seg):
            seg = jax.random.normal(k_seg, (min(n, SEG), d), jnp.float32)
            seg = seg / jnp.linalg.norm(seg, axis=1, keepdims=True)
            return quantize_rows_int8(seg)

        # kept as segments: a device-side concat would peak at 2x the
        # corpus bytes, and the XLA oracle's [B, N] scores at 10M rows
        # are another 5 GB — per-segment top-K + on-device merge keeps
        # peak memory at corpus + one segment's scores.
        int8_segments = []  # (codes, scales, row_offset)
        remaining, offset = n, 0
        for k_seg in jax.random.split(kc, (n + SEG - 1) // SEG):
            cq, cs = gen_int8(k_seg)
            take = min(remaining, cq.shape[0])
            int8_segments.append((cq[:take], cs[:take], offset))
            offset += take
            remaining -= take
        corpus, corpus_scales = int8_segments[0][0], int8_segments[0][1]
    else:
        corpus = jax.random.normal(kc, (n, d), jnp.float32)
        corpus = corpus / jnp.linalg.norm(corpus, axis=1, keepdims=True)
        if f32x2_mode:
            from outline_rag_tpu.ops.topk import split_f32_bf16x2

            corpus_f32 = corpus  # kept for the exact oracle check
            corpus = split_f32_bf16x2(corpus)  # [N, 2D] bf16, same bytes
        else:
            corpus = corpus.astype(dtype)
    # distinct query batches per iteration so no layer (device, tunnel,
    # runtime) can serve cached results
    n_batches = 20
    qbatches = jax.random.normal(kq, (n_batches, b, d), jnp.float32)
    qbatches = (
        qbatches / jnp.linalg.norm(qbatches, axis=-1, keepdims=True)
    ).astype(dtype)
    jax.block_until_ready((corpus, qbatches))
    queries = qbatches[0]

    mode = os.environ.get("BENCH_MODE", "auto")  # auto | pallas | xla

    if int8_mode:
        from outline_rag_tpu.ops.quant import (
            int8_topk,
            int8_topk_xla,
            quantize_rows_int8,
        )
        from outline_rag_tpu.ops.topk import merge_topk

        def _int8_sweep(q, segments, impl):
            qq, qs = quantize_rows_int8(q)
            acc = None
            for codes, scales, off in segments:
                if impl == "xla":
                    v, i = int8_topk_xla(qq, qs, codes, scales, k)
                else:
                    v, i = int8_topk(qq, qs, codes, scales, k, impl=impl)
                i = i + off
                acc = (v, i) if acc is None else merge_topk(*acc, v, i, k)
            return acc

        if residual_mode and res_placement == "host":
            # int8r HOST TIER: one device program (quantize + one-byte
            # q1 scan + candidate gather + exact q1-part rescore)
            # returning [B, m] candidates; the host adds the residual
            # correction from the numpy q2 plane and takes the final
            # top-k (ops/hostres.py). Exact like the fused path; the
            # true-fp32-oracle recall check below certifies it.
            import functools as _ft

            from outline_rag_tpu.ops.hostres import host_residual_topk
            from outline_rag_tpu.ops.quant import int8_topk_candidates

            rescore_m = int(os.environ.get("BENCH_RESCORE_M", 64))

            @_ft.partial(jax.jit, static_argnames=("impl",))
            def _int8r_cand(q, codes, scales, *, impl):
                qq, qs = quantize_rows_int8(q)
                return int8_topk_candidates(
                    qq, qs, codes, scales, rescore_m,
                    rescore_queries=q, impl=impl,
                )

            def int8r_cand(q, impl="auto"):
                if impl == "auto":
                    impl = "pallas" if on_tpu else "xla"
                return _int8r_cand(q, corpus, corpus_scales, impl=impl)

            def int8r_host_finish(sc, idx, scl, q_host):
                return host_residual_topk(
                    np.asarray(sc), np.asarray(idx), np.asarray(scl),
                    q_host, host_q2, k,
                )

            def int8_sweep(q, impl):
                # eager full path (recall check / warm); the timed loop
                # uses the stacked-fetch pipeline in chained() below
                sc, idx, scl = int8r_cand(q, impl)
                return int8r_host_finish(sc, idx, scl, np.asarray(q))
        elif residual_mode:
            # int8r: quantized one-byte scan over q1 for max(k, 64)
            # candidates, then the two-plane fp32 rescore — ranking is
            # fp32-oracle-exact (ops/quant.py residual math), certified
            # by the true-fp32-oracle recall check below. One program:
            # quantize + scan + gather + rescore + final top-k.
            import functools as _ft

            rescore_m = int(os.environ.get("BENCH_RESCORE_M", 64))

            @_ft.partial(jax.jit, static_argnames=("impl",))
            def _int8r_oneprog(q, codes, scales, res, *, impl):
                qq, qs = quantize_rows_int8(q)
                return int8_topk(
                    qq, qs, codes, scales, k,
                    impl=impl, rescore_queries=q, rescore_m=rescore_m,
                    rescore_residual=res,
                )

            def int8_sweep(q, impl):
                if impl == "auto":
                    impl = "pallas" if on_tpu else "xla"
                return _int8r_oneprog(
                    q, corpus, corpus_scales, corpus_residual, impl=impl,
                )
        elif sweep_mode == "oneprog":
            # the whole sweep (quantize + every windowed segment launch +
            # on-device merges) traces into ONE program: topk_pallas's
            # windowed segmentation reads the contiguous buffer via
            # BlockSpec row offsets, so there are no slice copies and no
            # per-segment dispatches through the remote tunnel
            import functools as _ft

            @_ft.partial(jax.jit, static_argnames=("impl",))
            def _int8_oneprog(q, codes, scales, *, impl):
                qq, qs = quantize_rows_int8(q)
                if impl == "xla":
                    return int8_topk_xla(qq, qs, codes, scales, k)
                return int8_topk(qq, qs, codes, scales, k, impl=impl)

            def int8_sweep(q, impl):
                return _int8_oneprog(
                    q, corpus, corpus_scales,
                    impl="pallas" if impl == "auto" else impl,
                )
        else:
            # eager per-segment dispatch (r3 behavior, BENCH_SWEEP=eager):
            # each segment launch + rebase + merge is its own host
            # round-trip through the remote tunnel
            def int8_sweep(q, impl):
                return _int8_sweep(q, int8_segments, impl)

    def run_fused_q(q):
        if int8_mode:
            return int8_sweep(q, mode if mode in ("pallas", "xla") else "auto")
        if mode == "pallas":
            return topk_pallas(q, corpus, k, block_n=block_n, interpret=not on_tpu)
        if mode == "xla":
            if f32x2_mode:
                from outline_rag_tpu.ops.topk import topk_xla_compensated

                return topk_xla_compensated(q, corpus, k)
            return topk_xla(q, corpus, k)
        from outline_rag_tpu.ops.topk import cosine_topk

        return cosine_topk(q, corpus, k, block_n=block_n)

    # resolve which implementation auto actually runs at THIS shape, so
    # the published label names the timed path (auto used to be labeled
    # "fused" even when the policy served the XLA fallback)
    if mode in ("pallas", "xla"):
        resolved_impl = mode
    elif int8_mode:
        resolved_impl = "pallas" if on_tpu else "xla"  # ops/quant policy
        if residual_mode:
            resolved_impl += "+rescore"
            if res_placement.startswith("host"):
                resolved_impl += ":hostres"
    else:
        from outline_rag_tpu.ops.topk import auto_impl

        resolved_impl = auto_impl(
            b, n, d, jnp.dtype(corpus.dtype).itemsize, f32x2_mode, block_n
        )

    # correctness: recall@12 of the TIMED path vs the XLA oracle on the
    # same device (validating a path the benchmark never runs would let
    # a regression in the timed one pass unnoticed)
    vals, idx = jax.block_until_ready(run_fused_q(queries))
    if residual_mode:
        # TRUE fp32 oracle — not the int8 oracle: regenerate the f32
        # corpus segment-by-segment with the same keys the quantizer
        # consumed (peak memory = one 2 GB segment, so the check works
        # at corpus sizes whose f32 form never fits), exact-score each
        # segment with Precision.HIGHEST, merge on device. recall@12
        # here IS the pgvector-exact-parity claim for the int8r mode.
        import functools as _ft2

        @_ft2.partial(jax.jit, static_argnames=("rows",))
        def _regen(k_seg, *, rows):
            seg = jax.random.normal(k_seg, (rows, d), jnp.float32)
            return seg / jnp.linalg.norm(seg, axis=1, keepdims=True)

        acc = None
        for k_seg, off in zip(seg_keys, offs):
            seg = _regen(k_seg, rows=min(GEN, n - off))
            v, i2 = topk_xla(queries, seg, k)
            i2 = (i2 + off).astype(jnp.int32)
            acc = (v, i2) if acc is None else merge_topk(*acc, v, i2, k)
        ovals, oidx = jax.block_until_ready(acc)
    elif int8_mode:
        ovals, oidx = jax.block_until_ready(int8_sweep(queries, "xla"))
    elif f32x2_mode:
        # oracle = true fp32 HIGHEST scoring of the unsplit corpus: the
        # pgvector-exact-parity claim is measured against it directly
        ovals, oidx = jax.block_until_ready(topk_xla(queries, corpus_f32, k))
    else:
        ovals, oidx = jax.block_until_ready(topk_xla(queries, corpus, k))
    recall = float(
        np.mean(
            [
                len(set(np.asarray(idx)[i]) & set(np.asarray(oidx)[i])) / k
                for i in range(b)
            ]
        )
    )

    # throughput: iterations are CHAINED by a data dependency (each batch
    # perturbed by the previous result) and the final scalar is fetched —
    # this forces every sweep to actually execute even on lazy/remote
    # runtimes where block_until_ready is a no-op and unfetched results
    # are never computed.
    iters = 20 if on_tpu else 3

    _salt = [0]

    host_tier = residual_mode and res_placement == "host"
    # one-time exact copy of the query batches for the host finish
    # (outside the timed section; ~10 MB)
    qbatches_np = np.asarray(qbatches) if host_tier else None

    def chained(iters):
        # every batch carries a REAL, dtype-visible offset that differs
        # per iteration AND per call (bounded so query norms stay ~1):
        # bit-identical repeats can be served by a caching tunnel layer,
        # and 1e-3 clears the bf16 ulp at unit-norm entry magnitudes.
        # The carry term keeps the data-dependency chain that forces
        # execution on the lazy tunnel.
        carry = jnp.float32(0)
        if not host_tier:
            for i in range(iters):
                _salt[0] += 1
                off = (carry * 1e-9 + (_salt[0] % 97 + 1) * 1e-3).astype(dtype)
                q = qbatches[i % n_batches] + off
                v, _ = run_fused_q(q)
                carry = carry + jnp.sum(v)
            return carry
        # HOST TIER: chain the device candidate programs (same
        # dependency discipline), then ONE stacked fetch + the host
        # residual finish for every iteration. The fetch bytes and the
        # host work both scale with iters, so the two-point subtraction
        # keeps the full per-batch host-tier cost in the published
        # number (production shape: per-batch PCIe candidate traffic +
        # host rescore, pipelined against the next device scan).
        # The query batches are NOT fetched per iteration: the host
        # reconstructs q = qbatches[i] + off bit-exactly (one f32 IEEE
        # elementwise add on both sides) from the one-time qbatches
        # fetch and the stacked per-iter off scalars — candidates
        # + 4 B/iter cross the boundary instead of the 512 KB batch.
        scs, idxs, scls, offs_d = [], [], [], []
        for i in range(iters):
            _salt[0] += 1
            off = (carry * 1e-9 + (_salt[0] % 97 + 1) * 1e-3).astype(dtype)
            q = qbatches[i % n_batches] + off
            sc, ix, scl = int8r_cand(
                q, mode if mode in ("pallas", "xla") else "auto"
            )
            carry = carry + jnp.sum(sc)
            scs.append(sc), idxs.append(ix), scls.append(scl)
            offs_d.append(off)
        sc_h = np.asarray(jnp.stack(scs))
        ix_h = np.asarray(jnp.stack(idxs))
        scl_h = np.asarray(jnp.stack(scls))
        off_h = np.asarray(jnp.stack(offs_d))
        tot = 0.0
        for i in range(iters):
            q_h = qbatches_np[i % n_batches] + off_h[i]
            v, _ = int8r_host_finish(sc_h[i], ix_h[i], scl_h[i], q_h)
            tot += float(v.sum())
        return float(carry) + tot

    float(chained(1))  # warm/compile + one round-trip
    # tunnel health marker: a TINY matmul round trip (~50 ms healthy).
    # Timing a full corpus sweep here misclassified large corpora as
    # "degraded" on a healthy tunnel (a 10M-row sweep alone exceeds the
    # 0.5 s health threshold). The probe input varies per call so a
    # result-caching layer cannot serve the timed repeat.
    _probe_base = jnp.ones((256, 256), jnp.float32)

    def probe_rtt(i: int) -> float:
        x = _probe_base + np.float32(i)
        t0 = time.perf_counter()
        float(jnp.sum(x @ x))
        return time.perf_counter() - t0

    probe_rtt(0)  # warm the probe programs
    tunnel_rtt = probe_rtt(1)
    # the tunnel's throughput swings 2-4x on a seconds timescale and its
    # host round-trip has been observed anywhere from 50 ms to ~4 s —
    # far larger than the compute under test. Two-point protocol: time a
    # short and a long chained run (one fetch each); the round-trip
    # cancels exactly in the difference, so only sweep time remains.
    # Best-of-rounds guards the residual window-to-window swing.
    round_dts: list = []

    def measure_rounds(rounds):
        best = float("inf")
        for _ in range(rounds):
            t0 = time.perf_counter()
            a = float(chained(short))
            t_short = time.perf_counter() - t0
            t0 = time.perf_counter()
            total = float(chained(iters + short))
            t_long = time.perf_counter() - t0
            assert np.isfinite(a) and np.isfinite(total)
            if t_long <= t_short:  # window shifted mid-round: discard
                continue
            round_dts.append((t_long - t_short) / iters)
            best = min(best, round_dts[-1])
        return best

    short = 2
    best_dt = measure_rounds(
        int(os.environ.get("BENCH_ROUNDS", 4)) if on_tpu else 1)
    if on_tpu and tunnel_rtt > 2.0:
        # catastrophic tunnel window (RTTs of minutes have been
        # observed): wait briefly and retry once — a fair window may be
        # one oscillation away, and the retry is bounded (~2 min)
        print(
            f"# degraded tunnel (rtt {tunnel_rtt:.1f}s): retrying once",
            file=sys.stderr,
        )
        time.sleep(60)
        # re-probe with the TINY matmul (chained(1) is a full corpus
        # sweep — its time is not an RTT and would corrupt both the
        # retry decision and the published tunnel_rtt_s/window label)
        rtt2 = probe_rtt(2)
        if rtt2 < tunnel_rtt:
            tunnel_rtt = rtt2
            best_dt = min(best_dt, measure_rounds(2))
    # physical sanity: a sweep must at least stream the corpus once from
    # HBM (v5e ~819 GB/s). Readings past the roofline mean a tunnel layer
    # served cached/overlapped work — they measure nothing. Label, and
    # fall back to the best PLAUSIBLE round.
    corpus_bytes = float(n) * d * (
        1 if int8_mode else 2 if dtype_name == "bfloat16" else 4)
    roofline_dt = corpus_bytes / 850e9  # 850 GB/s: roofline + margin
    impossible = on_tpu and np.isfinite(best_dt) and best_dt < roofline_dt
    if impossible:
        plausible = [dt for dt in round_dts if dt >= roofline_dt]
        print(
            f"# IMPOSSIBLE reading discarded: {best_dt * 1e3:.2f} ms/sweep "
            f"< roofline {roofline_dt * 1e3:.2f} ms "
            f"({len(plausible)}/{len(round_dts)} rounds plausible)",
            file=sys.stderr,
        )
        best_dt = min(plausible) if plausible else float("inf")

    if not np.isfinite(best_dt):  # every round degenerate: fall back
        t0 = time.perf_counter()
        float(chained(iters))
        best_dt = (time.perf_counter() - t0) / iters
    qps = b / best_dt

    # baseline: NumPy exact scan on the host (reference-pipeline stand-in)
    nb = min(n, 20_000)
    c_np = np.asarray(
        (corpus_f32 if f32x2_mode else corpus)[:nb], np.float32
    )
    if int8_mode:
        c_np = c_np * np.asarray(corpus_scales[:nb], np.float32)[:, None]
    q_np = np.asarray(queries, np.float32)
    t0 = time.perf_counter()
    reps = 2
    for _ in range(reps):
        scores = q_np @ c_np.T
        part = np.argpartition(-scores, k, axis=1)[:, :k]
    base_dt = time.perf_counter() - t0
    # scale the baseline cost linearly to the full corpus size
    base_qps = b * reps / (base_dt * (n / nb))

    print(
        f"# backend={backend} n={n} d={d} b={b} dtype={dtype_name} "
        f"recall@12={recall:.4f} fused_qps={qps:.1f} numpy_qps={base_qps:.1f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"top-12 query throughput ({resolved_impl}), "
                    f"{n} x {d} {dtype_name} corpus, B={b}, "
                    f"recall@12={recall:.3f}"
                ),
                "impl": resolved_impl,
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / base_qps, 2) if base_qps > 0 else None,
                "tunnel_rtt_s": round(tunnel_rtt, 3),
                # per-round q/s spread: window swing made visible in-line
                # (the headline value is the best round, per protocol)
                "spread_qps": [
                    round(b / dt, 1) for dt in sorted(round_dts)
                ] if round_dts else None,
                "impossible_rounds_discarded": impossible,
                # explicit health label: numbers from a degraded window
                # measure the tunnel, not the chip — compare only
                # window == "healthy" runs (docs/BENCHMARKS.md protocol)
                "window": (
                    "healthy"
                    if (not on_tpu) or tunnel_rtt < 0.5
                    else "degraded"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
