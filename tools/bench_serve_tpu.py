"""North-star serving rung: 100 concurrent asks on the REAL chip.

BASELINE.md's final ladder rung is "fused serve at 100 concurrent
queries". This boots the full app with the real-size models on the
default backend (the TPU via the axon tunnel on this VM):

- bge-m3-size encoder (24L x 1024H, bf16, random init — no weights in
  this environment; identical FLOPs/bytes to the real checkpoint),
- bge-reranker-v2-m3-size cross-encoder,
- VectorIndex at BENCH_N rows (default 100k; BENCH_N=1000000 is the
  production rung) in BENCH_DTYPE storage (default float32 — the
  round-3 headline default) with the device token cache, so each ask
  runs the fused embed -> score+top-12 -> gather -> rerank program
  through the query micro-batcher,
- FakeChatProvider behind the provider seam (the reference's chat LLM
  is a remote API in both systems; its latency is not the rung).

Reports p50/p95 ask completion latency and aggregate asks/s at
BENCH_CONC concurrency, with the tunnel RTT marker the benchmarking
protocol requires (docs/BENCHMARKS.md "Measurement caveat").

Usage: python tools/bench_serve_tpu.py
Env: BENCH_N (100000), BENCH_CONC (100), BENCH_SEQ (10),
     BENCH_DTYPE (float32|f32x2|bfloat16|int8), BENCH_HYBRID=1
     (lex_weight=0.3 + ColBERT late interaction from the int8 JL cache
     at rank 64 — the full hybrid retrieval mode; cache contents are
     synthetic like the corpus, so the rung measures the cost of the
     extra gathers + MaxSim in the fused program, not ranking quality),
     BENCH_CPU=1 (smoke-test the harness on the CPU backend with a
     tiny encoder).
"""

from __future__ import annotations

import asyncio
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


async def run() -> None:
    import jax

    smoke = bool(os.environ.get("BENCH_CPU"))
    if smoke:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from outline_rag_tpu.config import load_settings
    from outline_rag_tpu.engine.embedder import EncoderEmbedder
    from outline_rag_tpu.engine.rerank import CrossEncoderReranker
    from outline_rag_tpu.index import VectorIndex
    from outline_rag_tpu.models.encoder import (
        EncoderConfig,
        init_encoder_params,
    )
    from outline_rag_tpu.models.reranker import init_reranker_params
    from outline_rag_tpu.models.tokenizer import HashTokenizer
    from outline_rag_tpu.serve.app import build_app
    from outline_rag_tpu.serve.http import TestClient
    from outline_rag_tpu.serve.llm import FakeChatProvider

    n = int(os.environ.get("BENCH_N", 2048 if smoke else 100_000))
    conc = int(os.environ.get("BENCH_CONC", 8 if smoke else 100))
    n_seq = int(os.environ.get("BENCH_SEQ", 3 if smoke else 10))
    tok_w = 64

    # tunnel health marker FIRST (memory/tpu-tunnel-degradation). The
    # lazy tunnel makes block_until_ready a no-op — only a host FETCH
    # executes, so warm by fetching (otherwise the timed probe pays the
    # cold compile and labels a healthy window degraded), then take the
    # median of 3 warm round trips (the thing that bounds timed loops).
    x = jnp.ones((256, 256))

    def _probe_rtt():
        float(jnp.sum(x @ x))  # compile/warm outside the timed fetches
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(x @ x))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]

    rtt = _probe_rtt()
    print(f"# backend={jax.default_backend()} tunnel rtt {rtt:.3f}s",
          file=sys.stderr)

    hybrid = bool(os.environ.get("BENCH_HYBRID"))
    # ColBERT cache rank: production default is operator-chosen
    # (config.py colbert_cache_rank, HBM cost capacity*width*(rank+4)).
    # 32 is the highest rank whose 1M-row hybrid footprint fits this
    # chip next to both models (rank 64 = 9.7 GB index + 2.3 GB models
    # exceeded measured usable HBM; see tools/probe_hbm.py)
    cb_rank = int(os.environ.get("BENCH_CB_RANK", 32))
    cfg = EncoderConfig.tiny() if smoke else EncoderConfig.bge_m3()
    tok = HashTokenizer(vocab_size=cfg.vocab_size)
    # BENCH_INT8=1: w8a8 trunks (ENCODER_INT8 serving config) — the ask
    # path's encode + rerank forwards run int8 x int8 MXU dots
    int8 = bool(os.environ.get("BENCH_INT8"))
    # Build the random-init param trees ON THE CPU BACKEND and push only
    # the final serving-dtype trees to the chip. Initializing on the TPU
    # pins the f32 init trees (~2.2 GB each at bge-m3 size) behind the
    # lazy tunnel's cast chain — `del` doesn't force the cast, so at the
    # 1M f32 rung (4.3 GB vectors) the chip OOMs at the first encode.
    # Production loads checkpoints host-side, so this matches it.
    with jax.default_device(jax.devices("cpu")[0]):
        enc_params = init_encoder_params(jax.random.key(0), cfg)
        if hybrid:
            from outline_rag_tpu.models.encoder import init_colbert_head

            enc_params["colbert"] = init_colbert_head(jax.random.key(3), cfg)
        rr_params = init_reranker_params(jax.random.key(1), cfg)
        emb = EncoderEmbedder(
            enc_params, cfg, tok, max_tokens=tok_w, seq_buckets=(tok_w,),
            name="bench-bge-m3", int8=int8,
        )
        rr = CrossEncoderReranker(
            rr_params, cfg, tok, max_tokens=2 * tok_w, int8=int8
        )
    del enc_params, rr_params
    dev = jax.devices()[0]
    # the model trees move to the chip AFTER the index build (below):
    # they are first touched by the ask loop, and keeping ~2.2 GB off
    # the device during the build lowers the ingest high-water mark at
    # the 1M hybrid rungs (the northstar_1m_int8r OOM forensics)

    cap = 1024
    while cap < n:
        cap *= 2
    # BENCH_DTYPE: float32 (default — the round-3 headline storage, fp32-
    # exact with Precision.HIGHEST), or f32x2/bfloat16/int8 variants
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    index = VectorIndex(
        dim=cfg.hidden, capacity=cap, dtype=dtype, token_width=tok_w,
        colbert_rank=cb_rank if hybrid else 0,
    )

    # synthesize the corpus directly through the real ingest mutation
    # path (normalize + dtype-specific store + token-cache write); encoding 100k
    # chunks through the encoder is the *build* rung, measured separately
    # (BENCH_SCENARIO=encode)
    rng = np.random.default_rng(0)
    t_build = time.perf_counter()
    batch = 4096
    for start in range(0, n, batch):
        m = min(batch, n - start)
        vecs = rng.standard_normal((m, cfg.hidden)).astype(np.float32)
        ids = rng.integers(3, cfg.vocab_size, size=(m, tok_w)).astype(np.int32)
        extra = {}
        if hybrid:
            # synthetic lexical weights + projected-int8 ColBERT cache
            # rows: same shapes/dtypes the real ingest writes, so the
            # fused program's hybrid gathers and MaxSim run for real
            extra = dict(
                token_weights=rng.random((m, tok_w), np.float32),
                colbert_codes=rng.integers(
                    -127, 128, size=(m, tok_w, cb_rank)
                ).astype(np.int8),
                colbert_scales=(
                    rng.random((m, tok_w), np.float32) * 0.02 + 0.001
                ),
            )
        index.add_chunks(
            [f"c{start + i}" for i in range(m)],
            vecs,
            source_id=f"s{start // batch}",
            replace=False,
            token_ids=ids,
            token_mask=np.ones((m, tok_w), np.int32),
            **extra,
        )
        if (start // batch) % 32 == 0:
            # progress marker for OOM forensics: which block died, and
            # how long blocks take as the build deepens (a rising
            # per-block time = the lazy tunnel falling behind)
            print(
                f"# build block {start // batch} "
                f"({start + m}/{n} rows, t={time.perf_counter() - t_build:.0f}s)",
                file=sys.stderr, flush=True,
            )
    print(
        f"# index build: {n} rows in {time.perf_counter() - t_build:.1f}s",
        file=sys.stderr,
    )
    emb.params = jax.device_put(emb.params, dev)
    rr.params = jax.device_put(rr.params, dev)

    settings = load_settings(
        {
            "SECRET_KEY": "bench",
            "VECTOR_DIM": str(cfg.hidden),
            "DATA_DIR": "",
            "TOKEN_WIDTH": str(tok_w),
            "MESH_DATA_AXIS": "1",
            # explicit mappings bypass os.environ entirely (config.py),
            # so the batcher-cap override must be forwarded by hand for
            # the warm ladder's query_batch_max derivation to see it
            "QUERY_BATCH_MAX": os.environ.get("QUERY_BATCH_MAX", "32"),
            **(
                {
                    "LEX_WEIGHT": "0.3",
                    "COLBERT_WEIGHT": "0.3",
                    "COLBERT_CACHE_RANK": str(cb_rank),
                }
                if hybrid
                else {}
            ),
        }
    )
    app = build_app(
        settings,
        provider=FakeChatProvider(),
        embedder=emb,
        reranker=rr,
        index=index,
        start_workers=False,
    )
    # chunk-text lookup: the meta store is empty (vectors are synthetic);
    # the ask path degrades to context-less answers, which exercises the
    # same retrieval+rerank device program — the rung under test
    client = TestClient(app)
    await client.post(
        "/chat/login",
        body=b"name=bench",
        headers={"content-type": "application/x-www-form-urlencoded"},
    )
    conv = json.loads(
        (await client.post("/chat/api/conversations", json_body={"title": "b"})).body
    )

    async def ask(q: str) -> tuple[float, float]:
        """Returns (ttfr_s, total_s): TTFR = first data frame, i.e.
        classifier + rewrite + retrieval done, generation starting."""
        events, ttfr, total = await client.sse_timed(
            "POST",
            "/chat/api/ask",
            json_body={"conversation_id": conv["id"], "question": q},
        )
        assert events, "no SSE frames"
        return ttfr, total

    # compile every power-of-two batch bucket the micro-batcher can emit
    # before measuring (production pays these once at startup). One big
    # burst does NOT guarantee coverage — coalescing is timing-dependent
    # and a bucket first formed inside the measured burst pays its
    # 20-70s remote compile there. Issue one burst per bucket size.
    await ask("warmup alpha wolves in the forest")
    # the batcher never emits a batch larger than query_batch_max, so the
    # ladder must reach THAT cap (not a hardcoded 64): with e.g.
    # QUERY_BATCH_MAX=128 a 100-way burst can pad into the 128 bucket,
    # and an unwarmed top bucket compiles (20-70 s) inside the timing
    top_bucket = 1
    while top_bucket < min(conc, settings.query_batch_max):
        top_bucket *= 2
    bucket = 1
    while bucket <= top_bucket:
        await asyncio.gather(
            *[ask(f"warm bucket {bucket} q{i}") for i in range(bucket)]
        )
        bucket *= 2

    lat = []
    for i in range(n_seq):
        lat.append(await ask(f"sequential question {i} about topic {i % 7}"))
    seq_total = sorted(t for _, t in lat)
    seq_ttfr = sorted(f for f, _ in lat)
    p50_seq = seq_total[len(seq_total) // 2] * 1e3
    p50_seq_ttfr = seq_ttfr[len(seq_ttfr) // 2] * 1e3

    # the 100-way burst: all asks issued at once; the query micro-batcher
    # coalesces them into device batches of <= query_batch_max
    t0 = time.perf_counter()
    pairs = await asyncio.gather(
        *[ask(f"concurrent question {i} topic {i % 11}") for i in range(conc)]
    )
    wall = time.perf_counter() - t0

    def pct(xs, q):
        xs = sorted(xs)
        return xs[min(len(xs) - 1, int(round(q * (len(xs) - 1))))] * 1e3

    ttfrs = [f for f, _ in pairs]
    totals = [t for _, t in pairs]
    p50_ttfr, p95_ttfr = pct(ttfrs, 0.5), pct(ttfrs, 0.95)
    p50, p95 = pct(totals, 0.5), pct(totals, 0.95)

    rtt_after = _probe_rtt()

    print(
        json.dumps(
            {
                "metric": (
                    f"north-star serve: {conc} concurrent asks, "
                    f"{'tiny-smoke' if smoke else 'bge-m3-size'} encoder+reranker"
                    f"{' (int8 trunks)' if int8 else ''}, "
                    f"{n}x{cfg.hidden} {dtype} fused index"
                    f"{' + lex/ColBERT-cache hybrid' if hybrid else ''}, "
                    f"backend={jax.default_backend()}"
                ),
                "seq_p50_ms": round(p50_seq, 1),
                "seq_p50_ttfr_ms": round(p50_seq_ttfr, 1),
                "conc_p50_ttfr_ms": round(p50_ttfr, 1),
                "conc_p95_ttfr_ms": round(p95_ttfr, 1),
                "conc_p50_ms": round(p50, 1),
                "conc_p95_ms": round(p95, 1),
                "asks_per_s": round(conc / wall, 2),
                "tunnel_rtt_s": round(rtt, 3),
                "tunnel_rtt_after_s": round(rtt_after, 3),
                "window": "healthy" if max(rtt, rtt_after) < 0.5 or smoke
                else "degraded",
            }
        )
    )


if __name__ == "__main__":
    asyncio.run(run())
