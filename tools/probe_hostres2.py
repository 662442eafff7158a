"""Probe 2: which HOST-plane row-fetch structure is a true row-DMA?

probe_hostres.py measured the compute_on("device_host") lax.gather at
ratio 3.64 for 8x plane rows with FIXED gathered bytes — a hidden
plane-size-dependent cost (measurements/r5/hostres_1m.out) that kills
the 10M host-residual rung (~20 q/s extrapolated). XLA TPU's host
offload is known-good for *slice-shaped* traffic (the KV-offload
pattern: dynamic-slice on a host operand + explicit memory-space
transfer lowers to copy-start/copy-done DMA); a dynamic *gather* on a
host operand is exactly the shape that falls off that path.

Variants, all fetching the SAME 2048 rows (B=32 queries x M=64
candidates, 1 KB/row = 2 MB per call) from planes 8x apart in rows:

  ghr   current ops/hostmem.gather_rows (compute_on + lax.gather)
  dss   lax.scan of per-row dynamic_slice(host) -> device_put(Device)
  dsu   same scan with unroll=8 (DMA latency overlap)
  hjit  standalone jit whose ONLY op is the gather, all inputs and the
        output pinned_host (whole program host-compiled), result moved
        by the caller in a second device program
  floor contiguous static 2048-row slice device_put (pure DMA floor;
        no per-row addressing at all)

Verdict per variant: ratio = t(1M) / t(125k) with identical gathered
bytes. ~1.0 = row-DMA (plane-size-free); >~2 = hidden copy. Timing:
fresh random idx per call, variants interleaved round-robin, min over
rounds (the tunnel-bench discipline from CLAUDE.md).

Usage: python tools/probe_hostres2.py [rows_big] (default 1_000_000)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax._src.core import MemorySpace
    from jax.experimental.compute_on import compute_on

    from outline_rag_tpu.ops import hostmem

    n_big = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_small = n_big // 8
    d = 1024
    b, m = 32, 64

    dev = jax.devices()[0]
    emit(stage="init", backend=jax.default_backend(), device=str(dev))
    s_host = hostmem.pinned_host_sharding(dev)

    rng = np.random.default_rng(7)
    planes = {}
    small_np = None
    for tag, n in (("small", n_small), ("big", n_big)):
        arr = rng.integers(-127, 128, size=(n, d), dtype=np.int8)
        if tag == "small":
            small_np = arr  # kept host-side: fetching a pinned_host
            #                 plane back through the tunnel ABORTs
        planes[tag] = (jax.device_put(arr, s_host), n)
        jax.block_until_ready(planes[tag][0])
    emit(stage="planes", ok=True, rows_small=n_small, rows_big=n_big)

    # --- variant programs --------------------------------------------------
    @jax.jit
    def v_ghr(plane, idx):
        return jnp.sum(hostmem.gather_rows(plane, idx).astype(jnp.int32))

    def _scan_rows(plane, idx, unroll):
        flat = jax.device_put(idx.reshape(-1), MemorySpace.Host)

        def body(acc, i):
            row = lax.dynamic_slice(plane, (i, jnp.int32(0)), (1, d))
            row = jax.device_put(row, MemorySpace.Device)
            return acc + jnp.sum(row.astype(jnp.int32)), None

        acc, _ = lax.scan(body, jnp.int32(0), flat, unroll=unroll)
        return acc

    @jax.jit
    def v_dss(plane, idx):
        return _scan_rows(plane, idx, 1)

    @jax.jit
    def v_dsu(plane, idx):
        return _scan_rows(plane, idx, 8)

    # hjit: the gather is the WHOLE program; inputs and output host-space.
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )

    @functools.partial(
        jax.jit,
        out_shardings=jax.sharding.SingleDeviceSharding(
            dev, memory_kind="pinned_host"
        ),
    )
    def hjit_gather(plane, idx_h):
        with compute_on("device_host"):
            return lax.gather(
                plane, idx_h, dnums, slice_sizes=(1, d),
                mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )

    @jax.jit
    def hjit_reduce(rows_h):
        rows = jax.device_put(rows_h, MemorySpace.Device)
        return jnp.sum(rows.astype(jnp.int32))

    def v_hjit(plane, idx):
        idx_h = jax.device_put(
            np.asarray(idx).reshape(-1, 1).astype(np.int32), s_host
        )
        rows_h = hjit_gather(plane, idx_h)
        return hjit_reduce(rows_h)

    @jax.jit
    def floor_reduce(rows_h):
        rows = jax.device_put(rows_h, MemorySpace.Device)
        return jnp.sum(rows.astype(jnp.int32))

    def v_floor(plane, idx):
        # contiguous 2048-row host slice -> device; idx ignored by design
        return floor_reduce(lax.slice(plane, (0, 0), (b * m, d)))

    # hdot: gather AND the rescore dot stay in the host block; only the
    # [B, M] f32 corrections (32 KB) cross the memory-space boundary.
    # If this is plane-size-flat, the 10M rescore never moves rows at
    # all — the host computes sum(q2[idx] * query) and ships scalars.
    @jax.jit
    def v_hdot(plane, idx, q):
        bq, mq = idx.shape
        idx_h = jax.device_put(idx.reshape(bq * mq, 1), MemorySpace.Host)
        q_h = jax.device_put(q, MemorySpace.Host)
        with compute_on("device_host"):
            rows = lax.gather(
                plane, idx_h, dnums, slice_sizes=(1, d),
                mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )  # [B*M, D] int8, host
            corr = jnp.einsum(
                "bmd,bd->bm",
                rows.reshape(bq, mq, d).astype(jnp.float32),
                q_h,
            )
        return jnp.sum(jax.device_put(corr, MemorySpace.Device))

    q_np = rng.standard_normal((b, d)).astype(np.float32)
    q_dev = jax.device_put(jnp.asarray(q_np), dev)

    variants = {
        "ghr": v_ghr, "dss": v_dss, "dsu": v_dsu,
    }
    if os.environ.get("PROBE_ABORTING_VARIANTS"):
        # measured 2026-08-21 (probe_hostres2.err): hjit (whole-program
        # host gather via out_shardings=pinned_host), floor (eager
        # lax.slice on a host array), and hdot (host-block einsum) all
        # raise ABORTED on the axon runtime — and the first abort WEDGES
        # the process (every subsequent dispatch aborts, including plain
        # device_put). Quarantined behind an env flag.
        variants.update({
            "hjit": v_hjit, "floor": v_floor,
            "hdot": lambda plane, idx: v_hdot(plane, idx, q_dev),
        })

    # --- warm + time -------------------------------------------------------
    def idx_for(n):
        return jnp.asarray(
            rng.integers(0, n, size=(b, m), dtype=np.int32)
        )

    results = {k: {"small": [], "big": []} for k in variants}
    skipped = {}
    for name, fn in list(variants.items()):
        for tag in ("small", "big"):
            plane, n = planes[tag]
            try:
                int(fn(plane, idx_for(n)))  # fetch = the only real sync
            except Exception as e:
                skipped[name] = f"{tag}: {e!r}"[:300]
                variants.pop(name, None)
                break
    if skipped:
        emit(stage="skipped", variants=skipped)

    # The lazy tunnel makes block_until_ready a no-op — only a host
    # fetch executes the queue. Time a CHAIN of data-dependent calls
    # (the scalar result perturbs the next idx by +0*acc, unfoldable
    # across the jit boundary) ending in ONE fetch, so per-call time =
    # chain/REPS with a single rtt amortized across the chain.
    REPS = 8
    for rnd in range(4):
        for name, fn in variants.items():
            for tag in ("small", "big"):
                plane, n = planes[tag]
                idxs = [idx_for(n) for _ in range(REPS)]
                for i in idxs:
                    jax.block_until_ready(i)
                t0 = time.time()
                acc = jnp.int32(0)
                for i in idxs:
                    acc = fn(plane, i + acc * 0)
                int(acc)
                dt = (time.time() - t0) * 1e3 / REPS
                if rnd:  # round 0 is an extra warm pass
                    results[name][tag].append(dt)

    out = {}
    for name in variants:
        ts, tb = min(results[name]["small"]), min(results[name]["big"])
        out[name] = {
            "small_ms": round(ts, 3),
            "big_ms": round(tb, 3),
            "ratio": round(tb / ts, 2),
            "rowdma": bool(tb / ts < 1.6),
        }
    emit(stage="scaling", variants=out, reps=REPS)

    # --- correctness: dss/hjit rows == fp32 oracle rows --------------------
    plane, n = planes["small"]
    idx = idx_for(n)
    want = small_np[np.asarray(idx).reshape(-1)]

    @jax.jit
    def rows_dss(plane, idx):
        flat = jax.device_put(idx.reshape(-1), MemorySpace.Host)

        def body(_, i):
            row = lax.dynamic_slice(plane, (i, jnp.int32(0)), (1, d))
            return None, jax.device_put(row, MemorySpace.Device)[0]

        _, rows = lax.scan(body, None, flat, unroll=8)
        return rows

    try:
        got = np.asarray(rows_dss(plane, idx))
        emit(stage="rows_exact", ok=bool((got == want).all()))
    except Exception as e:
        emit(stage="rows_exact", ok=False, error=repr(e)[:300])


if __name__ == "__main__":
    main()
