"""Probe: can the int8r residual plane live in REMOTE-HOST memory?

The 10M exact-ranking rung (VERDICT r4 #8) needs q1 (10 GB int8, HBM —
the scan reads it every query) plus the q2 residual plane (10 GB) that
only the top-64-per-query rescore touches: 64 KB of reads per query.
Two planes exceed what the chip grants (~13 GB usable; the rank-64
hybrid rung OOM'd at 12 GB static), but XLA TPU supports host memory
offloading: arrays placed with ``memory_kind="pinned_host"`` stay in
the attached host's RAM and programs can read them over PCIe.

This probe answers, on the real runtime (axon tunnel):
1. does device_put to pinned_host work at all?
2. does a jitted gather of [B, 64] rows from the host-resident plane
   execute — and does its time scale with the GATHERED bytes (DMA of
   64 rows) or the PLANE bytes (a hidden full copy to HBM, which would
   OOM at 10M and disqualify the design)?
3. end-to-end: int8 scan (HBM q1) -> top-64 idx -> host-plane gather ->
   two-plane fp32 rescore, vs the all-HBM int8r reference — same
   ranking, and the throughput cost of the host hop.

Usage: python tools/probe_hostres.py [n_rows]   (default 1_000_000)
Prints one JSON line per stage; any hard failure prints
{"stage": ..., "ok": false, "error": ...} and exits 0 (a probe that
dies tells us less than one that reports).
"""

from __future__ import annotations

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

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d = 1024
    b = 32
    m = 64  # rescore candidates per query

    dev = jax.devices()[0]
    emit(stage="init", backend=jax.default_backend(), device=str(dev))

    s_hbm = jax.sharding.SingleDeviceSharding(dev)
    try:
        s_host = jax.sharding.SingleDeviceSharding(
            dev, memory_kind="pinned_host"
        )
    except Exception as e:  # memory kinds unsupported by the plugin
        emit(stage="pinned_host_sharding", ok=False, error=repr(e))
        return

    # --- stage 1: placement ------------------------------------------------
    try:
        small = jax.device_put(
            jnp.arange(1024, dtype=jnp.int8).reshape(8, 128), s_host
        )
        jax.block_until_ready(small)
        back = np.asarray(small)
        assert back[3, 5] == (3 * 128 + 5) % 128 or True  # just a fetch
        emit(stage="placement", ok=True,
             memory_kind=str(getattr(small.sharding, "memory_kind", None)))
    except Exception as e:
        emit(stage="placement", ok=False, error=repr(e))
        return

    # --- stage 2: gather-time scaling --------------------------------------
    # Two host planes, 8x apart in rows; if gather time is flat in plane
    # size, reads are row-DMA; if it scales ~8x, XLA is copying the
    # plane into HBM per call and the design is dead at 10M.
    import functools

    from jax.experimental.compute_on import compute_on
    from jax._src.core import MemorySpace

    def host_rows(plane, idx):
        """[B, M] in-range int32 -> [B, M, D] rows of the host plane.

        Raw lax.gather inside compute_on("device_host") with explicit
        memory-space transfers at the boundary: jnp.take's index
        normalization materializes device-space constants inside the
        host block, which the memory-space checker rejects — so index
        arithmetic stays on device and only the final gather runs host-
        side (the supported XLA host-offload pattern)."""
        bq, mq = idx.shape
        idx_h = jax.device_put(
            idx.reshape(bq * mq, 1), MemorySpace.Host
        )
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,),
        )
        with compute_on("device_host"):
            rows = jax.lax.gather(
                plane, idx_h, dnums, slice_sizes=(1, plane.shape[1]),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )
        rows = jax.device_put(rows, MemorySpace.Device)
        return rows.reshape(bq, mq, plane.shape[1])

    @functools.partial(jax.jit, static_argnames=())
    def gather_sum(plane, idx):
        rows = host_rows(plane, idx)  # [B, m, D] int8
        return jnp.sum(rows.astype(jnp.int32))

    rng = np.random.default_rng(0)

    def one_plane(rows_n, tag):
        plane_np = rng.integers(-127, 128, size=(rows_n, d), dtype=np.int8)
        plane = jax.device_put(plane_np, s_host)
        jax.block_until_ready(plane)
        del plane_np
        idx0 = jnp.asarray(
            rng.integers(0, rows_n, size=(b, m)).astype(np.int32)
        )
        float(gather_sum(plane, idx0))  # compile + warm
        ts = []
        for i in range(6):
            idx = jnp.asarray(
                rng.integers(0, rows_n, size=(b, m)).astype(np.int32)
            )
            t0 = time.perf_counter()
            float(gather_sum(plane, idx))
            ts.append(time.perf_counter() - t0)
        dt = sorted(ts)[1]
        emit(stage=f"gather_{tag}", ok=True, rows=rows_n,
             dt_ms=round(dt * 1e3, 3),
             gathered_kb=round(b * m * d / 1024, 1))
        return plane, dt

    try:
        small_rows = max(n // 8, 8192)
        _, dt_small = one_plane(small_rows, "small")
        plane_big, dt_big = one_plane(n, "big")
        ratio = dt_big / dt_small if dt_small > 0 else float("inf")
        emit(stage="scaling", ok=True, ratio=round(ratio, 2),
             verdict="row-DMA" if ratio < 2.5 else "hidden-full-copy")
    except Exception as e:
        emit(stage="gather", ok=False, error=repr(e))
        return

    # --- stage 3: end-to-end int8r with host residual ----------------------
    try:
        from outline_rag_tpu.ops.quant import (
            quantize_rows_int8,
            quantize_rows_int8_residual,
            rescore_fp32,
        )

        # corpus on device in segments to keep peak f32 bounded
        GEN = 1024 * 256
        q1 = jnp.zeros((n, d), jnp.int8)
        sc = jnp.zeros((n,), jnp.float32)
        host_q2 = np.empty((n, d), np.int8)

        @functools.partial(jax.jit, donate_argnums=(0, 1),
                           static_argnames=("rows",))
        def gen_seg(buf, s, key, off, *, rows):
            seg = jax.random.normal(key, (rows, d), jnp.float32)
            seg = seg / jnp.linalg.norm(seg, axis=1, keepdims=True)
            a, b_, c = quantize_rows_int8_residual(seg)
            return (
                jax.lax.dynamic_update_slice(buf, a, (off, 0)),
                jax.lax.dynamic_update_slice(s, b_, (off,)),
                c,
            )

        offs = list(range(0, n, GEN))
        for key, off in zip(jax.random.split(jax.random.key(1), len(offs)),
                            offs):
            rows = min(GEN, n - off)
            q1, sc, q2seg = gen_seg(q1, sc, key, jnp.int32(off), rows=rows)
            host_q2[off:off + rows] = np.asarray(q2seg)
        q2_host = jax.device_put(host_q2, s_host)
        jax.block_until_ready(q2_host)
        del host_q2

        from outline_rag_tpu.ops.quant import int8_topk

        k = 12

        @jax.jit
        def hostres_query(q, q1_, sc_, q2h):
            qq, qs = quantize_rows_int8(q)
            _, cand = int8_topk(qq, qs, q1_, sc_, m, impl="pallas"
                                if jax.default_backend() == "tpu" else "xla")
            cand = jnp.sort(cand, axis=1)
            ts = jnp.take(sc_, cand)
            rows = jnp.take(q1_, cand, axis=0).astype(jnp.float32)
            rows = rows * ts[..., None]
            res = host_rows(q2h, cand)  # host-resident gather
            rows = rows + res.astype(jnp.float32) * (ts[..., None] / 254.0)
            scores = rescore_fp32(q, rows)
            vals, pos = jax.lax.top_k(scores, k)
            return vals, jnp.take_along_axis(cand, pos, axis=1)

        @jax.jit
        def scan_only(q, q1_, sc_):
            qq, qs = quantize_rows_int8(q)
            return int8_topk(qq, qs, q1_, sc_, k, impl="pallas"
                             if jax.default_backend() == "tpu" else "xla")

        qk = jax.random.normal(jax.random.key(2), (b, d), jnp.float32)
        qk = qk / jnp.linalg.norm(qk, axis=1, keepdims=True)
        v1, i1 = jax.block_until_ready(hostres_query(qk, q1, sc, q2_host))
        # timing: chained, varying inputs
        def run(fn, iters, *args):
            carry = jnp.float32(0)
            t0 = time.perf_counter()
            for i in range(iters):
                q = qk + (carry * 1e-9 + (i + 1) * 1e-3)
                out = fn(q, *args)
                carry = carry + jnp.sum(out[0])
            float(carry)
            return (time.perf_counter() - t0) / iters

        run(hostres_query, 1, q1, sc, q2_host)
        run(scan_only, 1, q1, sc)
        dt_host = min(run(hostres_query, 8, q1, sc, q2_host)
                      for _ in range(3))
        dt_scan = min(run(scan_only, 8, q1, sc) for _ in range(3))
        emit(stage="end_to_end", ok=True, rows=n,
             hostres_qps=round(b / dt_host, 1),
             scan_only_qps=round(b / dt_scan, 1),
             host_hop_overhead=round(dt_host / dt_scan, 3))
    except Exception as e:
        emit(stage="end_to_end", ok=False, error=repr(e))
        return

    # --- stage 4: in-place append into the host plane ----------------------
    # An index (not just a static bench corpus) needs delta appends into
    # the residual plane. Donated host-space scatter with
    # out_shardings=pinned_host requires the annotate_device_placement
    # custom call, which the CPU backend lacks — only the chip can
    # answer whether the axon runtime supports it.
    try:
        blk = 1024

        @functools.partial(jax.jit, donate_argnums=(0,),
                           out_shardings=s_host)
        def append_host(p, rows_d, idx_d):
            rows_h = jax.device_put(rows_d, MemorySpace.Host)
            idx_h = jax.device_put(idx_d[:, None], MemorySpace.Host)
            dnums = jax.lax.ScatterDimensionNumbers(
                update_window_dims=(1,), inserted_window_dims=(0,),
                scatter_dims_to_operand_dims=(0,),
            )
            with compute_on("device_host"):
                out = jax.lax.scatter(
                    p, idx_h, rows_h, dnums,
                    mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
                )
            return out

        new_rows = jnp.asarray(
            rng.integers(-127, 128, size=(blk, d), dtype=np.int8)
        )
        tgt = rng.integers(0, n, size=blk).astype(np.int32)
        tgt_d = jnp.asarray(tgt)
        q2_host = append_host(q2_host, new_rows, tgt_d)
        jax.block_until_ready(q2_host)
        # verify through the gather path (one row)
        check_idx = jnp.asarray(
            np.full((1, m), tgt[0], np.int32)
        )
        got = np.asarray(host_rows(q2_host, check_idx))[0, 0]
        ok_contents = bool(np.array_equal(got, np.asarray(new_rows[0])))
        ts = []
        for i in range(4):
            rows_i = jnp.asarray(
                rng.integers(-127, 128, size=(blk, d), dtype=np.int8)
            )
            idx_i = jnp.asarray(
                rng.integers(0, n, size=blk).astype(np.int32)
            )
            t0 = time.perf_counter()
            q2_host = append_host(q2_host, rows_i, idx_i)
            jax.block_until_ready(q2_host)
            ts.append(time.perf_counter() - t0)
        emit(stage="host_append", ok=True, contents_ok=ok_contents,
             block_rows=blk, dt_ms=round(sorted(ts)[1] * 1e3, 3))
    except Exception as e:
        emit(stage="host_append", ok=False, error=repr(e))


if __name__ == "__main__":
    main()
