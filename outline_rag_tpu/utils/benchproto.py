"""Shared benchmark-protocol helpers: two-point timing + FLOPs models.

The TPU remote-compile tunnel adds a large host round-trip to every
fetched result, and its throughput swings 2-4x on a seconds timescale
(CLAUDE.md).  The two-point protocol times a SHORT and a LONG chained
run (each pays exactly one result fetch); the round-trip cancels
exactly in the difference, leaving only per-iteration compute.  This is
the single implementation of that formula — bench.py's encoder scenario
and tools/bench_encode_ab.py previously carried diverging copies whose
floor term (``max(..., t_many/iters)/iters``) could latch a value
inflated by up to ``iters``x in a tunnel-swing round.
"""

from __future__ import annotations


def two_point_dt(
    t_short: float, t_long: float, iters_short: int, iters_long: int
) -> float | None:
    """Per-iteration time from a short and a long chained timing.

    Both runs pay the same one-time overhead (dispatch chain + one
    result round-trip): ``t = o + iters * dt``, so the difference
    cancels ``o`` exactly.  Returns ``None`` when ``t_long <= t_short``
    — the tunnel window shifted between the two timings and the pair
    measures nothing; callers must DISCARD the round (flooring it
    instead produced readings inflated far past reality that still
    slipped under the roofline filter).
    """
    if iters_long <= iters_short:
        raise ValueError("iters_long must exceed iters_short")
    if t_long <= t_short:
        return None
    return (t_long - t_short) / (iters_long - iters_short)


def encoder_matmul_flops(cfg, batch: int, seq: int) -> float:
    """Matmul FLOPs per encoder forward (roofline-filter calibration).

    Counts only MXU work: the trunk's six dense projections per layer
    plus the attention score/context matmuls (~8% at seq 256).  The
    256M-parameter embedding table is a gather — counting it inflated
    the implied TFLOP/s ~1.8x and mis-calibrated the impossibility
    filter that exists to drop tunnel artifacts.
    """
    n_matmul = cfg.layers * (
        4 * cfg.hidden**2 + 2 * cfg.hidden * cfg.intermediate
    )
    attn_flops = cfg.layers * 4.0 * seq * cfg.hidden
    return (2.0 * n_matmul + attn_flops) * batch * seq
