"""Shared benchmark-protocol helpers (outline_rag_tpu/utils/benchproto).

Pure-Python: no jax, no device. The two-point formula is the integrity
core of every published throughput number, so its edge cases are pinned
here rather than (re-)discovered inside tunnel-swing windows.
"""

from types import SimpleNamespace

import pytest

from outline_rag_tpu.utils.benchproto import (
    encoder_matmul_flops,
    two_point_dt,
)


def test_two_point_cancels_fixed_overhead_exactly():
    # t = o + iters * dt with o = 3.0 s of tunnel round-trip
    o, dt = 3.0, 0.25
    t_short = o + 1 * dt
    t_long = o + 9 * dt
    assert two_point_dt(t_short, t_long, 1, 9) == pytest.approx(dt)


def test_swing_round_returns_none_instead_of_flooring():
    # The exact scenario the old floor latched: the tunnel sped up
    # between the short and long timings so t_long < t_short. The old
    # formula reported t_many/iters**2 (= 33 ms for iters=6, t_many=1.2 s
    # — a 6x-too-fast reading that passes the roofline filter); the
    # shared helper discards the pair.
    assert two_point_dt(2.0, 1.2, 1, 7) is None
    assert two_point_dt(1.0, 1.0, 1, 7) is None  # equal: no information


def test_iters_must_increase():
    with pytest.raises(ValueError):
        two_point_dt(1.0, 2.0, 5, 5)


def test_encoder_matmul_flops_counts_trunk_and_attention_only():
    cfg = SimpleNamespace(layers=2, hidden=8, intermediate=32)
    b, s = 4, 16
    n_matmul = 2 * (4 * 8 * 8 + 2 * 8 * 32)
    attn = 2 * 4.0 * s * 8
    assert encoder_matmul_flops(cfg, b, s) == pytest.approx(
        (2.0 * n_matmul + attn) * b * s
    )
    # vocab/embedding size must NOT appear (it's a gather, not a matmul):
    # the model needs no vocab_size attribute at all
    assert not hasattr(cfg, "vocab_size")
