"""Host half of the int8r rescore tier: exact ranking past HBM.

The int8r mode's exactness comes from rescoring the scan's top
candidates with the two-plane dequant ``q1*s + q2*(s/254)``
(``ops/quant.py::quantize_rows_int8_residual``). At 10M x 1024 rows the
two device planes are 20 GB — past one 16 GB chip — and the measured
runtime cannot row-DMA a host-memory plane from inside a program
(tools/probe_hostres2.py: the supported ``compute_on`` gather's cost
scales with plane size; every alternative structure aborts). So the q2
plane lives in the ATTACHED HOST's RAM as plain numpy and the rescore
splits:

- device (``ops/quant.py::int8_topk_candidates``): one-byte q1 scan,
  top-m candidate select, exact f32 q1-part rescore — all at HBM
  bandwidth; ships ``[B, m]`` scores + indices + scales to the host;
- host (this module): gather m q2 rows per query (~64 KB), add the
  correction ``(q . q2_row) * s/254``, final top-k.

Score decomposition: ``q . (q1*s + q2*(s/254)) = (q . q1)*s +
(q . q2)*(s/254)`` — the split is the same math as the fused device
rescore up to one f32 rounding in the final add; agreement with the
fp32 oracle stays exact where the fused path's does (the correction
term carries ~8 extra bits below the q1 term; tests/test_hostres.py
pins oracle-exact index equality).

Role in the reference's terms: pgvector's exact scoring runs on the
Postgres HOST over fp32 rows (app/database.py:137-138); this tier is
the same placement with the scan stage offloaded to the TPU. The
candidate margin is generous: measured on the bench distribution
(noise=0.35 self-retrieval, 262k rows, B=512), the true fp32 top-12
never ranked below 16 in the q1 ordering (p99 = 14), so m=64 carries
4x the observed worst case.
"""

from __future__ import annotations

import numpy as np


def host_residual_topk(
    scores_q1: np.ndarray,  # [B, m] f32 — device q1-part rescore
    idx: np.ndarray,  # [B, m] int32 candidate rows, ascending per query
    scale_c: np.ndarray,  # [B, m] f32 per-candidate row scales
    queries: np.ndarray,  # [B, D] f32 exact query values
    q2_plane: np.ndarray,  # [N, D] int8 residual plane (host RAM)
    k: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Finish the int8r rescore on the host: returns ``(vals [B, k],
    idx [B, k])`` ranked by the exact two-plane score. Ties keep the
    lowest corpus index (stable argsort over ascending-index
    candidates — the ``lax.top_k`` contract the device path honours)."""
    b, m = idx.shape
    rows = q2_plane[idx.reshape(-1)].reshape(b, m, -1).astype(np.float32)
    # batched matmul, not einsum: same contraction, but np.matmul hits
    # the BLAS batched-gemv path — measured 12.3 vs 17.8 ms per
    # [128, 64, 1024] batch on this host (1.45x, measurements/r5)
    corr = np.matmul(rows, queries.astype(np.float32)[:, :, None])[:, :, 0]
    scores = scores_q1 + corr * (scale_c / np.float32(254.0))
    pos = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    vals = np.take_along_axis(scores, pos, axis=1)
    out_idx = np.take_along_axis(idx, pos, axis=1)
    return vals, out_idx.astype(np.int32)


__all__ = ["host_residual_topk"]
