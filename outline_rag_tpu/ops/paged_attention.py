"""Paged decode attention: KV pages + page-table walk in a Pallas kernel.

vLLM's paged-KV idea expressed TPU-first. The decoder's KV lives in a
shared pool of fixed-size pages (``[P, KvH, Dh, page]`` per layer); each
sequence owns an ordered list of page indices (the page table), so HBM
is allocated by actual sequence length, not by ``slots x max_cache`` —
short chats stop reserving worst-case cache and more concurrent
sequences fit per chip (``serve/decode_batcher.py`` does the
allocation/backpressure).

The naive XLA expression — gather the pages into a contiguous [B, KvH,
C, Dh] view, then attend — materializes a full per-row cache copy every
decode step, tripling attention HBM traffic. The Pallas kernels instead
walk the page table with scalar prefetch and the online-softmax
accumulator discipline of ``ops/attention.py``; KV bytes move exactly
once, and pages beyond a row's live length are neither fetched nor
computed. Three walks trade fixed overhead differently (decode-shape
matmuls are far below MXU granularity, so per-grid-step sequencing +
DMA-issue cost dominates the walk, not FLOPs):

- ``head``: grid ``(B, KvH, n_pages)`` — one page x one head per step
  (the block index map reads the page table; dead pages re-target the
  last live page, and consecutive identical block indices skip the DMA);
- ``page``: grid ``(B, n_pages)`` — one step fetches a page's whole
  ``[KvH, page, Dh]`` slab (contiguous in the pool) and accumulates
  every head: KvH-fold fewer grid steps;
- ``dma``: grid ``(B,)`` — the kernel double-buffers its own page-slab
  ``make_async_copy`` DMAs over a ``fori_loop`` of the row's LIVE pages
  only: no grid step or DMA at all for dead table entries, and the next
  page's fetch overlaps the current page's softmax block.

Quantized pools (``k_scale``/``v_scale`` given): pages are int8 with
per-token per-head f32 scales. The kernel dequantizes in VMEM —
columns of the q·kᵀ product are rescaled by the page's k-scales and
the probability rows are rescaled by v-scales before the p·v product —
so HBM KV traffic halves while the matmuls stay on the MXU.

The grouped-query layout folds the G = H/KvH query heads of one KV head
and the T decode positions into one ``[G*T, Dh]`` matmul operand — at
decode shapes (T <= 8 speculative window) the whole query block stays
resident while pages stream.

Pool layout: pages store ``[Dh, page]`` slabs (position is the MINOR
dim), not ``[page, Dh]``. The page axis is always 128 = one full lane
tile, so the pool is padding-free for ANY head dim — with the naive
``[page, Dh]`` layout a Dh=64 model pads every lane tile 64->128 and
XLA both doubles the pool's HBM footprint and materializes relayout
copies of the whole pool around the per-layer scan (measured: a 2.95 GB
pool compiled to 11.2 GB of HLO temps and OOM'd a 16 GB chip at 64
slots). Transposed, the at-rest layout IS the compute layout: donation
aliases, K arrives pre-transposed for the q·kT MXU dot, and the p·v
product contracts on the lane dim, which Mosaic handles natively.

No reference equivalent (the reference calls a remote chat API,
``app/llm_services.py:151``); this is the serving-memory analogue of
pgvector -> device shards for the decode path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def paged_attention_xla(
    q: jax.Array,  # [B, T, H, Dh] (already rotary-embedded)
    pool_k: jax.Array,  # [P, KvH, Dh, S]
    pool_v: jax.Array,  # [P, KvH, Dh, S]
    table: jax.Array,  # [B, MAXP] int32 page ids (position order)
    pos: jax.Array,  # [B] int32 — absolute position of q[:, 0]
    k_scale: jax.Array | None = None,  # [P, KvH, S] f32 (int8 pools)
    v_scale: jax.Array | None = None,
) -> jax.Array:
    """Reference path: gather pages into a contiguous view and attend.

    Correct but materializes [B, KvH, MAXP*page, Dh] per call — used as
    the test oracle and the CPU fallback, not the serving path.
    """
    b, t, h, dh = q.shape
    p_, kvh, _, s_pg = pool_k.shape
    maxp = table.shape[1]
    c = maxp * s_pg
    group = h // kvh

    def gather(pool, scale):  # -> [B, KvH, C, Dh] dequantized
        g = jnp.take(pool, table, axis=0)  # [B, MAXP, KvH, Dh, S]
        g = g.transpose(0, 2, 1, 4, 3).reshape(b, kvh, c, dh)
        if scale is None:
            return g
        sc = jnp.take(scale, table, axis=0)  # [B, MAXP, KvH, S]
        sc = sc.transpose(0, 2, 1, 3).reshape(b, kvh, c)
        return g.astype(jnp.float32) * sc[..., None]

    k_cache = gather(pool_k, k_scale)
    v_cache = gather(pool_v, v_scale)
    positions = pos[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
    slot = jnp.arange(c, dtype=jnp.int32)
    mask = slot[None, None, :] <= positions[:, :, None]
    bias = jnp.where(mask, 0.0, -1e9).astype(jnp.float32)
    qg = q.reshape(b, t, kvh, group, dh)
    logits = jnp.einsum(
        "btngd,bncd->btngc", qg, k_cache, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(dh))
    logits = logits + bias[:, :, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1)
    ctx = jnp.einsum(
        "btngc,bncd->btngd",
        probs.astype(jnp.float32 if k_scale is not None else q.dtype),
        v_cache,
    )
    return ctx.reshape(b, t, h, dh).astype(q.dtype)


def paged_attention_sharded(
    q: jax.Array,  # [B, T, H, Dh] — H sharded on `axis`
    pool_k: jax.Array,  # [P, KvH, Dh, S] — KvH sharded on `axis`
    pool_v: jax.Array,
    table: jax.Array,  # [B, MAXP] replicated
    pos: jax.Array,  # [B] replicated
    k_scale: jax.Array | None = None,  # [P, KvH, S] — KvH sharded
    v_scale: jax.Array | None = None,
    *,
    mesh: jax.sharding.Mesh,
    axis: str = "model",
    variant: str | None = None,
) -> jax.Array:
    """Tensor-parallel page walk: :func:`paged_attention` under shard_map.

    Attention is embarrassingly parallel over heads, so each device runs
    the page-walk kernel on its local KvH slice of the pool against its
    local query-head group — no collective inside; the row-parallel
    ``wo`` psum that follows in the decoder is the only communication
    (the Megatron layout of ``parallel/tp.py``). A pallas_call cannot be
    partitioned by GSPMD, hence the explicit map; everything around it
    stays annotation-driven.
    """
    from jax.sharding import PartitionSpec as P

    quant = k_scale is not None
    kv_spec = P(None, axis, None, None)
    sc_spec = P(None, axis, None)

    if quant:

        def local(q, pk, pv, tbl, ps, ks, vs):
            return paged_attention(q, pk, pv, tbl, ps, ks, vs,
                                   variant=variant)

        in_specs = (
            P(None, None, axis, None), kv_spec, kv_spec, P(None, None),
            P(None), sc_spec, sc_spec,
        )
        args = (q, pool_k, pool_v, table, pos, k_scale, v_scale)
    else:

        def local(q, pk, pv, tbl, ps):
            return paged_attention(q, pk, pv, tbl, ps, variant=variant)

        in_specs = (
            P(None, None, axis, None), kv_spec, kv_spec, P(None, None),
            P(None),
        )
        args = (q, pool_k, pool_v, table, pos)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(None, None, axis, None),
        check_vma=False,
    )(*args)


def _accumulate_page(
    q,  # [GT, Dh] query rows (one kv head's group)
    k,  # [Dh, S] the page's keys, position-minor (int8 when quant)
    v,  # [Dh, S]
    ks,  # [S] per-token k-scales or None
    vs,  # [S] per-token v-scales or None
    allowed,  # [GT, S] validity mask
    scale: float,
    m_ref,  # [GT, LANE] running max (ref or ref view)
    l_ref,  # [GT, LANE] running sum
    acc_ref,  # [GT, Dh] running context
) -> None:
    """ONE implementation of the online-softmax page accumulate shared by
    every walk variant (head / page / dma) — the mask value, the quant
    rescale ordering, and the accumulator dtypes are the oracle-pinned
    numerics contract; forking them per kernel is how variants silently
    diverge."""
    s = jax.lax.dot_general(
        q, k.astype(q.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [GT, S]
    if ks is not None:
        # column j of s used k-token j: rescale by its k-scale
        s = s * ks[None, :]
    s = jnp.where(allowed, s, -1e9)

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_ref[:, :] = (
        l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
    ) + jnp.zeros(l_ref.shape, jnp.float32)
    if vs is not None:
        # p·v with per-token v-scales folded into p's columns; keep
        # the product in f32 (int8 v has no meaningful low precision)
        pv = jax.lax.dot_general(
            p * vs[None, :], v.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc_ref[:, :] = acc_ref[:, :] * alpha + pv
    m_ref[:, :] = m_new + jnp.zeros(m_ref.shape, jnp.float32)


def _page_mask(pos, pp, t_len: int, gt: int, page: int):
    """Validity mask for page ``pp``: row r is decode offset r % T, the
    page covers absolute slots [pp*page, (pp+1)*page)."""
    row_t = jax.lax.broadcasted_iota(jnp.int32, (gt, page), 0) % t_len
    slot = pp * page + jax.lax.broadcasted_iota(jnp.int32, (gt, page), 1)
    return slot <= pos + row_t


def _normalized(l_ref, acc_ref):
    l = l_ref[:, :1]
    l = jnp.where(l <= 0.0, 1.0, l)
    return acc_ref[:, :] / l


def _paged_kernel(
    table_ref,  # scalar prefetch [B, MAXP]
    pos_ref,  # scalar prefetch [B]
    q_ref,  # [1, 1, GT, Dh]
    k_ref,  # [1, 1, Dh, S] — the page this grid step walks
    v_ref,  # [1, 1, Dh, S]
    *rest,  # (ks_ref [1,1,S], vs_ref [1,1,S] when quant) + o_ref + scratch
    scale: float,
    t_len: int,
    page: int,
    quant: bool,
):
    if quant:
        # scale refs are [1, 1, 1, S] views (the dummy axis satisfies the
        # TPU block-shape rule that the last two dims tile (8, 128) or
        # span the array)
        ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
        ks_ref = vs_ref = None
    b = pl.program_id(0)
    pp = pl.program_id(2)
    npg = pl.num_programs(2)

    @pl.when(pp == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # pages past the row's live length contribute nothing: the index map
    # re-targets them at the last live page (no new DMA — consecutive
    # identical block indices skip the copy) and compute is skipped here,
    # so per-row cost tracks actual sequence length, not MAXP
    last_live = (pos_ref[b] + t_len - 1) // page

    @pl.when(pp <= last_live)
    def _accumulate():
        gt = q_ref.shape[2]
        _accumulate_page(
            q_ref[0, 0], k_ref[0, 0], v_ref[0, 0],
            ks_ref[0, 0, 0] if quant else None,
            vs_ref[0, 0, 0] if quant else None,
            _page_mask(pos_ref[b], pp, t_len, gt, page),
            scale, m_scr, l_scr, acc_scr,
        )

    @pl.when(pp == npg - 1)
    def _emit():
        o_ref[0, 0] = _normalized(l_scr, acc_scr).astype(o_ref.dtype)


def _paged_kernel_page(
    table_ref,  # scalar prefetch [B, MAXP]
    pos_ref,  # scalar prefetch [B]
    q_ref,  # [1, KvH, GT, Dh] — the row's full grouped query
    k_ref,  # [1, KvH, Dh, S] — ALL kv heads of the page this step walks
    v_ref,  # [1, KvH, Dh, S]
    *rest,  # (ks_ref [1,KvH,1,S], vs_ref when quant) + o_ref + scratch
    scale: float,
    t_len: int,
    page: int,
    kvh: int,
    quant: bool,
):
    """Grid ``(B, MAXP)`` page walk: one grid step fetches a page's whole
    ``[KvH, Dh, S]`` slab (contiguous in the pool) in ONE DMA and
    accumulates every kv head — ``KvH``x fewer grid steps than the
    per-head walk. At decode shapes the per-head matmuls are far below
    MXU granularity, so the walk is bound by fixed per-grid-step cost
    (sequencing + DMA issue), which this variant amortizes across heads.
    """
    if quant:
        ks_ref, vs_ref, o_ref, *scratch = rest
    else:
        o_ref, *scratch = rest
        ks_ref = vs_ref = None
    # per-head 2-D scratch triples (m, l, acc) x kvh — NOT one 3-D
    # buffer sliced with .at[hh]: Mosaic rejects memref views whose
    # minor dim (Dh = 64 here) is below the 128-lane tile ("Slice shape
    # along dimension 2 must be aligned to tiling (128)"), while plain
    # 2-D scratch refs — the head-variant's pattern — lower fine
    m_scr = scratch[0::3]
    l_scr = scratch[1::3]
    acc_scr = scratch[2::3]
    b = pl.program_id(0)
    pp = pl.program_id(1)
    npg = pl.num_programs(1)

    @pl.when(pp == 0)
    def _init():
        for hh in range(kvh):
            m_scr[hh][:] = jnp.full_like(m_scr[hh], -1e30)
            l_scr[hh][:] = jnp.zeros_like(l_scr[hh])
            acc_scr[hh][:] = jnp.zeros_like(acc_scr[hh])

    last_live = (pos_ref[b] + t_len - 1) // page

    @pl.when(pp <= last_live)
    def _accumulate():
        gt = q_ref.shape[2]
        # mask is head-independent: compute once, share across heads
        allowed = _page_mask(pos_ref[b], pp, t_len, gt, page)
        for hh in range(kvh):  # static unroll: all heads, one grid step
            _accumulate_page(
                q_ref[0, hh], k_ref[0, hh], v_ref[0, hh],
                ks_ref[0, hh, 0] if quant else None,
                vs_ref[0, hh, 0] if quant else None,
                allowed, scale,
                m_scr[hh], l_scr[hh], acc_scr[hh],
            )

    @pl.when(pp == npg - 1)
    def _emit():
        for hh in range(kvh):
            o_ref[0, hh] = _normalized(
                l_scr[hh], acc_scr[hh]
            ).astype(o_ref.dtype)


def _paged_kernel_dma(
    table_ref,  # scalar prefetch [B, MAXP]
    pos_ref,  # scalar prefetch [B]
    q_ref,  # [1, KvH, GT, Dh]
    k_hbm,  # [P, KvH, Dh, S] — full pool, stays in HBM
    v_hbm,
    *rest,  # (ks_hbm [P,KvH,1,S], vs_hbm when quant) + o_ref + scratch
    scale: float,
    t_len: int,
    page: int,
    kvh: int,
    quant: bool,
):
    """Grid ``(B,)`` page walk: the kernel DMAs each live page's slab
    from HBM itself (double-buffered ``make_async_copy``), so a row
    costs exactly its live pages — no grid step, no DMA, no compute for
    dead table entries, and the next page's fetch overlaps the current
    page's softmax block. Lowest fixed overhead of the three walks:
    ``B`` grid steps total.
    """
    if quant:
        ks_hbm, vs_hbm, o_ref, *tail = rest
        *scratch, kbuf, vbuf, ksbuf, vsbuf, sem = tail
    else:
        o_ref, *tail = rest
        *scratch, kbuf, vbuf, sem = tail
        ks_hbm = vs_hbm = ksbuf = vsbuf = None
    # per-head 2-D scratch triples, same rationale as _paged_kernel_page
    m_scr = scratch[0::3]
    l_scr = scratch[1::3]
    acc_scr = scratch[2::3]
    b = pl.program_id(0)
    gt = q_ref.shape[2]
    maxp = table_ref.shape[1]
    # clamp like the grid-bounded walks: a position at the capacity edge
    # must not read past the page table (the caller contract keeps
    # pos + t < maxp*page, but the ring path clamps its cap too)
    nlive = jnp.minimum((pos_ref[b] + t_len - 1) // page + 1, maxp)

    def copies(i, slot):
        pg = table_ref[b, i]
        cps = [
            pltpu.make_async_copy(k_hbm.at[pg], kbuf.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(v_hbm.at[pg], vbuf.at[slot], sem.at[slot, 1]),
        ]
        if quant:
            cps += [
                pltpu.make_async_copy(
                    ks_hbm.at[pg], ksbuf.at[slot], sem.at[slot, 2]
                ),
                pltpu.make_async_copy(
                    vs_hbm.at[pg], vsbuf.at[slot], sem.at[slot, 3]
                ),
            ]
        return cps

    for hh in range(kvh):
        m_scr[hh][:] = jnp.full_like(m_scr[hh], -1e30)
        l_scr[hh][:] = jnp.zeros_like(l_scr[hh])
        acc_scr[hh][:] = jnp.zeros_like(acc_scr[hh])
    for cp in copies(0, 0):  # nlive >= 1 always (pos >= 0)
        cp.start()

    def walk(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nlive)
        def _prefetch():
            for cp in copies(i + 1, jax.lax.rem(i + 1, 2)):
                cp.start()

        for cp in copies(i, slot):
            cp.wait()
        allowed = _page_mask(pos_ref[b], i, t_len, gt, page)
        for hh in range(kvh):
            _accumulate_page(
                q_ref[0, hh], kbuf[slot, hh], vbuf[slot, hh],
                ksbuf[slot, hh, 0] if quant else None,
                vsbuf[slot, hh, 0] if quant else None,
                allowed, scale,
                m_scr[hh], l_scr[hh], acc_scr[hh],
            )
        return 0

    jax.lax.fori_loop(0, nlive, walk, 0)
    for hh in range(kvh):
        o_ref[0, hh] = _normalized(
            l_scr[hh], acc_scr[hh]
        ).astype(o_ref.dtype)


def resolve_walk_variant(
    variant: str | None,
    *,
    gt: int,
    kvh: int,
    dh: int,
    s_pg: int,
    quant: bool,
    q_itemsize: int,
    kv_itemsize: int,
) -> str:
    """Resolve the page-walk variant for a paged-attention call shape.

    ``None`` takes ``ORT_PAGED_VARIANT`` (default "page": it folds all
    KvH heads into one grid step — KvH-fold fewer steps than "head" for
    identical bytes moved, and grid-step sequencing is what binds
    batched decode: page 18.1 ms/step vs head 26.6 at B=64,
    measurements/r4/dissect64a; 6.1 vs 7.1 at B=8, dissect8).

    Two shape-driven fallbacks to "head":

    - "dma" needs the pool's page axis 128-lane aligned — its
      kernel-side page-slab copies slice HBM along the minor dim, which
      Mosaic requires tile-aligned (verified on-chip: "Slice shape
      along dimension 3 must be aligned to tiling (128)").
    - page/dma hold ALL KvH heads' query block, (m, l, acc) scratch
      triples, and double-buffered whole-page KV slabs in VMEM at once.
      At prefill shapes (gt = G*T ~ 2048) that blows the 16 MB
      scoped-VMEM budget (measured: 18.14M at B=64/T=256 prefill), so
      calls whose estimated footprint exceeds a conservative 10 MB
      fall back to the per-head walk.
    """
    if variant is None:
        import os

        variant = os.environ.get("ORT_PAGED_VARIANT", "page")
    if variant not in ("head", "page", "dma"):
        raise ValueError(f"unknown paged-attention variant {variant!r}")
    if variant == "dma" and s_pg % _LANE:
        variant = "head"
    if variant in ("page", "dma"):
        est = (
            kvh * (2 * gt * _LANE + gt * dh) * 4  # m/l/acc scratch
            + 2 * kvh * gt * dh * q_itemsize  # q in + ctx out
            + 4 * kvh * dh * s_pg * kv_itemsize  # 2x2 kv slabs
            + (16 * kvh * s_pg if quant else 0)  # 2x2 f32 scale slabs
        )
        if est > 10 * 2**20:
            variant = "head"
    return variant


def paged_attention(
    q: jax.Array,  # [B, T, H, Dh] (already rotary-embedded)
    pool_k: jax.Array,  # [P, KvH, Dh, S]
    pool_v: jax.Array,  # [P, KvH, Dh, S]
    table: jax.Array,  # [B, MAXP] int32
    pos: jax.Array,  # [B] int32
    k_scale: jax.Array | None = None,  # [P, KvH, S] f32 -> int8 pool
    v_scale: jax.Array | None = None,
    *,
    interpret: bool | None = None,
    variant: str | None = None,  # "head" | "page" | "dma" (None -> env/default)
) -> jax.Array:
    """Paged decode attention. Returns [B, T, H, Dh] in q's dtype.

    Dispatches the Pallas page-walk kernel on TPU and the XLA gather
    reference elsewhere (or under ``interpret=True`` for kernel-logic
    tests on CPU). ``variant`` picks the walk (``ORT_PAGED_VARIANT``
    env overrides the default): "head" = grid (B, KvH, MAXP), one page
    x one head per step; "page" = grid (B, MAXP), a page's whole KvH
    slab per step (the default: KvH-fold fewer grid steps, 1.47x at
    B=64 decode — grid sequencing, not bandwidth, binds batched
    decode); "dma" = grid (B,), kernel-issued double-buffered page
    DMAs. page/dma auto-fall back to "head" at prefill-shaped gt where
    their all-heads VMEM residency exceeds the scoped budget. All three
    are oracle-pinned to the XLA gather reference; they differ only in
    fixed walk overhead.
    """
    if interpret is None:
        if jax.default_backend() != "tpu":
            return paged_attention_xla(
                q, pool_k, pool_v, table, pos, k_scale, v_scale
            )
        interpret = False
    quant = k_scale is not None
    b, t, h, dh = q.shape
    p_, kvh, _, s_pg = pool_k.shape
    maxp = table.shape[1]
    group = h // kvh
    gt = group * t
    scale = 1.0 / math.sqrt(dh)
    variant = resolve_walk_variant(
        variant, gt=gt, kvh=kvh, dh=dh, s_pg=s_pg, quant=quant,
        q_itemsize=q.dtype.itemsize, kv_itemsize=pool_k.dtype.itemsize,
    )

    # [B, T, H, Dh] -> [B, KvH, G*T, Dh], row r = g*T + t
    q_g = (
        q.reshape(b, t, kvh, group, dh)
        .transpose(0, 2, 3, 1, 4)
        .reshape(b, kvh, gt, dh)
    )

    operands = [q_g, pool_k, pool_v]
    if quant:
        # scale views are 4-d like k/v, so the kv index maps serve both
        operands += [
            k_scale.reshape(p_, kvh, 1, s_pg),
            v_scale.reshape(p_, kvh, 1, s_pg),
        ]

    if variant == "head":
        kernel = functools.partial(
            _paged_kernel, scale=scale, t_len=t, page=s_pg, quant=quant
        )

        def kv_index(bb, hh, pp, tbl, ps):
            # dead pages (beyond the row's live length) re-target the last
            # live page: same block index as the previous grid step, so
            # Pallas skips the DMA and the kernel skips the compute
            live = jnp.minimum(pp, (ps[bb] + t - 1) // s_pg)
            return (tbl[bb, live], hh, 0, 0)

        in_specs = [
            pl.BlockSpec(
                (1, 1, gt, dh), lambda bb, hh, pp, tbl, ps: (bb, hh, 0, 0)
            ),
            pl.BlockSpec((1, 1, dh, s_pg), kv_index),
            pl.BlockSpec((1, 1, dh, s_pg), kv_index),
        ]
        if quant:
            in_specs += [
                pl.BlockSpec((1, 1, 1, s_pg), kv_index),
                pl.BlockSpec((1, 1, 1, s_pg), kv_index),
            ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, kvh, maxp),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, gt, dh), lambda bb, hh, pp, tbl, ps: (bb, hh, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((gt, _LANE), jnp.float32),
                pltpu.VMEM((gt, _LANE), jnp.float32),
                pltpu.VMEM((gt, dh), jnp.float32),
            ],
        )
        semantics = ("parallel", "parallel", "arbitrary")
    elif variant == "page":
        kernel = functools.partial(
            _paged_kernel_page,
            scale=scale, t_len=t, page=s_pg, kvh=kvh, quant=quant,
        )

        def kv_index2(bb, pp, tbl, ps):
            live = jnp.minimum(pp, (ps[bb] + t - 1) // s_pg)
            return (tbl[bb, live], 0, 0, 0)

        q_index2 = lambda bb, pp, tbl, ps: (bb, 0, 0, 0)  # noqa: E731
        in_specs = [
            pl.BlockSpec((1, kvh, gt, dh), q_index2),
            pl.BlockSpec((1, kvh, dh, s_pg), kv_index2),
            pl.BlockSpec((1, kvh, dh, s_pg), kv_index2),
        ]
        if quant:
            in_specs += [
                pl.BlockSpec((1, kvh, 1, s_pg), kv_index2),
                pl.BlockSpec((1, kvh, 1, s_pg), kv_index2),
            ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, maxp),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, kvh, gt, dh), q_index2),
            # per-head (m, l, acc) triples — see _paged_kernel_page
            scratch_shapes=[
                pltpu.VMEM((gt, _LANE), jnp.float32)
                if j != 2 else pltpu.VMEM((gt, dh), jnp.float32)
                for _ in range(kvh) for j in range(3)
            ],
        )
        semantics = ("parallel", "arbitrary")
    else:  # "dma"
        kernel = functools.partial(
            _paged_kernel_dma,
            scale=scale, t_len=t, page=s_pg, kvh=kvh, quant=quant,
        )
        q_index1 = lambda bb, tbl, ps: (bb, 0, 0, 0)  # noqa: E731
        any_spec = pl.BlockSpec(memory_space=pl.ANY)
        in_specs = [
            pl.BlockSpec((1, kvh, gt, dh), q_index1),
            any_spec,
            any_spec,
        ]
        scratch = [
            # per-head (m, l, acc) triples — see _paged_kernel_page
            pltpu.VMEM((gt, _LANE), jnp.float32)
            if j != 2 else pltpu.VMEM((gt, dh), jnp.float32)
            for _ in range(kvh) for j in range(3)
        ] + [
            pltpu.VMEM((2, kvh, dh, s_pg), pool_k.dtype),  # kbuf
            pltpu.VMEM((2, kvh, dh, s_pg), pool_v.dtype),  # vbuf
        ]
        if quant:
            in_specs += [any_spec, any_spec]
            scratch += [
                pltpu.VMEM((2, kvh, 1, s_pg), jnp.float32),  # ksbuf
                pltpu.VMEM((2, kvh, 1, s_pg), jnp.float32),  # vsbuf
            ]
        scratch += [pltpu.SemaphoreType.DMA((2, 4 if quant else 2))]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, kvh, gt, dh), q_index1),
            scratch_shapes=scratch,
        )
        semantics = ("arbitrary",)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, gt, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
        ),
        interpret=interpret,
    )(table, pos, *operands)
    # [B, KvH, G*T, Dh] -> [B, T, H, Dh]
    return (
        out.reshape(b, kvh, group, t, dh)
        .transpose(0, 3, 1, 2, 4)
        .reshape(b, t, h, dh)
    )


# ----------------------------------------------------------------------
# KV page writes
# ----------------------------------------------------------------------


def _paged_kv_write_xla(
    pool_k, pool_v, table, pos, k_new, v_new,
    k_scale=None, v_scale=None, ks_new=None, vs_new=None,
):
    """XLA scatter expression of the page write (CPU fallback + oracle).

    Advanced-index scatter at ``(page, :, :, offset)``: the [B, T] index
    pair broadcasts to the front, so the update value is the
    [B, T, KvH, Dh] new-KV tensor unchanged. Positions at or past
    capacity (padded prefill tails) go to scratch page 0 — without the
    guard ``take_along_axis`` clamps to the LAST table entry and garbage
    lands in the row's final live page.
    """
    b, t = k_new.shape[:2]
    s_pg = pool_k.shape[3]
    maxp = table.shape[1]
    positions = pos[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
    page_idx = positions // s_pg
    w_pages = jnp.where(
        page_idx < maxp,
        jnp.take_along_axis(table, jnp.minimum(page_idx, maxp - 1), axis=1),
        0,
    )  # [B, T]
    w_offs = positions % s_pg
    pool_k = pool_k.at[w_pages, :, :, w_offs].set(k_new)
    pool_v = pool_v.at[w_pages, :, :, w_offs].set(v_new)
    if k_scale is None:
        return pool_k, pool_v
    k_scale = k_scale.at[w_pages, :, w_offs].set(ks_new)
    v_scale = v_scale.at[w_pages, :, w_offs].set(vs_new)
    return pool_k, pool_v, k_scale, v_scale


def _kv_write_kernel(pages_ref, shift_ref, *refs, t_len: int, page: int,
                     quant: bool):
    """RMW one pool page: place the grid step's tokens into their lanes.

    Lane placement rides the MXU: ``M[i, s] = (i == s + shift)`` is the
    one-hot token->lane matrix, so ``new[rows, T] @ M -> [rows, S]``
    deposits token i at lane ``i - shift`` exactly (one-hot columns pass
    values through unchanged in f32). Lanes holding no token keep the
    old page content via the write mask.
    """
    if quant:
        (kp, vp, kn, vn, ksp, vsp, ksn, vsn,
         ko, vo, kso, vso) = refs
    else:
        kp, vp, kn, vn, ko, vo = refs
        ksp = vsp = ksn = vsn = kso = vso = None
    bb = pl.program_id(0)
    jj = pl.program_id(1)
    c = shift_ref[bb, jj]
    ti = jax.lax.broadcasted_iota(jnp.int32, (t_len, page), 0)
    si = jax.lax.broadcasted_iota(jnp.int32, (t_len, page), 1)
    m = (ti == si + c).astype(jnp.float32)  # [T, S]
    s1 = jax.lax.broadcasted_iota(jnp.int32, (1, page), 1) + c
    wmask = (s1 >= 0) & (s1 < t_len)  # [1, S] lanes that receive a token

    def place(new_ref, old_ref, out_ref):
        rows = new_ref.shape[1] * new_ref.shape[2]
        val = jax.lax.dot(
            new_ref[...].reshape(rows, t_len).astype(jnp.float32), m,
            preferred_element_type=jnp.float32,
        )  # [rows, S]
        old = old_ref[...].reshape(rows, page).astype(jnp.float32)
        out = jnp.where(wmask, val, old)
        out_ref[...] = out.astype(out_ref.dtype).reshape(out_ref.shape)

    place(kn, kp, ko)
    place(vn, vp, vo)
    if quant:
        place(ksn, ksp, kso)
        place(vsn, vsp, vso)


def paged_kv_write(
    pool_k: jax.Array,  # [P, KvH, Dh, S]
    pool_v: jax.Array,
    table: jax.Array,  # [B, MAXP] int32
    pos: jax.Array,  # [B] int32 — absolute position of token 0
    k_new: jax.Array,  # [B, T, KvH, Dh] in the pool dtype
    v_new: jax.Array,
    k_scale: jax.Array | None = None,  # [P, KvH, S] f32 (int8 pools)
    v_scale: jax.Array | None = None,
    ks_new: jax.Array | None = None,  # [B, T, KvH] f32
    vs_new: jax.Array | None = None,
    *,
    interpret: bool | None = None,
):
    """Write T new KV entries per row into the page pool, in place.

    The pallas twin of the XLA advanced-index scatter: XLA's scatter op
    prefers (KvH, Dh) as its tiled layout pair and WINS layout
    assignment against the page-walk kernel, so the whole pool gets
    relayout-copied around the per-layer scan (measured: 64 decode
    slots compiled to ~11 GB of HLO temp copies of a 2.9 GB pool and
    OOM'd a 16 GB chip). This kernel reads and writes the pool in its
    at-rest compact layout with ``input_output_aliases``, so the pool
    is never copied at all.

    Grid ``(B, G)`` where G = max pages a T-token chunk can straddle;
    each step read-modify-writes one page slab. Target pages are
    distinct within a call (one row never revisits a page across its
    groups; rows own disjoint live pages) except reserved scratch page
    0, which absorbs out-of-range writes and token-free groups — its
    content is garbage by contract.

    Returns ``(pool_k, pool_v)`` or ``(pool_k, pool_v, k_scale,
    v_scale)`` when the pool is quantized.
    """
    quant = k_scale is not None
    if interpret is None:
        if jax.default_backend() != "tpu":
            return _paged_kv_write_xla(
                pool_k, pool_v, table, pos, k_new, v_new,
                k_scale, v_scale, ks_new, vs_new,
            )
        interpret = False
    b, t, kvh, dh = k_new.shape
    p_, _, _, s_pg = pool_k.shape
    maxp = table.shape[1]
    g = (t + s_pg - 2) // s_pg + 1  # pages a T-chunk can straddle
    base = pos.astype(jnp.int32) // s_pg
    pgi = base[:, None] + jnp.arange(g, dtype=jnp.int32)[None, :]  # [B, G]
    # token i of row b lands at lane i - shift of group j's page
    shift = pgi * s_pg - pos.astype(jnp.int32)[:, None]  # [B, G]
    live_g = (shift > -s_pg) & (shift < t) & (pgi < maxp)
    pages = jnp.where(
        live_g,
        jnp.take_along_axis(table, jnp.clip(pgi, 0, maxp - 1), axis=1),
        0,
    ).astype(jnp.int32)

    k_t = k_new.transpose(0, 2, 3, 1)  # [B, KvH, Dh, T] (position minor)
    v_t = v_new.transpose(0, 2, 3, 1)
    operands = [pool_k, pool_v, k_t, v_t]

    def pool_idx(bb, jj, pages, shift):
        return (pages[bb, jj], 0, 0, 0)

    def new_idx(bb, jj, pages, shift):
        return (bb, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, kvh, dh, s_pg), pool_idx),
        pl.BlockSpec((1, kvh, dh, s_pg), pool_idx),
        pl.BlockSpec((1, kvh, dh, t), new_idx),
        pl.BlockSpec((1, kvh, dh, t), new_idx),
    ]
    out_specs = [
        pl.BlockSpec((1, kvh, dh, s_pg), pool_idx),
        pl.BlockSpec((1, kvh, dh, s_pg), pool_idx),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(pool_k.shape, pool_k.dtype),
        jax.ShapeDtypeStruct(pool_v.shape, pool_v.dtype),
    ]
    # flat alias indices count the 2 scalar-prefetch operands first
    aliases = {2: 0, 3: 1}
    if quant:
        operands += [
            k_scale.reshape(p_, kvh, 1, s_pg),
            v_scale.reshape(p_, kvh, 1, s_pg),
            ks_new.transpose(0, 2, 1).reshape(b, kvh, 1, t),
            vs_new.transpose(0, 2, 1).reshape(b, kvh, 1, t),
        ]
        in_specs += [
            pl.BlockSpec((1, kvh, 1, s_pg), pool_idx),
            pl.BlockSpec((1, kvh, 1, s_pg), pool_idx),
            pl.BlockSpec((1, kvh, 1, t), new_idx),
            pl.BlockSpec((1, kvh, 1, t), new_idx),
        ]
        out_specs += [
            pl.BlockSpec((1, kvh, 1, s_pg), pool_idx),
            pl.BlockSpec((1, kvh, 1, s_pg), pool_idx),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((p_, kvh, 1, s_pg), jnp.float32),
            jax.ShapeDtypeStruct((p_, kvh, 1, s_pg), jnp.float32),
        ]
        aliases = {2: 0, 3: 1, 6: 2, 7: 3}

    kernel = functools.partial(
        _kv_write_kernel, t_len=t, page=s_pg, quant=quant
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, g),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(pages, shift, *operands)
    if not quant:
        return out[0], out[1]
    return (
        out[0], out[1],
        out[2].reshape(p_, kvh, s_pg), out[3].reshape(p_, kvh, s_pg),
    )


def paged_kv_write_sharded(
    pool_k, pool_v, table, pos, k_new, v_new,
    k_scale=None, v_scale=None, ks_new=None, vs_new=None,
    *,
    mesh: jax.sharding.Mesh,
    axis: str = "model",
):
    """Tensor-parallel page write: :func:`paged_kv_write` under shard_map.

    The write is embarrassingly parallel over KV heads (pools and new-KV
    shard on KvH; tables/positions replicate), mirroring
    :func:`paged_attention_sharded` — a pallas_call cannot be
    partitioned by GSPMD, hence the explicit map.
    """
    from jax.sharding import PartitionSpec as P

    quant = k_scale is not None
    kv_spec = P(None, axis, None, None)
    sc_spec = P(None, axis, None)
    new_spec = P(None, None, axis, None)

    if quant:

        def local(pk, pv, tbl, ps, kn, vn, ksp, vsp, ksn, vsn):
            return paged_kv_write(pk, pv, tbl, ps, kn, vn,
                                  ksp, vsp, ksn, vsn)

        in_specs = (
            kv_spec, kv_spec, P(None, None), P(None), new_spec, new_spec,
            sc_spec, sc_spec, P(None, None, axis), P(None, None, axis),
        )
        out_specs = (kv_spec, kv_spec, sc_spec, sc_spec)
        args = (pool_k, pool_v, table, pos, k_new, v_new,
                k_scale, v_scale, ks_new, vs_new)
    else:

        def local(pk, pv, tbl, ps, kn, vn):
            return paged_kv_write(pk, pv, tbl, ps, kn, vn)

        in_specs = (
            kv_spec, kv_spec, P(None, None), P(None), new_spec, new_spec,
        )
        out_specs = (kv_spec, kv_spec)
        args = (pool_k, pool_v, table, pos, k_new, v_new)

    return jax.shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(*args)
