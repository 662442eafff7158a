"""Paged decode attention: page-table walk kernel vs gather reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from outline_rag_tpu.ops.paged_attention import (
    paged_attention,
    paged_attention_xla,
)


def _setup(b=2, t=3, h=8, kvh=4, dh=64, pages=16, page=128, maxp=4, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((b, t, h, dh)).astype(np.float32)
    # pools are position-MINOR: [P, KvH, Dh, page]
    pool_k = rng.standard_normal((pages, kvh, dh, page)).astype(np.float32)
    pool_v = rng.standard_normal((pages, kvh, dh, page)).astype(np.float32)
    # each row owns maxp distinct pages, scattered through the pool
    table = np.stack(
        [rng.permutation(pages)[:maxp] for _ in range(b)]
    ).astype(np.int32)
    pos = rng.integers(0, maxp * page - t, size=(b,)).astype(np.int32)
    return (
        jnp.asarray(q), jnp.asarray(pool_k), jnp.asarray(pool_v),
        jnp.asarray(table), jnp.asarray(pos),
    )


def _dense_oracle(q, pool_k, pool_v, table, pos):
    """Plain numpy softmax-attention over the gathered pages."""
    q, pool_k, pool_v, table, pos = map(np.asarray, (q, pool_k, pool_v, table, pos))
    b, t, h, dh = q.shape
    _, kvh, _, page = pool_k.shape
    maxp = table.shape[1]
    c = maxp * page
    group = h // kvh
    out = np.zeros_like(q)
    for bi in range(b):
        k = pool_k[table[bi]].transpose(1, 0, 3, 2).reshape(kvh, c, dh)
        v = pool_v[table[bi]].transpose(1, 0, 3, 2).reshape(kvh, c, dh)
        for ti in range(t):
            for hi in range(h):
                kv = hi // group
                logits = (k[kv] @ q[bi, ti, hi]) / np.sqrt(dh)
                logits[np.arange(c) > pos[bi] + ti] = -1e9
                p = np.exp(logits - logits.max())
                p /= p.sum()
                out[bi, ti, hi] = p @ v[kv]
    return out


def test_xla_reference_matches_dense_oracle():
    args = _setup()
    got = np.asarray(paged_attention_xla(*args))
    want = _dense_oracle(*args)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


VARIANTS = ["head", "page", "dma"]


@pytest.mark.parametrize("variant", VARIANTS)
@pytest.mark.parametrize("t", [1, 4])
def test_kernel_interpret_matches_reference(t, variant):
    args = _setup(t=t, seed=t)
    got = np.asarray(paged_attention(*args, interpret=True, variant=variant))
    want = np.asarray(paged_attention_xla(*args))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("variant", VARIANTS)
def test_kernel_scattered_pages_and_row_divergence(variant):
    """Rows with different positions and wildly different page layouts:
    the walk must follow each row's own table."""
    args = _setup(b=3, t=2, pages=32, maxp=6, seed=7)
    got = np.asarray(paged_attention(*args, interpret=True, variant=variant))
    want = np.asarray(paged_attention_xla(*args))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("variant", VARIANTS)
def test_kernel_rows_shorter_than_one_page(variant):
    """Every row's live length is inside page 0: dead table entries must
    contribute nothing (the dma walk must not even touch them)."""
    q, pool_k, pool_v, table, _ = _setup(b=3, t=2, pages=32, maxp=6, seed=9)
    pos = jnp.asarray([0, 5, 117], jnp.int32)
    got = np.asarray(
        paged_attention(q, pool_k, pool_v, table, pos,
                        interpret=True, variant=variant)
    )
    want = np.asarray(paged_attention_xla(q, pool_k, pool_v, table, pos))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_pos_zero_attends_single_slot():
    q, pool_k, pool_v, table, _ = _setup(b=1, t=1)
    pos = jnp.zeros((1,), jnp.int32)
    got = np.asarray(paged_attention(q, pool_k, pool_v, table, pos, interpret=True))
    # only slot 0 of the first page visible -> output = its v row exactly
    first_page = np.asarray(table)[0, 0]
    v0 = np.asarray(pool_v)[first_page, :, :, 0]  # [KvH, Dh]
    want = np.repeat(v0, 2, axis=0)  # group=2 query heads per kv head
    np.testing.assert_allclose(got[0, 0], want, atol=2e-5)


def test_decoder_forward_paged_matches_ring():
    """Same tokens through a ring cache and a paged cache (pages
    scattered through the pool): identical logits, and incremental
    decoding through the paged cache matches prefill."""
    from outline_rag_tpu.models.decoder import (
        DecoderConfig,
        PagedKV,
        decoder_forward,
        init_cache,
        init_decoder_params,
        init_paged_cache,
        stack_decoder_params,
    )

    cfg = DecoderConfig.tiny()  # max_cache=64
    params = stack_decoder_params(init_decoder_params(jax.random.key(0), cfg))
    b, t = 2, 10
    toks = jax.random.randint(jax.random.key(1), (b, t), 0, cfg.vocab_size)
    zero = jnp.zeros((b,), jnp.int32)

    want, _ = decoder_forward(params, toks, init_cache(cfg, b), zero, cfg)

    page = 16
    paged = init_paged_cache(cfg, b, pages=12, page_size=page)  # maxp=4
    # disjoint, non-contiguous page assignment per row (page 0 reserved)
    table = jnp.asarray([[3, 1, 7, 5], [2, 9, 4, 11]], jnp.int32)
    paged = PagedKV(k=paged.k, v=paged.v, table=table)
    got, paged = decoder_forward(params, toks, paged, zero, cfg)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
    )

    # continue decoding one token at a time through the paged cache
    ring = init_cache(cfg, b)
    _, ring = decoder_forward(params, toks, ring, zero, cfg)
    nxt = jnp.argmax(want[:, -1], axis=-1).astype(jnp.int32)
    for i in range(4):
        posv = jnp.full((b,), t + i, jnp.int32)
        lw, ring = decoder_forward(params, nxt[:, None], ring, posv, cfg)
        lg, paged = decoder_forward(params, nxt[:, None], paged, posv, cfg)
        np.testing.assert_allclose(
            np.asarray(lg), np.asarray(lw), atol=2e-4, rtol=2e-4
        )
        nxt = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)


def test_generate_chunk_paged_greedy_matches_ring():
    """Device-side chunked generation is cache-form agnostic."""
    from outline_rag_tpu.models.decoder import (
        DecoderConfig,
        PagedKV,
        decoder_forward,
        generate_chunk,
        init_cache,
        init_decoder_params,
        init_paged_cache,
        stack_decoder_params,
    )

    cfg = DecoderConfig.tiny()
    params = stack_decoder_params(init_decoder_params(jax.random.key(0), cfg))
    prompt = jax.random.randint(jax.random.key(2), (1, 5), 0, cfg.vocab_size)
    zero = jnp.zeros((1,), jnp.int32)

    def gen(cache):
        lg, cache = decoder_forward(params, prompt, cache, zero, cfg)
        first = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
        toks, *_ = generate_chunk(
            params, cache, first, jnp.full((1,), 5, jnp.int32),
            jax.random.key(0), cfg, n_steps=8, temperature=0.0,
            top_p=1.0, eos_id=-1,
        )
        return [int(first[0])] + np.asarray(toks)[0].tolist()

    ring_out = gen(init_cache(cfg, 1))
    paged = init_paged_cache(cfg, 1, pages=6, page_size=16)
    paged = PagedKV(k=paged.k, v=paged.v,
                    table=jnp.asarray([[4, 2, 5, 1]], jnp.int32))
    assert gen(paged) == ring_out


def _quantize_pool(pool):
    """Symmetric per-token per-head int8 quantization of an f32 pool
    ([P, KvH, Dh, S] position-minor; token = a Dh column -> scale over
    axis -2, giving [P, KvH, S] scales)."""
    a = np.max(np.abs(np.asarray(pool, np.float32)), axis=-2, keepdims=True)
    s = a / 127.0 + 1e-12
    q = np.clip(np.round(np.asarray(pool) / s), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(s[..., 0, :].astype(np.float32))


def test_xla_reference_int8_matches_dequantized_oracle():
    q, pool_k, pool_v, table, pos = _setup(seed=11)
    k_q, k_s = _quantize_pool(pool_k)
    v_q, v_s = _quantize_pool(pool_v)
    got = np.asarray(paged_attention_xla(q, k_q, v_q, table, pos, k_s, v_s))
    # oracle over the dequantized values: the int8 path must match it
    # exactly up to float assoc (the quantization error itself cancels)
    k_deq = jnp.asarray(
        np.asarray(k_q, np.float32) * np.asarray(k_s)[..., None, :]
    )
    v_deq = jnp.asarray(
        np.asarray(v_q, np.float32) * np.asarray(v_s)[..., None, :]
    )
    want = _dense_oracle(q, k_deq, v_deq, table, pos)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("variant", VARIANTS)
@pytest.mark.parametrize("t", [1, 4])
def test_kernel_interpret_int8_matches_reference(t, variant):
    q, pool_k, pool_v, table, pos = _setup(t=t, seed=20 + t)
    k_q, k_s = _quantize_pool(pool_k)
    v_q, v_s = _quantize_pool(pool_v)
    got = np.asarray(
        paged_attention(q, k_q, v_q, table, pos, k_s, v_s,
                        interpret=True, variant=variant)
    )
    want = np.asarray(paged_attention_xla(q, k_q, v_q, table, pos, k_s, v_s))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=3e-5)


def test_decoder_forward_paged_int8_quality():
    """int8 KV pool: logits track the f32 ring within quantization
    tolerance (per-position cosine > 0.999) through prefill + decode."""
    from outline_rag_tpu.models.decoder import (
        DecoderConfig,
        PagedKV,
        decoder_forward,
        init_cache,
        init_decoder_params,
        init_paged_cache,
        stack_decoder_params,
    )

    cfg = DecoderConfig.tiny()  # max_cache=64, f32
    params = stack_decoder_params(init_decoder_params(jax.random.key(0), cfg))
    b, t = 2, 24
    toks = jax.random.randint(jax.random.key(1), (b, t), 0, cfg.vocab_size)
    zero = jnp.zeros((b,), jnp.int32)

    want, ring = decoder_forward(params, toks, init_cache(cfg, b), zero, cfg)

    paged = init_paged_cache(cfg, b, pages=12, page_size=16, kv_dtype="int8")
    table = jnp.asarray([[3, 1, 7, 5], [2, 9, 4, 11]], jnp.int32)
    paged = dataclasses_replace(paged, table=table)
    got, paged = decoder_forward(params, toks, paged, zero, cfg)

    def cos(a, b_):
        a = np.asarray(a, np.float64).reshape(-1)
        b_ = np.asarray(b_, np.float64).reshape(-1)
        return float(a @ b_ / (np.linalg.norm(a) * np.linalg.norm(b_) + 1e-12))

    for bi in range(b):
        for ti in range(t):
            assert cos(got[bi, ti], want[bi, ti]) > 0.999

    # decode a few tokens: stays close step by step
    nxt = jnp.argmax(want[:, -1], axis=-1).astype(jnp.int32)
    for i in range(3):
        posv = jnp.full((b,), t + i, jnp.int32)
        lw, ring = decoder_forward(params, nxt[:, None], ring, posv, cfg)
        lg, paged = decoder_forward(params, nxt[:, None], paged, posv, cfg)
        assert cos(lg, lw) > 0.999
        nxt = jnp.argmax(lw[:, -1], axis=-1).astype(jnp.int32)


def dataclasses_replace(obj, **kw):
    import dataclasses

    return dataclasses.replace(obj, **kw)


# ----------------------------------------------------------------------
# KV page-write kernel
# ----------------------------------------------------------------------


def _write_setup(b=3, t=1, kvh=4, dh=64, pages=16, page=128, maxp=4,
                 seed=0, quant=False, straddle=False):
    from outline_rag_tpu.ops.paged_attention import _paged_kv_write_xla

    rng = np.random.default_rng(seed)
    if quant:
        pool_k = rng.integers(-127, 128, (pages, kvh, dh, page)).astype(np.int8)
        pool_v = rng.integers(-127, 128, (pages, kvh, dh, page)).astype(np.int8)
        k_new = rng.integers(-127, 128, (b, t, kvh, dh)).astype(np.int8)
        v_new = rng.integers(-127, 128, (b, t, kvh, dh)).astype(np.int8)
        ksp = rng.random((pages, kvh, page)).astype(np.float32)
        vsp = rng.random((pages, kvh, page)).astype(np.float32)
        ksn = rng.random((b, t, kvh)).astype(np.float32)
        vsn = rng.random((b, t, kvh)).astype(np.float32)
        extra = tuple(map(jnp.asarray, (ksp, vsp, ksn, vsn)))
    else:
        pool_k = rng.standard_normal((pages, kvh, dh, page)).astype(np.float32)
        pool_v = rng.standard_normal((pages, kvh, dh, page)).astype(np.float32)
        k_new = rng.standard_normal((b, t, kvh, dh)).astype(np.float32)
        v_new = rng.standard_normal((b, t, kvh, dh)).astype(np.float32)
        extra = ()
    # page 0 reserved for scratch; rows own disjoint live pages
    perm = rng.permutation(pages - 1) + 1
    table = perm[: b * maxp].reshape(b, maxp).astype(np.int32)
    if straddle:
        # start mid-page so a T>1 chunk spans a page boundary; row 0
        # runs off the table end (capacity guard -> scratch page 0)
        pos = np.array(
            [maxp * page - max(1, t // 2)]
            + [page - 1 - (i % page) for i in range(1, b)],
            np.int32,
        )
        pos = np.minimum(pos, maxp * page - 1)
    else:
        pos = rng.integers(0, maxp * page - t, size=(b,)).astype(np.int32)
    args = (
        jnp.asarray(pool_k), jnp.asarray(pool_v), jnp.asarray(table),
        jnp.asarray(pos), jnp.asarray(k_new), jnp.asarray(v_new), *extra,
    )
    want = _paged_kv_write_xla(*args)
    return args, want


@pytest.mark.parametrize("t", [1, 8, 64, 160])
@pytest.mark.parametrize("straddle", [False, True])
def test_kv_write_kernel_matches_scatter_oracle(t, straddle):
    from outline_rag_tpu.ops.paged_attention import paged_kv_write

    args, want = _write_setup(t=t, straddle=straddle, seed=t)
    got = paged_kv_write(*args, interpret=True)
    # page 0 is the scratch target of out-of-range writes: its content
    # is garbage by contract and the kernel's group-wise write pattern
    # differs from the scatter's token-wise one there
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g)[1:], np.asarray(w)[1:])


@pytest.mark.parametrize("t", [1, 64])
def test_kv_write_kernel_int8_matches_scatter_oracle(t):
    from outline_rag_tpu.ops.paged_attention import paged_kv_write

    args, want = _write_setup(t=t, quant=True, straddle=True, seed=7 + t)
    got = paged_kv_write(*args, interpret=True)
    assert len(got) == 4
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g)[1:], np.asarray(w)[1:])


def test_kv_write_kernel_dh128_and_offset_start():
    from outline_rag_tpu.ops.paged_attention import paged_kv_write

    args, want = _write_setup(t=96, dh=128, kvh=2, straddle=True, seed=3)
    got = paged_kv_write(*args, interpret=True)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g)[1:], np.asarray(w)[1:])


# ----------------------------------------------------------------------
# Walk-variant resolution (shape-aware fallbacks)
# ----------------------------------------------------------------------


def _resolve(variant, *, gt=2, kvh=4, dh=64, s_pg=128, quant=False,
             q_itemsize=2, kv_itemsize=2):
    from outline_rag_tpu.ops.paged_attention import resolve_walk_variant

    return resolve_walk_variant(
        variant, gt=gt, kvh=kvh, dh=dh, s_pg=s_pg, quant=quant,
        q_itemsize=q_itemsize, kv_itemsize=kv_itemsize,
    )


def test_variant_default_is_page_at_decode_shapes(monkeypatch):
    monkeypatch.delenv("ORT_PAGED_VARIANT", raising=False)
    assert _resolve(None) == "page"


def test_variant_env_override(monkeypatch):
    monkeypatch.setenv("ORT_PAGED_VARIANT", "dma")
    assert _resolve(None) == "dma"


def test_variant_invalid_raises():
    with pytest.raises(ValueError, match="unknown paged-attention"):
        _resolve("Page")


def test_variant_prefill_gt_falls_back_to_head():
    # B=64/T=256 prefill shape that measured 18.14M scoped VMEM on chip
    # (remote-compile OOM against the 16 MB budget) — must pick "head"
    assert _resolve("page", gt=2048) == "head"
    assert _resolve("dma", gt=2048) == "head"
    # per-head walk has no all-heads residency: stays as asked
    assert _resolve("head", gt=2048) == "head"


def test_variant_decode_gt_keeps_page():
    # decode: gt = group*1, far under the budget at any sane config
    assert _resolve("page", gt=8) == "page"
    assert _resolve("dma", gt=8) == "dma"


def test_variant_dma_needs_lane_aligned_pages():
    assert _resolve("dma", s_pg=16) == "head"
    assert _resolve("page", s_pg=16) == "page"  # page walk has no DMA slices


def test_variant_page256_pool_still_fits_at_decode():
    # the BENCH_PAGE=256 experiment: double-size page slabs at decode
    # shapes must not trip the VMEM fallback
    assert _resolve("page", gt=8, s_pg=256) == "page"
    assert _resolve("dma", gt=8, s_pg=256) == "dma"


@pytest.mark.parametrize("quant", [False, True])
def test_paged_scan_carry_matches_xs(monkeypatch, quant):
    """ORT_PAGED_SCAN=carry (pools carried through the layer scan over a
    layer-flattened [(L*P), ...] view, per-layer table offsets) must be
    BIT-identical to the xs/ys form — same kernels, same math, only the
    scan data-flow differs."""
    from outline_rag_tpu.models.decoder import (
        DecoderConfig,
        PagedKV,
        decoder_forward,
        init_decoder_params,
        init_paged_cache,
        stack_decoder_params,
    )

    cfg = DecoderConfig.tiny()  # max_cache=64
    params = stack_decoder_params(init_decoder_params(jax.random.key(5), cfg))
    b, t = 2, 10
    toks = jax.random.randint(jax.random.key(6), (b, t), 0, cfg.vocab_size)
    zero = jnp.zeros((b,), jnp.int32)
    table = jnp.asarray([[3, 1, 7, 5], [2, 9, 4, 11]], jnp.int32)

    def run(mode):
        monkeypatch.setenv("ORT_PAGED_SCAN", mode)
        paged = init_paged_cache(
            cfg, b, pages=12, page_size=16,
            kv_dtype="int8" if quant else None,
        )
        paged = PagedKV(
            k=paged.k, v=paged.v, table=table,
            k_scale=paged.k_scale, v_scale=paged.v_scale,
        )
        lg, paged = decoder_forward(params, toks, paged, zero, cfg)
        outs = [lg]
        nxt = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
        for i in range(3):  # decode steps straddle a page boundary
            posv = jnp.full((b,), t + i, jnp.int32)
            lg, paged = decoder_forward(params, nxt[:, None], paged, posv, cfg)
            outs.append(lg)
            nxt = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
        return outs, paged

    want, cache_xs = run("xs")
    got, cache_carry = run("carry")
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    # the pool contents themselves must agree (live pages; page 0 and
    # layer-slot-0 scratch are garbage by contract)
    for a, c in zip(
        (cache_xs.k, cache_xs.v), (cache_carry.k, cache_carry.v)
    ):
        live = np.asarray(table).ravel()
        np.testing.assert_array_equal(
            np.asarray(c)[:, live], np.asarray(a)[:, live]
        )
