"""Flash vs einsum attention on the real chip (chained-execution timing).

Usage: python tools/bench_attention.py [S] [B] [H] [D] [DTYPE]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from outline_rag_tpu.ops.attention import NEG_BIAS, flash_attention

S = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
H = int(sys.argv[3]) if len(sys.argv) > 3 else 16
D = int(sys.argv[4]) if len(sys.argv) > 4 else 64
DT = {"bf16": jnp.bfloat16, "f32": jnp.float32}[
    sys.argv[5] if len(sys.argv) > 5 else "bf16"
]

print(f"backend={jax.default_backend()} S={S} B={B} H={H} D={D} {DT.__name__}")

key = jax.random.key(0)
kq, kk, kv = jax.random.split(key, 3)
q = jax.random.normal(kq, (B, S, H, D), jnp.float32).astype(DT)
k = jax.random.normal(kk, (B, S, H, D), jnp.float32).astype(DT)
v = jax.random.normal(kv, (B, S, H, D), jnp.float32).astype(DT)
# REAL_LEN: number of real (unmasked) tokens per row — short docs in a
# long bucket leave whole key tiles masked, which the kernel's live-tile
# skip should turn into near-free steps. Default keeps the historical
# 7/8-real shape.
REAL_LEN = int(os.environ.get("REAL_LEN", S - S // 8))
bias = jnp.zeros((B, S), jnp.float32).at[:, REAL_LEN:].set(NEG_BIAS)


@jax.jit
def einsum_attn(q, k, v, bias):
    d = q.shape[-1]
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.float32(d)) + bias[:, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bnqk,bknd->bqnd", probs, v)


BQ = int(os.environ.get("BQ", 0)) or None
BK = int(os.environ.get("BK", 0)) or None


@jax.jit
def flash(q, k, v, bias):
    return flash_attention(q, k, v, bias, block_q=BQ, block_k=BK, interpret=False)


_ctr = [0]


def chained(fn, iters):
    # inputs vary per dispatch (dtype-visible offset: 1e-3 clears the
    # bf16 ulp at unit-normal magnitudes) + data carry — bit-identical
    # repeats can be served by a caching tunnel layer (CLAUDE.md)
    carry = jnp.float32(0)
    for _ in range(iters):
        _ctr[0] += 1
        qq = q + (carry * 1e-9 + (_ctr[0] % 97 + 1) * 1e-3).astype(DT)
        out = fn(qq, k, v, bias)
        carry = carry + jnp.sum(out[:, 0, 0, :2].astype(jnp.float32))
    return float(carry)


def timeit(name, fn, iters=8):
    chained(fn, 1)  # compile
    t0 = time.perf_counter()
    one = chained(fn, 1)
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    chained(fn, iters)
    t_many = time.perf_counter() - t0
    dt = max(t_many - max(t_one - t_many / iters, 0.0), t_many / iters) / iters
    flops = 4 * B * H * S * S * D
    print(f"{name:8s} {dt * 1e3:8.2f} ms/iter  {flops / dt / 1e12:6.2f} TFLOP/s")
    return dt


run_einsum = not os.environ.get("SKIP_ORACLE")  # S=8k einsum OOMs 16G HBM
if run_einsum:
    fo = jnp.asarray(flash(q, k, v, bias), jnp.float32)
    eo = jnp.asarray(einsum_attn(q, k, v, bias), jnp.float32)
    valid = jnp.asarray(bias == 0.0, jnp.float32)[:, :, None, None]
    err = float(jnp.max(jnp.abs((fo - eo) * valid)))
    print(f"max |flash - einsum| on valid rows: {err:.3e}")
    t_e = timeit("einsum", einsum_attn)
t_f = timeit("flash", flash)
if run_einsum:
    print(f"speedup: {t_e / t_f:.2f}x")
