"""Probe: the cout=2 k7 'last conv' of the M/S stacks at L1.

The r4 trace attributes 18.4 ms/batch to EACH of the two L1 last convs
(fusion.120/125): XLA's conv fusion re-reads the 32-ch input once per
window tap (49x) because the output window is tiny (2 lanes), i.e. the op
is HBM-bound at ~13 GB/batch, not MXU-bound.

Candidate: 1x1 conv 32 -> 49*2 (one input read, 98/128-lane GEMM) followed
by a 49-tap shift-sum of 2-channel planes (f32 accumulation). Useful
traffic ~2.5 GB/batch.
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/work")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from bench_lib import chained_time
from piv_liteflownet_tpu.ops.nn import conv2d

B, H, W = 4, 1024, 1024
CIN, COUT, K = 32, 2, 7
PAD = (K - 1) // 2

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, H, W, CIN), jnp.bfloat16)
w = (jax.random.normal(jax.random.fold_in(key, 1), (K, K, CIN, COUT),
                       jnp.float32) * 0.1).astype(jnp.bfloat16)
bias = jax.random.normal(jax.random.fold_in(key, 2), (COUT,), jnp.bfloat16)


def direct(x):
    return conv2d(x, w, bias, 1, PAD)


def _shift_variant(x, acc_dtype):
    # w1[0,0,c,(dy*K+dx)*COUT+o] = w[dy,dx,c,o]
    w1 = jnp.transpose(w, (2, 0, 1, 3)).reshape(1, 1, CIN, K * K * COUT)
    z = conv2d(x, w1, None, 1, 0)                     # [B,H,W,K*K*COUT]
    zp = jnp.pad(z, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    acc = jnp.zeros((B, H, W, COUT), acc_dtype)
    for dy in range(K):
        for dx in range(K):
            t = dy * K + dx
            sl = lax.slice(zp, (0, dy, dx, t * COUT),
                           (B, dy + H, dx + W, (t + 1) * COUT))
            acc = acc + sl.astype(acc_dtype)
    return (acc + bias.astype(acc_dtype)).astype(x.dtype)


def shift_f32(x):
    return _shift_variant(x, jnp.float32)


def shift_bf16(x):
    return _shift_variant(x, jnp.bfloat16)


def shift_rows(x):
    """dy-grouped: one 14-lane slab read per kernel row, dx-sum inside."""
    w1 = jnp.transpose(w, (2, 0, 1, 3)).reshape(1, 1, CIN, K * K * COUT)
    z = conv2d(x, w1, None, 1, 0)
    zp = jnp.pad(z, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    acc = jnp.zeros((B, H, W, COUT), jnp.float32)
    for dy in range(K):
        slab = lax.slice(zp, (0, dy, 0, dy * K * COUT),
                         (B, dy + H, W + 2 * PAD, (dy + 1) * K * COUT))
        row = jnp.zeros((B, H, W, COUT), jnp.float32)
        for dx in range(K):
            sl = lax.slice(slab, (0, 0, dx, dx * COUT),
                           (B, H, dx + W, (dx + 1) * COUT))
            row = row + sl.astype(jnp.float32)
        acc = acc + row
    return (acc + bias.astype(jnp.float32)).astype(x.dtype)


# exactness first (tolerance: summation-order deltas only)
ref = np.asarray(jax.jit(direct)(x), np.float32)
for name, fn in [("shift_f32", shift_f32), ("shift_bf16", shift_bf16),
                 ("shift_rows", shift_rows)]:
    got = np.asarray(jax.jit(fn)(x), np.float32)
    d = np.abs(got - ref).max()
    rel = d / max(np.abs(ref).max(), 1e-9)
    print(f"{name}: max|diff|={d:.3e} (rel {rel:.3e})")

for name, fn in [("direct", direct), ("shift_f32", shift_f32),
                 ("shift_bf16", shift_bf16), ("shift_rows", shift_rows)]:
    t = chained_time(fn, (x,))
    print(f"lastconv {name:11s} b{B} {H}^2 {CIN}->{COUT} k{K}: "
          f"{t * 1e3:8.2f} ms/batch = {t / B * 1e3:6.2f} ms/pair")
