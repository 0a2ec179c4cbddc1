"""Conv weight-grad microbench: XLA's autodiff wgrad vs a shifted-GEMM
reformulation (r5; the wall probe attributes 55.7 ms/step of the 151 ms
train step to the weight-grad convs — work/r5_wall.log).

Hypothesis: XLA lowers wgrad as a conv whose OUTPUT is the tiny [k,k,Cin,
Cout] filter — the same small-output-window pathology as the cout=2 flow
heads — while the same contraction expressed as k^2 shifted GEMMs
(act^T @ gout per tap, K = B*H*W) runs at plain MXU rate.

Usage: python work/prof_r5_wgrad.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax

from bench_lib import chained_time  # noqa: E402

sys.path.insert(0, "/root/repo/work")
from piv_liteflownet_tpu.ops.nn import conv2d  # noqa: E402


def wgrad_auto(x, g, w_shape, stride, padding):
    kh, kw, cin, cout = w_shape
    w0 = jnp.zeros(w_shape, x.dtype)

    def f(w):
        return jnp.sum(conv2d(x, w, None, stride, padding) * g)

    return jax.grad(f)(w0)


def wgrad_shift(x, g, w_shape, stride, padding):
    """wgrad[dy,dx,ci,co] = sum_bhw xpad[b, s*h+dy, s*w+dx, ci] * g[b,h,w,co]
    as kh*kw GEMMs with K = B*Ho*Wo (f32 accumulation like XLA's)."""
    kh, kw, cin, cout = w_shape
    b, h, w, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    ho = (h + 2 * padding - kh) // stride + 1
    wo = (w + 2 * padding - kw) // stride + 1
    g2 = g.reshape(b * ho * wo, cout)
    taps = []
    for dy in range(kh):
        for dx in range(kw):
            sl = lax.slice(
                xp, (0, dy, dx, 0),
                (b, dy + (ho - 1) * stride + 1, dx + (wo - 1) * stride + 1, cin),
                (1, stride, stride, 1),
            ).reshape(b * ho * wo, cin)
            taps.append(
                lax.dot_general(sl, g2, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32))
    return jnp.stack(taps).reshape(kh, kw, cin, cout).astype(x.dtype)


CASES = [
    # (name, B, H, W, cin, cout, k, stride) — the r4 train-step conv shapes
    ("S-mid  128->64 L1", 8, 256, 256, 128, 64, 3, 1),
    ("M-top   49->128 L1", 8, 256, 256, 49, 128, 3, 1),
    ("NetC    32->32 L2", 8, 128, 128, 32, 32, 3, 1),
    ("NetC    32->64 s2", 8, 128, 128, 32, 64, 3, 2),
    ("R-dist 128->49 L1", 8, 256, 256, 128, 49, 3, 1),
    ("head    32->2 k7", 8, 256, 256, 32, 2, 7, 1),
    ("NetC     3->32 k7", 8, 384, 384, 3, 32, 7, 1),
]


def main():
    for name, b, h, w, cin, cout, k, stride in CASES:
        key = jax.random.PRNGKey(0)
        x = jax.random.uniform(key, (b, h, w, cin), jnp.bfloat16)
        pad = k // 2
        ho = (h + 2 * pad - k) // stride + 1
        wo = (w + 2 * pad - k) // stride + 1
        g = jax.random.uniform(jax.random.fold_in(key, 1),
                               (b, ho, wo, cout), jnp.bfloat16)
        wsh = (k, k, cin, cout)

        ref = wgrad_auto(x, g, wsh, stride, pad)
        got = wgrad_shift(x, g, wsh, stride, pad)
        import numpy as np

        err = float(jnp.max(jnp.abs((got - ref).astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
        flops = 2 * b * ho * wo * k * k * cin * cout

        t_auto = chained_time(
            lambda a, gg: wgrad_auto(a, gg, wsh, stride, pad), (x, g))
        t_shift = chained_time(
            lambda a, gg: wgrad_shift(a, gg, wsh, stride, pad), (x, g))
        print(f"{name}: auto {t_auto*1e3:7.2f} ms ({flops/t_auto/1e12:5.1f} "
              f"TF/s) | shift {t_shift*1e3:7.2f} ms ({flops/t_shift/1e12:5.1f} "
              f"TF/s) | rel-err {err/scale:.2e}", flush=True)


if __name__ == "__main__":
    main()
