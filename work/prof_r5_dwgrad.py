"""Depthwise-deconv weight-grad microbench (r5): XLA autodiff vs a
phase-slice mult-reduce reformulation.

The flow/cost-volume upsamplers are depthwise ``ConvTranspose2d(k=4, s=2,
p=1, groups=C)`` (ops/nn.depthwise_deconv4x2); their weight-grad output is
the tiny [4,4,1,C] filter — the same small-output-window pathology measured
on the cout=2 flow heads and the stride-2 conv wgrads (work/r5_wgrad.log).
Every level transition differentiates two of these (flow C=2, upCorr C=49).

Reformulation: with out = conv(dilate2(x), wf, pad 2), the tap (dy,dx)
gradient is sum over positions where the dilated index is even:
    gw[dy,dx,0,c] = sum_{b,i,j} x[b,i,j,c] * gpad[b, 2i+dy, 2j+dx, c]
i.e. an elementwise multiply of x with a stride-2 slice of the padded
cotangent, fully VPU-parallel, 16 taps sharing one read of x.

Usage: python work/prof_r5_dwgrad.py
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/work")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax

from bench_lib import chained_time
from piv_liteflownet_tpu.ops.nn import depthwise_deconv4x2


def dwgrad_auto(x, g, c):
    w0 = jnp.zeros((4, 4, 1, c), x.dtype)

    def f(w):
        return jnp.sum(depthwise_deconv4x2(x, w) * g)

    return jax.grad(f)(w0)


def dwgrad_phase(x, g, c):
    """out[y] = sum_dy wf[dy] * x[(y+dy-2)/2] (even dilated index), so
    gw[dy,dx,0,c] = sum_{b,i,j} x[b,i,j,c] * g[b, 2i+2-dy, 2j+2-dx, c]
    = x . stride-2 slice of the padded cotangent at offset (4-dy, 4-dx)."""
    b, hi, wi, _ = x.shape
    gpad = jnp.pad(g, ((0, 0), (2, 3), (2, 3), (0, 0)))
    xf = x.astype(jnp.float32)
    taps = []
    for dy in range(4):
        for dx in range(4):
            oy, ox = 4 - dy, 4 - dx
            sl = lax.slice(gpad, (0, oy, ox, 0),
                           (b, oy + 2 * hi - 1, ox + 2 * wi - 1, c),
                           (1, 2, 2, 1)).astype(jnp.float32)
            taps.append(jnp.sum(xf * sl, axis=(0, 1, 2)))
    return jnp.stack(taps).reshape(4, 4, 1, c).astype(x.dtype)


CASES = [
    # (name, B, Hin, Win, C) — train 256^2 shapes: flow and upCorr upsamplers
    ("flow  C=2  L2->L1", 8, 128, 128, 2),
    ("upCorr C=49 L2->L1", 8, 128, 128, 49),
    ("flow  C=2  L3->L2", 8, 64, 64, 2),
    ("upCorr C=49 L3->L2", 8, 64, 64, 49),
]


def main():
    for name, b, hi, wi, c in CASES:
        key = jax.random.PRNGKey(0)
        x = jax.random.uniform(key, (b, hi, wi, c), jnp.bfloat16)
        g = jax.random.uniform(jax.random.fold_in(key, 1),
                               (b, 2 * hi, 2 * wi, c), jnp.bfloat16)

        ref = dwgrad_auto(x, g, c)
        got = dwgrad_phase(x, g, c)
        err = float(jnp.max(jnp.abs((got - ref).astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0

        t_auto = chained_time(lambda a, gg: dwgrad_auto(a, gg, c), (x, g))
        t_phase = chained_time(lambda a, gg: dwgrad_phase(a, gg, c), (x, g))
        print(f"{name}: auto {t_auto*1e3:7.2f} ms | phase {t_phase*1e3:7.2f} "
              f"ms | rel-err {err/scale:.2e}", flush=True)


if __name__ == "__main__":
    main()
