"""Bisect the window-warp kernel cost: DMA vs fori vs sublane shifts vs FMA."""

import functools
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/work")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench_lib import chained_time

TH, TW, CP, R = 16, 128, 128, 4
NY, NX = 2 * R + 2, 2 * R + 9  # 10, 17


def kernel(mode, x_ref, out_ref, acc_ref):
    dt = acc_ref.dtype
    acc_ref[...] = jnp.zeros((TH, TW, CP), dt)

    if mode == "fma_only":  # 170 FMAs, NO shifts at all
        def body(dy, c):
            rows = x_ref[0, 0:TH, 0:TW, :]
            for dx in range(NX):
                acc_ref[...] += jnp.asarray(0.01 * dx, dt) * rows
            return c
        jax.lax.fori_loop(0, NY, body, 0)
    elif mode == "dim0_shift":  # dynamic dim-1 (untiled) ref slices per dy
        def body(dy, c):
            rows = x_ref[0, pl.ds(dy, TH), 0:TW, :]
            for dx in range(NX):
                acc_ref[...] += jnp.asarray(0.01 * dx, dt) * rows
            return c
        jax.lax.fori_loop(0, NY, body, 0)
    elif mode == "sublane_shift":  # + static sublane (dim-2) slices per tap
        def body(dy, c):
            rows = x_ref[0, pl.ds(dy, TH), :, :]
            for dx in range(NX):
                acc_ref[...] += jnp.asarray(0.01 * dx, dt) * rows[:, dx : dx + TW, :]
            return c
        jax.lax.fori_loop(0, NY, body, 0)
    elif mode == "unrolled_sublane":  # no fori: fully static double loop
        for dy in range(NY):
            for dx in range(NX):
                acc_ref[...] += jnp.asarray(0.01 * dx, dt) * x_ref[0, dy : dy + TH, dx : dx + TW, :]
    out_ref[0] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("mode",))
def run(x, mode):
    b, hp, wp = x.shape[0], x.shape[1], x.shape[2]
    nth, ntw = (hp - 16) // TH, (wp - 24) // TW
    return pl.pallas_call(
        functools.partial(kernel, mode),
        grid=(b, nth, ntw),
        in_specs=[pl.BlockSpec((1, TH + 16, TW + 24, CP),
                               lambda ib, i, j: (ib, i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TH, TW, CP), lambda ib, i, j: (ib, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nth * TH, ntw * TW, CP), x.dtype),
        scratch_shapes=[pltpu.VMEM((TH, TW, CP), x.dtype)],
    )(x)


def main():
    b = 4
    nth, ntw = 64, 8
    # block index maps step in units of the block shape -> lay tiles out
    # disjointly (perf-only bisection; values are irrelevant)
    hp, wp = nth * (TH + 16), ntw * (TW + 24)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, hp, wp, CP), jnp.bfloat16)
    for mode in ("fma_only", "dim0_shift", "sublane_shift", "unrolled_sublane"):
        try:
            t = chained_time(lambda a: run(a, mode), (x,))
            print(f"{mode}: {t*1000:.2f} ms  (b{b}, {nth*TH}x{ntw*TW}x{CP}, {NY*NX} taps)", flush=True)
        except Exception as e:
            print(f"{mode}: FAILED {str(e)[:200]}", flush=True)


main()
