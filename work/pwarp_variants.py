"""Isolate window-warp kernel costs: FMA floor vs weight-broadcast overhead."""

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
SH, SW = 32, 144
NY, NX = 2 * R + 2, 2 * R + 9


def kernel(mode, sy_ref, sx_ref, ru_ref, rv_ref, img_ref, out_ref, slab_ref, acc_ref, sem):
    ib, ti, tj = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    sx = pl.multiple_of(sx_ref[ib, ti, tj], 8)
    dma = pltpu.make_async_copy(
        img_ref.at[ib, pl.ds(sy_ref[ib, ti, tj], SH), pl.ds(sx, SW), :], slab_ref, sem)
    dma.start()
    dt = acc_ref.dtype
    res_u = ru_ref[0]
    res_v = rv_ref[0]
    wy = [jnp.maximum(0.0, 1.0 - jnp.abs(res_v - (dy - R))) for dy in range(NY)]
    wx = [jnp.maximum(0.0, 1.0 - jnp.abs(res_u - (dx - R))) for dx in range(NX)]
    dma.wait()
    acc_ref[...] = jnp.zeros((TH, TW, CP), dt)

    def body(dy, carry):
        rows = slab_ref[pl.ds(dy, TH), :, :]
        if mode == "scalar":  # FMA floor: no per-pixel weights at all
            for dx in range(NX):
                acc_ref[...] += jnp.asarray(0.01 * dx, dt) * rows[:, dx : dx + TW, :]
        elif mode == "noshift":  # FMA floor without the per-tap sublane slice
            for dx in range(NX):
                acc_ref[...] += jnp.asarray(0.01 * dx, dt) * rows[:, 0:TW, :]
        elif mode == "nofma":  # shifts only, one FMA per dy
            s_ = rows[:, 0:TW, :]
            for dx in range(1, NX):
                s_ = s_ + rows[:, dx : dx + TW, :]
            acc_ref[...] += jnp.asarray(0.1, dt) * s_
        elif mode == "bcast_f32":  # per-tap (th,tw)->(th,tw,C) f32 broadcast
            wyd = wy[0]
            for dx in range(NX):
                wgt = (wyd * wx[dx])[:, :, None].astype(dt)
                acc_ref[...] += wgt * rows[:, dx : dx + TW, :]
        elif mode == "bcast_once":  # ONE broadcast per dy, scalar per dx
            wyd = (wy[0] * wx[0])[:, :, None].astype(dt)
            for dx in range(NX):
                acc_ref[...] += (wyd * jnp.asarray(0.01 * dx, dt)) * rows[:, dx : dx + TW, :]
        return carry

    jax.lax.fori_loop(0, NY, body, 0)
    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mode",))
def run(img_p, ru, rv, sy, sx, mode):
    b = ru.shape[0]
    nth, ntw = ru.shape[1] // TH, ru.shape[2] // TW
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nth, ntw),
        in_specs=[
            pl.BlockSpec((1, TH, TW), lambda ib, i, j, *_: (ib, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, TW), lambda ib, i, j, *_: (ib, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, TH, TW, CP), lambda ib, i, j, *_: (ib, i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((SH, SW, CP), img_p.dtype),
            pltpu.VMEM((TH, TW, CP), img_p.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(kernel, mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, ru.shape[1], ru.shape[2], CP), img_p.dtype),
    )(sy, sx, ru, rv, img_p)


def main():
    b, h, w = 4, 1024, 1024
    key = jax.random.PRNGKey(0)
    img_p = jax.random.normal(key, (b, h + 128, w + 256, CP), jnp.bfloat16)
    ru = jax.random.uniform(key, (b, h, w), jnp.float32, 0, 8)
    rv = jax.random.uniform(key, (b, h, w), jnp.float32, -4, 4)
    nth, ntw = h // TH, w // TW
    sy = jnp.tile(jnp.arange(nth, dtype=jnp.int32)[None, :, None] * TH, (b, 1, ntw))
    sx = jnp.tile(jnp.arange(ntw, dtype=jnp.int32)[None, None, :] * TW, (b, nth, 1))
    for mode in ("noshift", "nofma", "scalar"):
        t = chained_time(lambda i_, u, v: run(i_, u, v, sy, sx, mode), (img_p, ru, rv))
        print(f"{mode}: {t*1000:.2f} ms (b{b} {h}x{w}x{CP})", flush=True)


main()
