"""Mosaic-lowering fix variants for the planar tent feature-warp kernel.

The r4 on-device battery found `pltpu.roll(slab, -phase, axis=1)` on the 3D
(c, sh, 384) slab has NO Mosaic lowering (tpu.dynamic_rotate dimension=1 on a
3D vector -> compile crash); interpret mode hid it. Variants, all exact:

  A  unaligned-dma : DMA straight from sy_raw (no 8-alignment, no phase, no
                     axis=1 rotate). Keeps the 3D lane rotate for bu.
  B  roll2d        : keep aligned DMA + phase, but do BOTH rolls per-channel
                     on 2D (sh, 384) slices inside the channel loop.
  C  weight-fold   : keep aligned DMA; fold phase into the tent weights
                     (rv' = rv + phase scalar) with 7 extra tap rows; lane
                     rotate for bu kept on the 3D slab.
  E  dma-offset    : NO rotates at all — both integer base shifts become
                     dynamic (row, lane) starts of the HBM->VMEM DMA. The
                     full error text says Mosaic lacks dynamic rotate for
                     non-32-bit data entirely, so A/B/C's bf16 lane rotate
                     is at risk too; E is the rotate-free design.

Usage:  python -u work/fwarp_fix.py [batch] [h] [w] [c]   (compile+time+check)
"""

import functools
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/work")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from piv_liteflownet_tpu.ops.pallas_feat_warp import _round_up
from piv_liteflownet_tpu.ops.warp import backwarp


def _kernel(sy_ref, phase_ref, bu_ref, ru_ref, rv_ref, img_ref,
            out_ref, slab_ref, rot_ref, sem, *,
            c, th, sh, ry, rx, ny, nx, mode):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ib = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    sy = sy_ref[ib, ti, tj]
    if mode not in ("A", "E"):
        sy = pl.multiple_of(sy, 8)
    cs = 128 * tj
    if mode == "E":
        # left lane margin is 256 in E (vs 128): +128 keeps cs >= 7 even at
        # tj=0 with the most negative bu (slice starts must not clamp)
        cs = cs + bu_ref[ib, ti, tj] + 128
    dma = pltpu.make_async_copy(
        img_ref.at[ib, :, pl.ds(sy, sh), pl.ds(cs, 384)],
        slab_ref,
        sem,
    )
    dma.start()

    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    ru = ru_ref[0]
    rv = rv_ref[0]
    if mode == "C":
        rv = rv + phase_ref[ib, ti, tj].astype(jnp.float32)
        nyt = ny + 7
    else:
        nyt = ny
    wys = [jnp.maximum(zero, one - jnp.abs(rv - jnp.float32(dy - ry)))
           for dy in range(nyt)]
    wxs = [jnp.maximum(zero, one - jnp.abs(ru - jnp.float32(dx - rx)))
           for dx in range(nx)]
    wprod = [wy * wx for wy in wys for wx in wxs]

    dma.wait()

    if mode == "A":
        # no row phase; lane rotate for bu on the 3D slab
        rot_ref[...] = pltpu.roll(slab_ref[...], -bu_ref[ib, ti, tj], axis=2)

        def cbody(ci, carry):
            acc = jnp.zeros((th, 128), jnp.float32)
            t = 0
            for dy in range(nyt):
                for dx in range(nx):
                    tap = rot_ref[ci, dy : dy + th, 128 - rx + dx : 256 - rx + dx]
                    acc = acc + wprod[t] * tap.astype(jnp.float32)
                    t += 1
            out_ref[0, ci] = acc.astype(out_ref.dtype)
            return carry

        lax.fori_loop(0, c, cbody, 0)
    elif mode == "B":
        phase = phase_ref[ib, ti, tj]
        bu = bu_ref[ib, ti, tj]

        def cbody(ci, carry):
            plane = pltpu.roll(slab_ref[ci], -phase, axis=0)
            plane = pltpu.roll(plane, -bu, axis=1)
            acc = jnp.zeros((th, 128), jnp.float32)
            t = 0
            for dy in range(nyt):
                for dx in range(nx):
                    tap = plane[dy : dy + th, 128 - rx + dx : 256 - rx + dx]
                    acc = acc + wprod[t] * tap.astype(jnp.float32)
                    t += 1
            out_ref[0, ci] = acc.astype(out_ref.dtype)
            return carry

        lax.fori_loop(0, c, cbody, 0)
    elif mode == "E":
        # slab already row- AND lane-shifted by the DMA: taps are static
        def cbody(ci, carry):
            acc = jnp.zeros((th, 128), jnp.float32)
            t = 0
            for dy in range(nyt):
                for dx in range(nx):
                    tap = slab_ref[ci, dy : dy + th, 128 - rx + dx : 256 - rx + dx]
                    acc = acc + wprod[t] * tap.astype(jnp.float32)
                    t += 1
            out_ref[0, ci] = acc.astype(out_ref.dtype)
            return carry

        lax.fori_loop(0, c, cbody, 0)
    else:  # C
        rot_ref[...] = pltpu.roll(slab_ref[...], -bu_ref[ib, ti, tj], axis=2)

        def cbody(ci, carry):
            acc = jnp.zeros((th, 128), jnp.float32)
            t = 0
            for dy in range(nyt):
                for dx in range(nx):
                    tap = rot_ref[ci, dy : dy + th, 128 - rx + dx : 256 - rx + dx]
                    acc = acc + wprod[t] * tap.astype(jnp.float32)
                    t += 1
            out_ref[0, ci] = acc.astype(out_ref.dtype)
            return carry

        lax.fori_loop(0, c, cbody, 0)


@functools.partial(
    jax.jit, static_argnames=("ry", "rx", "vlim", "tile_h", "mode", "interpret"))
def feat_warp_variant(img, flow, ry=3, rx=3, vlim=64, tile_h=16,
                      mode="A", interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = img.shape
    th = min(tile_h, h)
    nty = -(-h // th)
    hp = nty * th
    cw = _round_up(w, 128)
    ns = cw // 128
    ny = 2 * ry + 2
    nx = 2 * rx + 2
    nyt = ny + 7 if mode == "C" else ny
    # rows the taps touch: th+ny (A/E, phase-free) / th+ny+7 (B/C, phase<=7)
    sh = _round_up(th + ny + (0 if mode in ("A", "E") else 7), 8)
    my = vlim + ry + 8
    dtype = img.dtype

    planes = jnp.moveaxis(img, -1, 1)
    lpad = 256 if mode == "E" else 128
    planes = jnp.pad(
        planes,
        ((0, 0), (0, 0), (my, my + (hp - h) + sh), (lpad, 256 + cw - w)),
    )

    f = flow.astype(jnp.float32)
    if hp != h or cw != w:
        f = jnp.pad(f, ((0, 0), (0, hp - h), (0, cw - w), (0, 0)), mode="edge")
    u, v = f[..., 0], f[..., 1]

    def tile_base(comp, lim):
        m = lax.reduce_window(
            comp, 0.0, lax.add, (1, th, 128), (1, th, 128), "VALID"
        ) / float(th * 128)
        return jnp.clip(jnp.round(m), -float(lim), float(lim)).astype(jnp.int32)

    bv = tile_base(v, vlim)
    bu = tile_base(u, 126 - rx - 1)
    rv = v - jnp.repeat(jnp.repeat(bv.astype(jnp.float32), th, 1), 128, 2)
    ru = u - jnp.repeat(jnp.repeat(bu.astype(jnp.float32), th, 1), 128, 2)

    iy = lax.broadcasted_iota(jnp.int32, (1, nty, 1), 1) * th
    sy_raw = iy + bv + (my - ry)
    if mode in ("A", "E"):
        sy = sy_raw
        phase = jnp.zeros_like(sy_raw)
    else:
        sy = (sy_raw // 8) * 8
        phase = sy_raw - sy

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, nty, ns),
        in_specs=[
            pl.BlockSpec((1, th, 128), lambda ib, i, j, *_: (ib, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, 128), lambda ib, i, j, *_: (ib, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, c, th, 128), lambda ib, i, j, *_: (ib, 0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c, sh, 384), dtype),
            pltpu.VMEM((c, sh, 384), dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, c=c, th=th, sh=sh,
                          ry=ry, rx=rx, ny=ny, nx=nx, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c, hp, cw), dtype),
        interpret=interpret,
    )(sy, phase, bu, ru, rv, planes)
    return jnp.moveaxis(out[:, :, :h, :w], 1, -1)


if __name__ == "__main__":
    from bench_lib import chained_time

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    C = int(sys.argv[4]) if len(sys.argv) > 4 else 64

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    # smooth small flow (within tier-1 bounds) for the exactness check
    base = rng.standard_normal((B, 8, 8, 2)).astype(np.float32) * 2.0
    flow = jax.image.resize(jnp.asarray(base), (B, H, W, 2), "cubic")

    ref = np.asarray(backwarp(img, flow).astype(jnp.float32))

    for mode in ("E", "A", "B", "C"):
        for ry, rx in ((4, 4), (11, 11)):
            name = f"{mode} r=({ry},{rx})"
            try:
                fn = lambda a, f: feat_warp_variant(a, f, ry, rx, mode=mode)
                outv = np.asarray(fn(img, flow).astype(jnp.float32))
                err = float(np.abs(outv - ref).max())
                t = chained_time(fn, (img, flow))
                print(f"{name:16s}: {t * 1e3:8.2f} ms  maxerr={err:.2e}",
                      flush=True)
            except Exception as e:
                msg = str(e).split("\n")[0][:140]
                print(f"{name:16s}: FAILED {type(e).__name__}: {msg}", flush=True)
