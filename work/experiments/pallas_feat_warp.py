"""Value-accumulated Pallas tent-window backwarp for FEATURE maps (NHWC).

Successor to ``ops/pallas_window_warp.py`` (r2): same windowed-slab design —
per-tile base shift applied as an 8-aligned HBM window DMA, tent weights
``relu(1 - |res - d|)`` that are nonzero exactly at the true 4 bilinear taps —
with the two fixes the r2 retro identified (work/ROUND2_NOTES.md):

1. **Value accumulation**: the r2 kernel did ``acc_ref[...] +=`` per tap,
   round-tripping the whole accumulator through VMEM 170x. Here the x-tap
   loop accumulates into an SSA value per y-tap (registers / Mosaic's
   choice), touching the accumulator ref once per y-tap.
2. **r=2 tier**: 13 x-taps x 6 y-taps = 78 taps instead of 170. PIV flow
   residuals within a 16x128 tile are well under 2 px for real data; the
   on-device guard (``feat_warp_auto``) falls back to the exact packed
   gather otherwise, so exactness is never assumed.

Layout: NHWC — x in sublanes (the 8-aligned DMA dim; the 0..7 alignment
phase is absorbed into the u residual, hence 2r+9 x-taps), channels in lanes
(static, never shifted), y the untiled dim (fori-loop with free dynamic
slicing).

Semantics: ``grid_sample(bilinear, zeros, align_corners=True)`` pixel-space
sampling (reference ``src/models.py:20-35``), forward only (training keeps
the differentiable gather).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from piv_liteflownet_tpu.ops.warp import backwarp


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _warp_kernel(sy_ref, sx_ref, ru_ref, rv_ref, img_ref, out_ref,
                 slab_ref, sem, *, th, tw, r, sh, sw, cpad, ny, nx):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ib = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    sx = pl.multiple_of(sx_ref[ib, ti, tj], 8)
    dma = pltpu.make_async_copy(
        img_ref.at[ib, pl.ds(sy_ref[ib, ti, tj], sh), pl.ds(sx, sw), :],
        slab_ref,
        sem,
    )
    dma.start()

    dt = slab_ref.dtype
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    # Tent weights live on 2D (th, tw) planes — tiny (2 vregs each) vs the
    # r2 kernel's pre-broadcast (th, tw, cpad) residual planes whose weight
    # math ran at full channel width. The per-tap product is broadcast over
    # the channel (lane) dim at multiply time ([:, :, None]; minor-dim insert
    # in f32, the only width Mosaic supports, then cast).
    ru = ru_ref[0]  # (th, tw) f32
    rv = rv_ref[0]
    wxs = [jnp.maximum(zero, one - jnp.abs(ru - jnp.float32(dx - r)))
           for dx in range(nx)]

    dma.wait()

    def body(dy, acc):
        rows = slab_ref[pl.ds(dy, th), :, :]  # untiled dim: any offset ok
        wy = jnp.maximum(zero, one - jnp.abs(rv - (dy - r).astype(jnp.float32)))
        inner = jnp.zeros((th, tw, cpad), dt)
        for dx in range(nx):
            wp = (wy * wxs[dx])[:, :, None].astype(dt)  # (th, tw, 1)
            inner = inner + wp * rows[:, dx:dx + tw, :]
        return acc + inner

    acc = jax.lax.fori_loop(0, ny, body, jnp.zeros((th, tw, cpad), dt))
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("r", "lim", "tile_h", "tile_w", "interpret")
)
def feat_warp_pallas(
    img: jax.Array,
    flow: jax.Array,
    r: int = 2,
    lim: int = 24,
    tile_h: int = 16,
    tile_w: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """UNGUARDED window warp (use :func:`feat_warp_auto` for guaranteed
    exactness). img [B,H,W,C], flow [B,H,W,2]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = img.shape
    th = min(tile_h, _round_up(h, 8))
    tw = min(tile_w, _round_up(w, 128))
    hp = _round_up(h, th)
    wp = _round_up(w, tw)
    nth, ntw = hp // th, wp // tw
    cpad = _round_up(c, 128)

    ny = 2 * r + 2          # y: untiled dim, exact window
    nx = 2 * r + 9          # x: sublane dim, + 0..7 DMA alignment phase
    sh = _round_up(th + ny - 1, 8)
    sw = _round_up(tw + nx - 1, 8)
    m = lim + r + 9  # margin: any clipped base + window + alignment slack
    img_p = jnp.pad(
        img,
        ((0, 0), (m, m + (hp - h) + sh + lim), (m, m + (wp - w) + sw + lim),
         (0, cpad - c)),
    )

    flow = flow.astype(jnp.float32)
    if hp != h or wp != w:
        flow = jnp.pad(flow, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)), mode="edge")
    mean = lax.reduce_window(
        flow, 0.0, lax.add, (1, th, tw, 1), (1, th, tw, 1), "VALID"
    ) / float(th * tw)
    base = jnp.clip(jnp.round(mean), -float(lim), float(lim)).astype(jnp.int32)

    base_full = jnp.repeat(jnp.repeat(base, th, axis=1), tw, axis=2)
    res = flow - base_full.astype(jnp.float32)
    ru, rv = res[..., 0], res[..., 1]

    iy = lax.broadcasted_iota(jnp.int32, (nth, ntw), 0) * th
    ix = lax.broadcasted_iota(jnp.int32, (nth, ntw), 1) * tw
    sy = iy[None] + base[..., 1] + (m - r)
    sx_raw = ix[None] + base[..., 0] + (m - r)
    sx = (sx_raw // 8) * 8
    phase = (sx_raw - sx).astype(jnp.float32)  # 0..7
    ru = ru + jnp.repeat(jnp.repeat(phase, th, axis=1), tw, axis=2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nth, ntw),
        in_specs=[
            pl.BlockSpec((1, th, tw), lambda ib, i, j, *_: (ib, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, tw), lambda ib, i, j, *_: (ib, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, th, tw, cpad), lambda ib, i, j, *_: (ib, i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((sh, sw, cpad), img.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_warp_kernel, th=th, tw=tw, r=r, sh=sh, sw=sw,
                          cpad=cpad, ny=ny, nx=nx),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, cpad), img.dtype),
        interpret=interpret,
    )(sy, sx, ru, rv, img_p)
    return out[:, :h, :w, :c]


def feat_residual_ok(flow: jax.Array, r: int = 2, lim: int = 24,
                     tile_h: int = 16, tile_w: int = 128) -> jax.Array:
    """Scalar bool: every pixel's |flow - round(tile mean)| <= r on the
    kernel's tiling (the exactness condition)."""
    b, h, w, _ = flow.shape
    th = min(tile_h, _round_up(h, 8))
    tw = min(tile_w, _round_up(w, 128))
    hp, wp = _round_up(h, th), _round_up(w, tw)
    f = flow.astype(jnp.float32)
    if hp != h or wp != w:
        f = jnp.pad(f, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)), mode="edge")
    mean = lax.reduce_window(
        f, 0.0, lax.add, (1, th, tw, 1), (1, th, tw, 1), "VALID"
    ) / float(th * tw)
    base = jnp.clip(jnp.round(mean), -float(lim), float(lim))
    res = f - jnp.repeat(jnp.repeat(base, th, axis=1), tw, axis=2)
    return jnp.max(jnp.abs(res)) <= float(r)


def feat_warp_auto(img: jax.Array, flow: jax.Array, r: int = 2,
                   lim: int = 24, tile_h: int = 16,
                   tile_w: int = 128) -> jax.Array:
    """Exact backwarp: tent kernel when the residual bound holds (on-device
    check), packed-gather fallback otherwise."""
    ok = feat_residual_ok(flow, r, lim, tile_h, tile_w)
    return lax.cond(
        ok,
        lambda a, f: feat_warp_pallas(a, f, r, lim, tile_h, tile_w),
        lambda a, f: backwarp(a, f),
        img, flow,
    )
