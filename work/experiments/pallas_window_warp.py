"""Guarded Pallas window backwarp: VMEM-resident tent-window sampling.

The packed-gather backwarp (ops/warp.py) is row-descriptor-bound on TPU
(~18 ms per 1024^2 warp regardless of channel width). This kernel instead
exploits that PIV flow fields are smooth: each output tile's samples live in
a small window around the tile's mean displacement, so the kernel

1. DMAs ONE (tile + window + margin) slab of the padded image into VMEM at a
   per-tile dynamic offset (the rounded tile-mean flow, scalar-prefetched),
2. evaluates bilinear sampling as a static (2r+2)^2 tent-weighted FMA loop
   over in-VMEM shifts — the tent weights ``relu(1-|res - d|)`` are nonzero
   exactly at the true 4 bilinear taps, so the result is EXACT while every
   pixel's ``|flow - tile_base|`` stays within ``residual``.

Exactness is *guaranteed*, not assumed: ``backwarp_auto`` computes the
residual bound on device and ``lax.cond``-falls back to the exact packed
gather when any tile exceeds it (turbulent outliers, huge displacements).

Semantics match ``ops.warp.backwarp`` = grid_sample(bilinear, zeros,
align_corners=True) driven by pixel-space flow (reference
``src/models.py:20-35``). Forward path only; training keeps the gather
(differentiable) implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from piv_liteflownet_tpu.ops.warp import backwarp


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _warp_kernel(sy_ref, sx_ref, ru_ref, rv_ref, img_ref, out_ref, slab_ref,
                 acc_ref, sem,
                 *, th: int, tw: int, r: int, sh: int, sw: int, cpad: int):
    # x slab starts are 8-aligned (Mosaic: HBM slices in the sublane-tiled dim
    # must be 8-divisible); the 0..7 phase is pre-added to ru on the host, so
    # the x tap range is [-r, r+8] (2r+9 taps) instead of [-r, r+1].
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ib = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    sx = pl.multiple_of(sx_ref[ib, ti, tj], 8)  # host guarantees 8-alignment
    dma = pltpu.make_async_copy(
        img_ref.at[ib, pl.ds(sy_ref[ib, ti, tj], sh), pl.ds(sx, sw), :],
        slab_ref,
        sem,
    )
    dma.start()

    dt = acc_ref.dtype
    # Residuals broadcast over the channel (lane) dim ONCE — every weight op
    # after this runs in the SAME (th, tw, cpad) layout as the FMA, so no
    # per-tap (th, tw)->(th, tw, cpad) relayout/transpose is ever needed
    # (per-tap relayouts made the first version 2x slower than the gather).
    # The [:, :, None] insert happens in f32 (Mosaic supports the minor-dim
    # insertion only for 32-bit types), then casts to the compute dtype so
    # bf16 stays in packed (16,128)(2,1) vregs.
    res_uc = jnp.broadcast_to(ru_ref[0][:, :, None], (th, tw, cpad)).astype(dt)
    res_vc = jnp.broadcast_to(rv_ref[0][:, :, None], (th, tw, cpad)).astype(dt)
    one = jnp.asarray(1.0, dt)
    zero = jnp.zeros((), dt)

    dma.wait()

    # fori_loop over dy so the tap loop is not fully unrolled — a flat
    # unrolled `acc = acc + ...` chain made the register allocator keep every
    # tap's product alive (measured 174 MB of spill slots). 166+ of the 170+
    # tap products are exactly 0 per pixel (tent support), so accumulating in
    # the image dtype matches the 4-tap gather einsum's precision.
    acc_ref[...] = jnp.zeros((th, tw, cpad), dt)

    def body(dy, carry):
        rows = slab_ref[pl.ds(dy, th), :, :]  # dim 0 is untiled: any offset ok
        wyd = jnp.maximum(zero, one - jnp.abs(res_vc - (dy - r).astype(dt)))
        for dx in range(2 * r + 9):
            wx = jnp.maximum(zero, one - jnp.abs(res_uc - jnp.asarray(dx - r, dt)))
            acc_ref[...] += (wyd * wx) * rows[:, dx : dx + tw, :]
        return carry

    jax.lax.fori_loop(0, 2 * r + 2, body, 0)
    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("residual", "lim", "tile_h", "tile_w", "interpret")
)
def backwarp_pallas_window(
    img: jax.Array,
    flow: jax.Array,
    residual: int = 4,
    lim: int = 24,
    tile_h: int = 16,
    tile_w: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Window-warp fast path (UNGUARDED — callers wanting guaranteed
    exactness use ``backwarp_auto``). img [B,H,W,C], flow [B,H,W,2]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = img.shape
    r = residual
    if jnp.dtype(img.dtype).itemsize >= 4:
        tile_h = min(tile_h, 8)  # f32 slab+acc at th=16 overflow scoped VMEM
    th = min(tile_h, _round_up(h, 8))
    tw = min(tile_w, _round_up(w, 128))
    hp = _round_up(h, th)
    wp = _round_up(w, tw)
    nth, ntw = hp // th, wp // tw
    cpad = _round_up(c, 128)

    sh = _round_up(th + 2 * r + 1, 8)
    sw = _round_up(tw + 2 * r + 8, 8)
    # margin so any clipped base + window + x-alignment + DMA slack stays in
    # bounds: min x start = -lim + (m - r) - 7 >= 0
    m = lim + r + 9
    img_p = jnp.pad(
        img,
        ((0, 0), (m, m + (hp - h) + sh + lim), (m, m + (wp - w) + sw + lim),
         (0, cpad - c)),
    )

    flow = flow.astype(jnp.float32)
    if hp != h or wp != w:
        # edge-pad so partial edge tiles keep representative means/residuals
        flow = jnp.pad(flow, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)), mode="edge")
    mean = lax.reduce_window(
        flow, 0.0, lax.add, (1, th, tw, 1), (1, th, tw, 1), "VALID"
    ) / float(th * tw)
    base = jnp.clip(jnp.round(mean), -float(lim), float(lim)).astype(jnp.int32)

    # residual planes (f32) = flow - per-tile base, fed as [B,H,W] u/v planes
    base_full = jnp.repeat(jnp.repeat(base, th, axis=1), tw, axis=2)
    res = flow - base_full.astype(jnp.float32)
    ru, rv = res[..., 0], res[..., 1]

    # slab start (top-left of window) in padded-image coordinates
    iy = lax.broadcasted_iota(jnp.int32, (nth, ntw), 0) * th
    ix = lax.broadcasted_iota(jnp.int32, (nth, ntw), 1) * tw
    sy = iy[None] + base[..., 1] + (m - r)
    sx_raw = ix[None] + base[..., 0] + (m - r)
    sx = (sx_raw // 8) * 8  # 8-aligned for the Mosaic HBM slice
    phase = (sx_raw - sx).astype(jnp.float32)  # [b, nth, ntw] in 0..7
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
            pltpu.VMEM((th, tw, cpad), img.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_warp_kernel, th=th, tw=tw, r=r, sh=sh, sw=sw, cpad=cpad),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, cpad), img.dtype),
        interpret=interpret,
    )(sy, sx, ru, rv, img_p)
    return out[:, :h, :w, :c]


def _effective_tile_h(img_dtype, tile_h: int) -> int:
    """The tile height :func:`backwarp_pallas_window` actually uses — it
    silently reduces ``tile_h`` to 8 for >=4-byte dtypes (f32 slab + acc at
    th=16 overflow scoped VMEM). The exactness guard must check residuals on
    the SAME tiling: per-tile round(mean) residuals are not monotone under
    tile splitting, so an f32 flow could pass residual_ok(th=16) yet exceed
    the 8-row kernel's tent window."""
    if jnp.dtype(img_dtype).itemsize >= 4:
        return min(tile_h, 8)
    return tile_h


def residual_ok(flow: jax.Array, residual: int = 4, lim: int = 24,
                tile_h: int = 16, tile_w: int = 128,
                img_dtype=None) -> jax.Array:
    """Scalar bool: every pixel's |flow - round(tile mean)| <= residual
    (the window kernel's exactness condition). Pass ``img_dtype`` (the image
    dtype fed to the kernel) so the check runs on the kernel's effective
    tiling (see :func:`_effective_tile_h`)."""
    if img_dtype is not None:
        tile_h = _effective_tile_h(img_dtype, tile_h)
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
    return jnp.max(jnp.abs(res)) <= float(residual)


def backwarp_auto(img: jax.Array, flow: jax.Array, residual: int = 4,
                  lim: int = 24, tile_h: int = 16, tile_w: int = 128) -> jax.Array:
    """Exact backwarp: window fast path when the residual bound holds,
    packed-gather fallback otherwise (lax.cond — one branch executes)."""
    tile_h = _effective_tile_h(img.dtype, tile_h)
    ok = residual_ok(flow, residual, lim, tile_h, tile_w)
    return lax.cond(
        ok,
        lambda a, f: backwarp_pallas_window(a, f, residual, lim, tile_h, tile_w),
        lambda a, f: backwarp(a, f),
        img, flow,
    )
