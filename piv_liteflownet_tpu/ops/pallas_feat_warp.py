"""Planar Pallas tent backwarp for FEATURE maps (c >= ~32).

The S warps are the largest single cost of the v1 flagship (26.5 ms/pair of
the 129 ms b4 @1024^2 budget): the packed gather is descriptor-bound at
~18 ns/row no matter how wide the row. Two rounds of windowed/tent kernels
lost to it (work/experiments/*): the r2 NHWC kernel round-tripped its
accumulator through VMEM per tap, and the r3 value-accumulated NHWC kernel
kept channels on the 128-lane axis (half the lanes are padding at c=64) and
paid a 13-tap x tent because the DMA start absorbs the 8-aligned window
phase into the residual.

This kernel keeps the tent-window idea but fixes the arithmetic density:

- Layout: planar ``[B, C, H, W]`` — W on the 128-lane axis (full lanes at
  any c), rows in sublanes, channels an on-chip ``fori_loop``. The two XLA
  transposes around the kernel are dense copies (~1.3 ms total at
  1024^2 x 64 x b4), far below the tent-vs-gather gap.
- Per-(16-row x 128-col) tile integer base shifts ``bv = round(mean v)``,
  ``bu = round(mean u)`` are applied ON CHIP with dynamic 2D rotates of
  each channel's plane — widened to f32 first, because the TPU Mosaic
  backend has no dynamic-rotate lowering for bf16 at all ("Rotate with
  non-32-bit data", r4 on-device battery) and crashes outright on
  unaligned or lane-dynamic DMA starts, so neither a bf16 slab rotate nor
  folding the shifts into the DMA offsets can work. The y DMA-alignment
  phase is rotated away in the same pass, so the tent is only
  ``(2r+2) x (2r+2)`` taps (8x8 at r_y=3, r_x=3) instead of r3's 6x13,
  and the taps read the already-f32 plane (they accumulated in f32 anyway).
- Tent weights ``relu(1 - |res - d|)`` are nonzero exactly at the true 4
  bilinear taps -> EXACT grid_sample(bilinear, zeros, align_corners=True)
  semantics whenever the residual bounds hold; ``feat_warp`` checks them on
  device and ``lax.cond``-falls back to the exact packed gather.

Forward-only (training keeps the differentiable gather; the model swaps
implementations off in train mode like the other inference kernels).

Reference semantics: ``src/models.py:20-35`` (grid_sample backwarp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from piv_liteflownet_tpu.ops.pallas_rgb_warp import _tile_mean


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _feat_warp_kernel(sy_ref, phase_ref, bu_ref, ru_ref, rv_ref, img_ref,
                      out_ref, slab_ref, sem, *,
                      c, th, sh, ry, rx, ny, nx):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ib = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    sy = pl.multiple_of(sy_ref[ib, ti, tj], 8)
    dma = pltpu.make_async_copy(
        img_ref.at[ib, :, pl.ds(sy, sh), pl.ds(128 * tj, 384)],
        slab_ref,
        sem,
    )
    dma.start()

    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    ru = ru_ref[0]  # [th, 128] f32: u - bu
    rv = rv_ref[0]  # [th, 128] f32: v - bv
    # tent weight planes, shared by every channel
    wys = [jnp.maximum(zero, one - jnp.abs(rv - jnp.float32(dy - ry)))
           for dy in range(ny)]
    wxs = [jnp.maximum(zero, one - jnp.abs(ru - jnp.float32(dx - rx)))
           for dx in range(nx)]
    wprod = [wy * wx for wy in wys for wx in wxs]

    phase = phase_ref[ib, ti, tj]
    bu = bu_ref[ib, ti, tj]
    dma.wait()

    def cbody(ci, carry):
        # f32 2D dynamic rotates: undo the DMA row-alignment phase and apply
        # the integer base shifts. Widening first is mandatory (no bf16
        # dynamic-rotate lowering) and free-ish: taps accumulate in f32.
        plane = slab_ref[ci].astype(jnp.float32)
        # BOTH dynamic-rotate shifts normalized to [0, size): the device
        # lowering is exact for non-negative shifts on every probed shape,
        # but NEGATIVE shifts mis-rotate (lane axis: spurious +128 offset;
        # sublane axis: row-count-dependent bias except at 32 rows — r4
        # probes /tmp/roll_bias, /tmp/roll_rows). Rotation is periodic, so
        # the non-negative equivalent is always available and exact.
        plane = pltpu.roll(plane, jnp.remainder(-phase, sh), axis=0)
        plane = pltpu.roll(plane, jnp.remainder(-bu, 384), axis=1)
        acc = jnp.zeros((th, 128), jnp.float32)
        t = 0
        for dy in range(ny):
            for dx in range(nx):
                tap = plane[dy : dy + th, 128 - rx + dx : 256 - rx + dx]
                acc = acc + wprod[t] * tap
                t += 1
        out_ref[0, ci] = acc.astype(out_ref.dtype)
        return carry

    lax.fori_loop(0, c, cbody, 0)


@functools.partial(
    jax.jit, static_argnames=("ry", "rx", "vlim", "tile_h", "interpret"))
def feat_warp_pallas(
    img: jax.Array,
    flow: jax.Array,
    ry: int = 3,
    rx: int = 3,
    vlim: int = 64,
    tile_h: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """UNGUARDED planar tent backwarp (exact iff the residual bounds hold —
    callers wanting guaranteed exactness use :func:`feat_warp`).

    img [B,H,W,C], flow [B,H,W,2] (pixel units, pre-scaled). -> [B,H,W,C].
    """
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
    sh = _round_up(th + ny + 7, 8)  # tap rows + DMA alignment phase
    my = vlim + ry + 8              # y margin: clipped base + tent + phase
    dtype = img.dtype

    planes = jnp.moveaxis(img, -1, 1)  # [B, C, H, W]
    planes = jnp.pad(
        planes,
        ((0, 0), (0, 0), (my, my + (hp - h) + sh), (128, 256 + cw - w)),
    )

    f = flow.astype(jnp.float32)
    if hp != h or cw != w:
        f = jnp.pad(f, ((0, 0), (0, hp - h), (0, cw - w), (0, 0)), mode="edge")
    u, v = f[..., 0], f[..., 1]

    def tile_base(comp, lim):
        m = _tile_mean(comp, nty, th, ns)  # [B, nty, ns]
        return jnp.clip(jnp.round(m), -float(lim), float(lim)).astype(jnp.int32)

    def tile_resid(comp, base):
        return (comp.reshape(b, nty, th, ns, 128)
                - base.astype(jnp.float32)[:, :, None, :, None]
                ).reshape(b, hp, cw)

    bv = tile_base(v, vlim)
    bu = tile_base(u, 126 - rx - 1)
    rv = tile_resid(v, bv)
    ru = tile_resid(u, bu)

    iy = lax.broadcasted_iota(jnp.int32, (1, nty, 1), 1) * th
    sy_raw = iy + bv + (my - ry)
    sy = (sy_raw // 8) * 8
    phase = sy_raw - sy  # 0..7

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # sy, phase, bu
        grid=(b, nty, ns),
        in_specs=[
            pl.BlockSpec((1, th, 128), lambda ib, i, j, *_: (ib, i, j),
                         memory_space=pltpu.VMEM),  # ru
            pl.BlockSpec((1, th, 128), lambda ib, i, j, *_: (ib, i, j),
                         memory_space=pltpu.VMEM),  # rv
            pl.BlockSpec(memory_space=pl.ANY),      # planes (HBM)
        ],
        out_specs=pl.BlockSpec((1, c, th, 128), lambda ib, i, j, *_: (ib, 0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c, sh, 384), dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_feat_warp_kernel, c=c, th=th, sh=sh,
                          ry=ry, rx=rx, ny=ny, nx=nx),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c, hp, cw), dtype),
        interpret=interpret,
    )(sy, phase, bu, ru, rv, planes)
    return jnp.moveaxis(out[:, :, :h, :w], 1, -1)


def feat_warp_bounds_ok(flow: jax.Array, ry: int = 3, rx: int = 3,
                        vlim: int = 64, tile_h: int = 16) -> jax.Array:
    """Scalar bool: per-(th x 128)-tile residuals fit the tent —
    |v - round(mean v)| <= ry (mean clipped to vlim) and
    |u - round(mean u)| <= rx (mean clipped to the lane-rotate bound)."""
    b, h, w, _ = flow.shape
    th = min(tile_h, h)
    nty = -(-h // th)
    cw = _round_up(w, 128)
    f = flow.astype(jnp.float32)
    if nty * th != h or cw != w:
        f = jnp.pad(f, ((0, 0), (0, nty * th - h), (0, cw - w), (0, 0)),
                    mode="edge")
    u, v = f[..., 0], f[..., 1]
    ns = cw // 128

    def resid(comp, lim):
        m = _tile_mean(comp, nty, th, ns)
        base = jnp.clip(jnp.round(m), -float(lim), float(lim))
        return jnp.max(jnp.abs(comp.reshape(b, nty, th, ns, 128)
                               - base[:, :, None, :, None]))

    return (resid(v, vlim) <= float(ry)) & (resid(u, 126 - rx - 1) <= float(rx))


#: (ry, rx) tent tiers, narrow->wide. Residual study (work/guard_resid.log):
#: benign flows reach per-tile residual 3.2 at L1 -> (4, 4) covers them.
#: Device-measured (r4, b4 1024^2 c64 bf16): tier (4,4) 75 ms vs gather
#: 100 ms; a wide (11,11) tier measured 233 ms — 2.3x WORSE than the
#: gather — so steep flows go straight to the exact gather fallback
#: instead of a wider tent.
FEAT_WARP_TIERS = ((4, 4),)


def feat_warp(img: jax.Array, flow: jax.Array, tiers=FEAT_WARP_TIERS,
              vlim: int = 64, tile_h: int = 16,
              interpret: bool = False) -> jax.Array:
    """Exact feature backwarp: the narrowest tent tier whose residual bounds
    hold on the actual flow (checked ON DEVICE), packed-gather fallback when
    none do."""
    from piv_liteflownet_tpu.ops.warp import backwarp

    idx = jnp.int32(len(tiers))  # default: gather fallback
    for i in range(len(tiers) - 1, -1, -1):
        ry, rx = tiers[i]
        idx = jnp.where(feat_warp_bounds_ok(flow, ry, rx, vlim, tile_h),
                        jnp.int32(i), idx)
    branches = [
        (lambda a, f, t=t: feat_warp_pallas(a, f, t[0], t[1], vlim, tile_h,
                                            interpret=interpret))
        for t in tiers
    ]
    branches.append(lambda a, f: backwarp(a, f))
    return lax.switch(idx, branches, img, flow)
