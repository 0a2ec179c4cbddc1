"""Pallas TPU kernel for the cost volume: VMEM-resident 49-tap correlation.

The XLA shift-stack formulation (ops/correlation.py) re-reads the padded
second feature map from HBM for every displacement tap. This kernel DMAs one
(tile + halo) slab of the (pre-padded, phase-subsampled) second map into VMEM
per output tile and emits all 49 taps from on-chip data: HBM traffic drops
from ~49x to ~1x of the feature maps.

Reference semantics: ``src/correlation.py:36-104`` (CUDA shared-memory
correlation kernel). Identical to ``correlation_xla`` on the phase-subsampled
inputs; forward-only (inference path) — training keeps the XLA formulation's
VJP.

Mosaic/VMEM notes (v5e, 16 MB/core):
- channels padded to the 128-lane tile;
- both spatial dims are tiled (grid over H and W) so the per-tile working set
  is bounded regardless of image size;
- each tap's product is consumed by an immediate store into its output lane
  slice, so the stack allocator reuses ONE product buffer instead of keeping
  49 alive (the naive stack-all-taps version OOMs scoped VMEM at 48 MB).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MD = 3
NDISP = 49


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _corr_kernel(f1_ref, f2p_ref, out_ref, slab_ref, sem, *,
                 th: int, tw: int, inv_c: float):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ib = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    sh = th + 2 * MD
    sw = tw + 8  # >= tw + 2*MD, multiple of 8
    dma = pltpu.make_async_copy(
        f2p_ref.at[ib, pl.ds(ti * th, sh), pl.ds(tj * tw, sw), :],
        slab_ref,
        sem,
    )
    dma.start()
    f1 = f1_ref[0]  # [th, tw, cpad]
    dma.wait()

    for dy in range(2 * MD + 1):
        for dx in range(2 * MD + 1):
            prod = f1 * slab_ref[dy : dy + th, dx : dx + tw, :]
            s = jnp.sum(prod.astype(jnp.float32), axis=-1) * inv_c
            out_ref[0, :, :, dy * (2 * MD + 1) + dx] = s.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_h", "tile_w", "interpret"))
def correlation_pallas(f1s: jax.Array, f2s: jax.Array, tile_h: int = 32,
                       tile_w: int = 128, interpret: bool = False) -> jax.Array:
    """49-tap cost volume on ALREADY phase-subsampled maps (stride handled by
    the caller, as in ``correlation_xla``). [B,H,W,C] x2 -> [B,H,W,49]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = f1s.shape
    cpad = _round_up(c, 128)
    th = min(tile_h, _round_up(h, 8))
    tw = min(tile_w, _round_up(w, 8))
    hp = _round_up(h, th)
    wp = _round_up(w, tw)

    f1p = jnp.pad(f1s, ((0, 0), (0, hp - h), (0, wp - w), (0, cpad - c)))
    # f2: MD halo on H/W plus the tile remainder plus the slab's W slack
    # (sw = tw + 8 while the halo only needs tw + 6).
    f2p = jnp.pad(
        f2s,
        ((0, 0), (MD, MD + hp - h), (MD, (wp - w) + 8 - MD), (0, cpad - c)),
    )

    out = pl.pallas_call(
        functools.partial(_corr_kernel, th=th, tw=tw, inv_c=1.0 / c),
        grid=(b, hp // th, wp // tw),
        in_specs=[
            pl.BlockSpec((1, th, tw, cpad), lambda ib, i, j: (ib, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, th, tw, NDISP), lambda ib, i, j: (ib, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, NDISP), f1s.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * MD, tw + 8, cpad), f2s.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(f1p, f2p)
    return out[:, :h, :w]


# ---------------------------------------------------------------------------
# Planar (W-on-lanes) correlation: accumulate over channels, no lane reduce
# ---------------------------------------------------------------------------
#
# The NHWC kernel above puts C on the 128-lane axis, so every tap pays a
# cross-lane reduction (log2(128) shuffle steps) and half the lanes are
# zero padding at C=64 — measured only ~parity with the XLA shift-stack.
# This variant transposes to planar [B, C, H, W] OUTSIDE the kernel (one XLA
# transpose, ~0.3 ms at 1024^2-derived sizes) and puts W on the lanes:
# per displacement tap the reduction over C becomes a pure FMA accumulation
# of [th, W] vector rows, which is exactly what the 8x128 VPU does at rate.
# The XLA shift-stack instead re-reads both maps from HBM for all 49 taps
# (measured 17.7 ms/pair of the v1 @1024^2 budget).


def _corr_planar_kernel(f1_ref, f2p_ref, out_ref, slab_ref, sem, *,
                        th: int, wp: int, sh: int, c: int, inv_c: float):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ib = pl.program_id(0)
    ti = pl.program_id(1)

    # Two Mosaic DMA rules bisected on device (r4 battery): the dynamic row
    # START must be provably 8-aligned (multiple_of hint; an unprovable start
    # crashes the compile helper outright) and the slice SHAPE on the sublane
    # dim must be a multiple of 8 ("Slice shape along dimension 2 must be
    # aligned to tiling (8), but is 22") — hence sh = round_up(th+2*MD, 8).
    dma = pltpu.make_async_copy(
        f2p_ref.at[ib, :, pl.ds(pl.multiple_of(ti * th, 8), sh), :],
        slab_ref,
        sem,
    )
    dma.start()
    dma.wait()

    f32 = jnp.float32
    for dy in range(2 * MD + 1):
        for dx in range(2 * MD + 1):
            def body(ci, acc):
                a = f1_ref[0, ci].astype(f32)                      # [th, wp]
                bv = slab_ref[ci, dy : dy + th, dx : dx + wp].astype(f32)
                return acc + a * bv

            # Mosaic's fori_loop lowering supports only unroll=1 or full
            # unroll (=num_steps); 8 fails on device (r4 battery). Full
            # unroll of c=64 x 49 taps explodes compile time, so unroll=1.
            acc = jax.lax.fori_loop(
                0, c, body, jnp.zeros((th, wp), f32), unroll=1)
            out_ref[0, dy * (2 * MD + 1) + dx] = (
                acc * inv_c).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def correlation_planar_pallas(f1s: jax.Array, f2s: jax.Array,
                              tile_h: int = 16,
                              interpret: bool = False) -> jax.Array:
    """Planar 49-tap cost volume on ALREADY phase-subsampled maps.

    [B,H,W,C] x2 (NHWC in) -> [B,H,W,49]; layout transposes happen in XLA
    around the kernel. Forward-only (inference path).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = f1s.shape
    th = tile_h
    hp = _round_up(h, th)
    wp = _round_up(w, 128)
    # Lane slack for the dx in [0, 6] shifted slices. A full 128 lanes (not
    # 8) because the DMA copies the slab's whole lane extent and Mosaic
    # requires DMA slice shapes 128-aligned on the lane dim ("Slice shape
    # along dimension 3 must be aligned to tiling (128), but is 136" — r4
    # battery).
    swp = wp + 128
    sh = _round_up(th + 2 * MD, 8)  # slab rows: DMA slice shape must be 8-aligned

    f1t = f1s.transpose(0, 3, 1, 2)  # [B, C, H, W]
    f2t = f2s.transpose(0, 3, 1, 2)
    f1p = jnp.pad(f1t, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
    # f2: MD-row halo on top; bottom pad covers the last tile's sh-row slab
    # (max DMA end = hp - th + sh); MD-lane left shift, slack right
    f2p = jnp.pad(
        f2t, ((0, 0), (0, 0), (MD, (hp - h) + (sh - th - MD)), (MD, swp - w - MD)))

    out = pl.pallas_call(
        functools.partial(_corr_planar_kernel, th=th, wp=wp, sh=sh, c=c,
                          inv_c=1.0 / c),
        grid=(b, hp // th),
        in_specs=[
            pl.BlockSpec((1, c, th, wp), lambda ib, i: (ib, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, NDISP, th, wp), lambda ib, i: (ib, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, NDISP, hp, wp), f1s.dtype),
        scratch_shapes=[
            pltpu.VMEM((c, sh, swp), f2s.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(f1p, f2p)
    return out[:, :, :h, :w].transpose(0, 2, 3, 1)
