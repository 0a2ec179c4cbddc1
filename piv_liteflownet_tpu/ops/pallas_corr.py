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
