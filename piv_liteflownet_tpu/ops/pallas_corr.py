"""Pallas TPU kernel for the cost volume: VMEM-resident 49-tap correlation.

The XLA shift-stack formulation (ops/correlation.py) re-reads the padded
second feature map from HBM for every displacement tap. This kernel DMAs one
row-slab of the (pre-padded, phase-subsampled) second map into VMEM per output
tile and emits all 49 taps from on-chip data: HBM traffic drops from ~49x to
~1x of the feature maps.

Alignment rules honored (Mosaic on v5e):
- channels padded to the 128-lane tile;
- the slab's W extent covers the full padded width (no x slicing at HBM);
- the slab's H start is ti*tile_h (provably 8-aligned is NOT required for the
  H dim of a >2D memref — only the last two dims are tiled).

Semantics identical to ``correlation_xla`` on the phase-subsampled inputs.
Forward-only (inference path); training keeps the XLA formulation's VJP.
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
                 th: int, ws: int, cpad: int, inv_c: float):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ib = pl.program_id(0)
    ti = pl.program_id(1)

    sh = th + 2 * MD
    dma = pltpu.make_async_copy(
        f2p_ref.at[ib, pl.ds(ti * th, sh), :, :],
        slab_ref,
        sem,
    )
    dma.start()
    f1 = f1_ref[0, :, :ws, :]  # [th, ws, cpad]
    dma.wait()
    slab = slab_ref[...]

    outs = []
    for dy in range(2 * MD + 1):
        for dx in range(2 * MD + 1):
            prod = f1 * slab[dy : dy + th, dx : dx + ws, :]
            outs.append(jnp.sum(prod.astype(jnp.float32), axis=-1) * inv_c)
    out_ref[0] = jnp.stack(outs, axis=-1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def correlation_pallas(f1s: jax.Array, f2s: jax.Array, tile_h: int = 16,
                       interpret: bool = False) -> jax.Array:
    """49-tap cost volume on ALREADY phase-subsampled maps (stride handled by
    the caller, as in ``correlation_xla``). [B,H,W,C] x2 -> [B,H,W,49]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = f1s.shape
    cpad = _round_up(c, 128)
    th = min(tile_h, h)
    hp = _round_up(h, th)
    wp = _round_up(w + 2 * MD, 8)

    # f1: pad W to the slab width so taps line up column-for-column; zero pad
    # keeps the extra outputs harmless (sliced off below).
    f1p = jnp.pad(f1s, ((0, 0), (0, hp - h), (0, wp - w), (0, cpad - c)))
    # f2: MD halo on H (plus tile remainder), MD left pad on W, zero channels.
    f2p = jnp.pad(
        f2s,
        ((0, 0), (MD, MD + hp - h), (MD, wp - w - MD), (0, cpad - c)),
    )

    ws = wp - 2 * MD if (wp - 2 * MD) % 8 == 0 else wp - 8
    ws = max(ws, w)

    out = pl.pallas_call(
        functools.partial(_corr_kernel, th=th, ws=ws, cpad=cpad, inv_c=1.0 / c),
        grid=(b, hp // th),
        in_specs=[
            pl.BlockSpec((1, th, wp, cpad), lambda ib, i: (ib, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, th, ws, NDISP), lambda ib, i: (ib, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, ws, NDISP), f1s.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * MD, wp, cpad), f2s.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(f1p, f2p)
    return out[:, :h, :w]
