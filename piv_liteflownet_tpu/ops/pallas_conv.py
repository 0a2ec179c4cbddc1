"""Fused conv-chain Pallas kernel: a whole NetE conv stack in one launch.

XLA's conv tiling needs batch >= 8 to reach full MXU rate on large frames
(measured r2: 3x3 128ch = 6.2-6.7 ms/4Mpx at b>=8 but 18.6-20.9 at b1-2,
BASELINE.md); the v1 flagship's best end-to-end batch is 2, so its conv
stacks run ~3x under the floor and lose ~25 ms/pair to scheduling. External
space-to-batch banding recovers the isolated stacks but loses in-model to
slice/concat traffic (r2 negative result).

This kernel removes the batch dependency: one ``pallas_call`` computes an
ENTIRE conv chain (e.g. the S stack 130->128->64->32->2, reference
``src/models.py:190-217``) tile by tile with VMEM-resident intermediates —
no inter-conv HBM round trips, and MXU work tiled by (rows x cols), not
batch.

Design:
- Tiles of (th x tw) output pixels with an m=8 halo margin each side, DMA'd
  from the globally zero-padded input (so tile borders read REAL neighbors,
  and true image edges read zeros = SAME-conv semantics). The margin keeps
  every DMA x-offset 8-aligned (the sublane-dim constraint).
- Each conv consumes its halo: regions shrink by 2*(k//2) per layer
  (shrinking-region formulation — exact, no garbage tracking). Total chain
  halo must be <= m (v1 M/S: 6, v2 M/S: 8, R 3x3-stack: 6).
- Layout (rows, cols, ch): rows untiled (free y-tap offsets), cols in
  sublanes (x-taps are static sublane shifts), channels in lanes (the
  matmul contraction dim). Each tap is one MXU ``dot_general`` with f32
  accumulation.
- The first conv consumes the concat parts separately
  (``conv(concat(xs), W) = sum_i conv(x_i, W_i)``, the model's ``_cl_split``
  trick) so 130/131-channel inputs never materialize.
- Weights live whole in VMEM (largest stack < 1 MB).

Forward-only (training keeps XLA convs — differentiable for free).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

M = 8  # halo margin per side; total chain halo must be <= M
LEAKY = 0.1


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def conv_chain_pallas(
    parts: Sequence[jax.Array],
    weights: Sequence[jax.Array],
    biases: Sequence[jax.Array],
    last_linear: bool = True,
    tile_h: int = 32,
    tile_w: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Conv chain over ``concat(parts, axis=-1)`` — SAME padding, stride 1,
    LeakyReLU(0.1) after every conv (except the last when ``last_linear``).

    parts: list of [B, H, W, C_i] NHWC arrays (the virtual concat input).
    weights[i]: [kh, kw, Cin_i, Cout_i] HWIO; weights[0] consumes sum(C_i).
    Returns [B, H, W, Cout_last].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, _ = parts[0].shape
    n_parts = len(parts)
    n_convs = len(weights)
    halos = [(wt.shape[0] // 2, wt.shape[1] // 2) for wt in weights]
    total_hy = sum(hy for hy, _ in halos)
    total_hx = sum(hx for _, hx in halos)
    assert max(total_hy, total_hx) <= M, f"chain halo {halos} > margin {M}"
    dtype = parts[0].dtype

    th = min(tile_h, _round_up(h, 8))
    tw = min(tile_w, _round_up(w, 8))
    hp = _round_up(h, th)
    wp = _round_up(w, tw)
    nth, ntw = hp // th, wp // tw
    sh = th + 2 * M
    sw = tw + 2 * M
    cout_last = weights[-1].shape[-1]

    # split weights[0] by part channels
    part_cs = [p.shape[-1] for p in parts]
    assert sum(part_cs) == weights[0].shape[2], "weights[0] Cin mismatch"
    w0_parts = []
    off = 0
    for c in part_cs:
        w0_parts.append(weights[0][:, :, off:off + c, :])
        off += c

    padded = [
        jnp.pad(p, ((0, 0), (M, M + hp - h), (M, M + wp - w), (0, 0)))
        for p in parts
    ]
    wt_inputs = [w.astype(dtype) for w in w0_parts] + \
        [w.astype(dtype) for w in weights[1:]]
    b_inputs = [bb.astype(dtype) for bb in biases]
    n_w, n_b = len(wt_inputs), len(b_inputs)

    def tap_sum(x, wref):
        """sum_{ky,kx} x[ky:ky+r', kx:kx+c', :] @ W[ky,kx] -> (r', c', cout) f32."""
        kh, kw = wref.shape[0], wref.shape[1]
        rp = x.shape[0] - (kh - 1)
        cp = x.shape[1] - (kw - 1)
        wv = wref[:]
        acc = None
        for ky in range(kh):
            for kx in range(kw):
                contrib = jax.lax.dot_general(
                    x[ky:ky + rp, kx:kx + cp, :], wv[ky, kx],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = contrib if acc is None else acc + contrib
        return acc

    def finish(acc, bias, act):
        y = acc + bias[:].astype(jnp.float32)
        if act:
            y = jnp.where(y >= 0, y, y * jnp.float32(LEAKY))
        return y.astype(dtype)

    def kernel(*refs):
        idx = 0
        part_hbm = refs[idx:idx + n_parts]; idx += n_parts
        wrefs = refs[idx:idx + n_w]; idx += n_w
        brefs = refs[idx:idx + n_b]; idx += n_b
        out_ref = refs[idx]; idx += 1
        slabs = refs[idx:idx + n_parts]; idx += n_parts
        sems = refs[idx]

        ib = pl.program_id(0)
        ti = pl.program_id(1)
        tj = pl.program_id(2)

        dmas = []
        for k in range(n_parts):
            d = pltpu.make_async_copy(
                part_hbm[k].at[ib, pl.ds(ti * th, sh), pl.ds(tj * tw, sw), :],
                slabs[k],
                sems.at[k],
            )
            d.start()
            dmas.append(d)
        for d in dmas:
            d.wait()

        def mask_outside(x, off):
            """Zero the rows/cols that lie outside the real image: a SAME
            chain pads EVERY layer's input with zeros at the image border,
            but this tile's margins carry the previous conv's values there
            (they see real pixels within their halo). Interior margins are
            real neighbors and stay untouched."""
            rows, cols = x.shape[0], x.shape[1]
            g0y = ti * th - M + off  # global row of x[0]
            g0x = tj * tw - M + off
            ri = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) + g0y
            ci = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1) + g0x
            ok = (ri >= 0) & (ri < h) & (ci >= 0) & (ci < w)
            return x * ok[:, :, None].astype(x.dtype)

        acc = None
        for k in range(n_parts):
            t = tap_sum(slabs[k][:], wrefs[k])
            acc = t if acc is None else acc + t
        x = finish(acc, brefs[0], act=True)
        off = halos[0][0]

        for i in range(1, n_convs):
            act = (i < n_convs - 1) or not last_linear
            x = mask_outside(x, off)
            x = finish(tap_sum(x, wrefs[n_parts + i - 1]), brefs[i], act)
            off += halos[i][0]

        # x extent: (sh - 2*total_hy, sw - 2*total_hx); the (th, tw) center
        # sits at offset (M - total_hy, M - total_hx)
        oy = M - total_hy
        ox = M - total_hx
        out_ref[0] = x[oy:oy + th, ox:ox + tw, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, nth, ntw),
        in_specs=(
            [pl.BlockSpec(memory_space=pl.ANY) for _ in parts]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)
               for _ in range(n_w + n_b)]
        ),
        out_specs=pl.BlockSpec(
            (1, th, tw, cout_last), lambda ib, i, j: (ib, i, j, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=(
            [pltpu.VMEM((sh, sw, p.shape[-1]), dtype) for p in parts]
            + [pltpu.SemaphoreType.DMA((n_parts,))]
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, cout_last), dtype),
        interpret=interpret,
    )(*padded, *wt_inputs, *b_inputs)
    return out[:, :h, :w, :]


def conv_chain_xla(parts, weights, biases, last_linear=True, precision=None):
    """Reference implementation (the model's _cl_split + conv2d chain)."""
    from piv_liteflownet_tpu.ops.nn import conv2d, leaky_relu

    part_cs = [p.shape[-1] for p in parts]
    w0 = weights[0]
    acc = None
    off = 0
    for p, c in zip(parts, part_cs):
        y = conv2d(p, w0[:, :, off:off + c, :], None, 1,
                   (w0.shape[0] // 2, w0.shape[1] // 2), precision)
        acc = y if acc is None else acc + y
        off += c
    x = leaky_relu(acc + biases[0])
    for i in range(1, len(weights)):
        wt = weights[i]
        x = conv2d(x, wt, biases[i], 1, (wt.shape[0] // 2, wt.shape[1] // 2),
                   precision)
        if i < len(weights) - 1 or not last_linear:
            x = leaky_relu(x)
    return x
