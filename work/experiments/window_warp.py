"""Gather-free bilinear backwarp: per-tile base shift + tent window, pure XLA.

TPUs have no hardware gather, so ``grid_sample``-style per-pixel sampling
lowers to a ~4 GB/s scatter-gather path (measured 67 ms per 1024^2 x 64ch
warp vs 1.7 ms for a same-size 128-ch conv). This op replaces it with a
TPU-native decomposition executed as a ``lax.scan`` over output tiles:

1. each tile's input slab is taken with ``lax.dynamic_slice`` at the tile's
   rounded mean displacement (traced scalar starts),
2. bilinear sampling inside the tile is a short static sum over integer
   offsets weighted by separable tent functions
   ``relu(1-|res_x-dx|) * relu(1-|res_y-dy|)`` — exactly the bilinear
   weights, nonzero only at the true 4 taps. Pure VPU FMAs.

The scan keeps both the HLO and the working set small (one tile in flight,
f32 accumulation), and the op is differentiable for free, so the training
path uses it too. Measured ~10 ms per 1024^2 x 64ch warp (6.8x over gather).

Exact vs ``ops.warp.backwarp`` (grid_sample bilinear/zeros/align_corners=True)
while each pixel's ``|flow - tile_mean|`` stays within ``residual``; beyond
that the residual is clamped. In-tile flow variation for PIV is a few pixels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def window_residual_ok(flow: jax.Array, residual: int = 4,
                       tile: int = 128) -> jax.Array:
    """Scalar bool: ``backwarp_window`` is EXACT for this flow — every pixel's
    ``|flow - clipped round(tile mean)|`` fits the tent window. Mirrors the
    base computation inside ``backwarp_window`` exactly (incl. zero padding of
    partial tiles and the margin clip), so ``cond(ok, window, gather)`` is an
    always-exact fast path."""
    b, h, w, _ = flow.shape
    th = min(tile, h)
    tw = min(tile, w)
    hp, wp = _round_up(h, th), _round_up(w, tw)
    r = residual
    f = flow.astype(jnp.float32)
    if hp != h or wp != w:
        f = jnp.pad(f, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    mean = lax.reduce_window(
        f, 0.0, lax.add, (1, th, tw, 1), (1, th, tw, 1), "VALID"
    ) / (th * tw)
    lim = (2 * r + 2 + 64) - r - 2
    base = jnp.clip(jnp.round(mean), -lim, lim)
    res = f - jnp.repeat(jnp.repeat(base, th, axis=1), tw, axis=2)
    # exclude the zero-padded area (those outputs are sliced off)
    if hp != h or wp != w:
        mask = jnp.zeros((1, hp, wp, 1), jnp.float32).at[:, :h, :w].set(1.0)
        res = res * mask
    return jnp.max(jnp.abs(res)) <= float(r)


@functools.partial(jax.jit, static_argnames=("residual", "tile"))
def backwarp_window(img: jax.Array, flow: jax.Array, residual: int = 4,
                    tile: int = 128) -> jax.Array:
    """img [B,H,W,C], flow [B,H,W,2] -> [B,H,W,C]."""
    b, h, w, c = img.shape
    th = min(tile, h)
    tw = min(tile, w)
    hp = _round_up(h, th)
    wp = _round_up(w, tw)
    nth, ntw = hp // th, wp // tw
    nt = nth * ntw
    r = residual

    margin = 2 * r + 2 + 64  # covers the clamped base shift + window
    img_pad = jnp.pad(
        img, ((0, 0), (margin, margin + hp - h), (margin, margin + wp - w), (0, 0))
    )
    if hp != h or wp != w:
        flow = jnp.pad(flow, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))

    # per-tile integer base displacement
    tile_mean = lax.reduce_window(
        flow.astype(jnp.float32), 0.0, lax.add, (1, th, tw, 1), (1, th, tw, 1), "VALID"
    ) / (th * tw)
    lim = margin - r - 2
    base = jnp.clip(jnp.round(tile_mean), -lim, lim).astype(jnp.int32)
    base = base.reshape(b, nt, 2)

    # flow per tile, stacked [nt, B, th, tw, 2]
    flow_t = flow.reshape(b, nth, th, ntw, tw, 2).transpose(1, 3, 0, 2, 4, 5)
    flow_t = flow_t.reshape(nt, b, th, tw, 2)

    sh = th + 2 * r + 1
    sw = tw + 2 * r + 1

    # Chunked evaluation: stack `chunk` tiles so the tent-window loop has
    # enough parallel work per step (a 1-tile scan underutilizes the VPU and
    # blocks overlap), while bounding the f32 working set (a full stack OOMs
    # at batch 8: ~2 GB temps).
    chunk = max(1, min(nt, 8 // max(1, b) * 4 if b <= 8 else 1, 16))
    while nt % chunk:
        chunk -= 1
    nchunks = nt // chunk

    def chunk_body(_, inputs):
        idxs, f, bs = inputs  # [chunk], [chunk,B,th,tw,2], [chunk,B,2]

        def slab_one(idx1, imgp, bx, by):
            ti = idx1 // ntw
            tj = idx1 % ntw
            y0 = ti * th + margin + by - r
            x0 = tj * tw + margin + bx - r
            return lax.dynamic_slice(imgp, (y0, x0, 0), (sh, sw, c))

        # [chunk, B, sh, sw, C]
        slab = jax.vmap(
            lambda i1, bx, by: jax.vmap(slab_one, in_axes=(None, 0, 0, 0))(
                i1, img_pad, bx, by
            )
        )(idxs, bs[..., 0], bs[..., 1])

        f = f.astype(jnp.float32)
        res_u = jnp.clip(f[..., 0] - bs[..., None, None, 0].astype(jnp.float32), -r, r)
        res_v = jnp.clip(f[..., 1] - bs[..., None, None, 1].astype(jnp.float32), -r, r)

        acc = jnp.zeros((chunk, b, th, tw, c), jnp.float32)
        for dy in range(2 * r + 2):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(res_v - (dy - r)))
            for dx in range(2 * r + 2):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(res_u - (dx - r)))
                wgt = (wy * wx)[..., None]
                acc = acc + wgt * lax.slice(
                    slab, (0, 0, dy, dx, 0), (chunk, b, dy + th, dx + tw, c)
                ).astype(jnp.float32)
        return None, acc.astype(img.dtype)

    idx_all = jnp.arange(nt, dtype=jnp.int32).reshape(nchunks, chunk)
    flow_c = flow_t.reshape(nchunks, chunk, b, th, tw, 2)
    base_c = base.transpose(1, 0, 2).reshape(nchunks, chunk, b, 2)
    _, tiles = lax.scan(chunk_body, None, (idx_all, flow_c, base_c))
    tiles = tiles.reshape(nt, b, th, tw, c)  # [nt, B, th, tw, C]

    out = tiles.reshape(nth, ntw, b, th, tw, c).transpose(2, 0, 3, 1, 4, 5)
    out = out.reshape(b, hp, wp, c)
    if hp != h or wp != w:
        out = out[:, :h, :w]
    return out
