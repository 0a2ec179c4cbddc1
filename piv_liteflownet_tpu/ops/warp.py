"""Backward warping: bilinear gather of an image/feature map by a dense flow.

Matches ``torch.nn.functional.grid_sample(mode='bilinear',
padding_mode='zeros', align_corners=True)`` driven by the normalized mesh grid
the reference builds in ``backwarp`` (reference ``src/models.py:20-35``).
Because the reference grid is ``linspace(-1, 1, W)`` with ``align_corners=True``
normalization, the composite math collapses to *pixel-space* sampling at
``(x + u, y + v)`` — no normalization round-trip is needed on TPU, and the
reference's per-shape grid cache (reference ``src/models.py:17-27``) is
unnecessary under jit (the iota is traced once).

TPU note: gathers are descriptor-bound (measured: a 1M-row gather costs the
same ~18 ms whether rows are 64 or 128 channels wide). The four bilinear
corner taps are therefore packed into ONE gather of 4C-wide rows — built from
four statically shifted copies of the (zero-padded) image — instead of four
separate gathers: ~3.4x faster with bit-identical semantics. Out-of-bounds
taps read the zero padding (grid_sample 'zeros').
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def backwarp(img: jax.Array, flow: jax.Array, stride: int = 1) -> jax.Array:
    """Sample ``img`` at ``(stride*x + u, stride*y + v)`` bilinearly, zeros padding.

    img:  [B, H, W, C]
    flow: [B, ceil(H/stride), ceil(W/stride), 2]  (u horizontal, v vertical)

    ``stride > 1`` evaluates the warp only on the stride-s output grid — the
    exact subset a stride-s correlation consumes (its taps are multiples of s,
    reference ``src/correlation.py:58-63``), so warping the other phases would
    be wasted gather descriptors (the gather is row-count-bound on TPU).

    Batches >= 8 at large resolutions are processed in two sequential halves:
    the packed 4-tap array is 4x the image (the memory cost of the one-gather
    trick), and halving its transient peak is what lets the full model fit
    HBM at batch 8 — the gather is descriptor-bound, so the serialization
    costs nothing.
    """
    b, h, w, c = img.shape
    if b >= 8 and b % 2 == 0 and h * w >= 512 * 512:
        hs_, ws_ = flow.shape[1], flow.shape[2]
        out = lax.map(  # scan: the two halves run SEQUENTIALLY, halving peak
            lambda ab: backwarp(ab[0], ab[1], stride),
            (img.reshape(2, b // 2, h, w, c),
             flow.reshape(2, b // 2, hs_, ws_, 2)),
        )
        return out.reshape(b, out.shape[2], out.shape[3], c)
    return gather_warp(pack_img(img), h, w, flow, stride)


def pack_img(img: jax.Array) -> jax.Array:
    """Build the packed 4-tap array ONCE for an image that will be warped by
    several flows (e.g. the same feature map feeds both the M and the S warp
    of a pyramid level): [B,H,W,C] -> [B,(H+1)*(W+1),4C]. The build costs
    ~3 ms/pair at 1024^2x64 (profiled), so sharing it between warps is a
    direct saving."""
    b, h, w, c = img.shape
    hp, wp = h + 2, w + 2
    imgp = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    packed = jnp.concatenate(
        [
            imgp[:, : hp - 1, : wp - 1, :],   # (y0, x0)
            imgp[:, : hp - 1, 1:, :],         # (y0, x0+1)
            imgp[:, 1:, : wp - 1, :],         # (y0+1, x0)
            imgp[:, 1:, 1:, :],               # (y0+1, x0+1)
        ],
        axis=-1,
    )  # [B, h+1, w+1, 4C]
    return packed.reshape(b, (h + 1) * (w + 1), 4 * c)


def gather_warp(packed: jax.Array, h: int, w: int, flow: jax.Array,
                stride: int = 1) -> jax.Array:
    """Gather+interpolate phase of :func:`backwarp` from a prepacked array."""
    b = packed.shape[0]
    c = packed.shape[-1] // 4
    dtype = packed.dtype
    hs, ws = flow.shape[1], flow.shape[2]

    ix = lax.broadcasted_iota(jnp.float32, (hs, ws), 1) * stride
    iy = lax.broadcasted_iota(jnp.float32, (hs, ws), 0) * stride
    x = ix[None] + flow[..., 0].astype(jnp.float32)
    y = iy[None] + flow[..., 1].astype(jnp.float32)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(dtype)
    wy = (y - y0).astype(dtype)

    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)
    oob = (xi < -1) | (xi > w - 1) | (yi < -1) | (yi > h - 1)
    xc = jnp.clip(xi + 1, 0, w)
    yc = jnp.clip(yi + 1, 0, h)
    flat_idx = (yc * (w + 1) + xc).reshape(b, hs * ws)
    vals = jnp.take_along_axis(
        packed, flat_idx[..., None], axis=1, mode="promise_in_bounds",
    ).reshape(b, hs, ws, 4, c)

    one = jnp.asarray(1, dtype)
    w00 = (one - wx) * (one - wy)
    w01 = wx * (one - wy)
    w10 = (one - wx) * wy
    w11 = wx * wy
    weights = jnp.stack([w00, w01, w10, w11], axis=-1)  # [B,hs,ws,4]
    weights = jnp.where(oob[..., None], jnp.zeros((), dtype), weights)
    return jnp.einsum("bhwk,bhwkc->bhwc", weights, vals)


def gather_warp_banded(packed: jax.Array, h: int, w: int, flow: jax.Array,
                       starts, bh2: int, stride: int = 1) -> jax.Array:
    """:func:`gather_warp`, but emitting the space-to-batch H-band layout
    DIRECTLY: [B, hs, ws, 2] flow -> [B*k, bh2, ws, C] output, band windows
    ``rows starts[i] .. starts[i]+bh2`` of the output grid (batch-major
    flattening: output row ``j`` is batch ``j // k``, band ``j % k``).

    The band layout costs NOTHING here — the gather is descriptor-bound, and
    banding only rearranges (plus slightly duplicates, halo rows only) which
    descriptors are issued. This is the producer-fused alternative to
    ``_space_to_batch`` on a materialized warp output (an HBM round-trip of
    the full tensor), built so downstream conv stacks can run at the batch
    >= 8 rate XLA's large-frame conv tiling wants.
    """
    b = packed.shape[0]
    c = packed.shape[-1] // 4
    dtype = packed.dtype
    ws = flow.shape[2]
    k = len(starts)

    # Same two-half sequential split as backwarp: the packed-tap transient is
    # 4x the image, and halving its peak is what keeps batch >= 8 at large
    # frames inside HBM (ADVICE r3; the gather is descriptor-bound, so the
    # serialization is free).
    if b >= 8 and b % 2 == 0 and h * w >= 512 * 512:
        hs_ = flow.shape[1]
        out = lax.map(
            lambda pf: gather_warp_banded(pf[0], h, w, pf[1], starts, bh2, stride),
            (packed.reshape(2, b // 2, *packed.shape[1:]),
             flow.reshape(2, b // 2, hs_, ws, 2)),
        )
        return out.reshape(b * k, bh2, ws, c)

    starts_a = jnp.asarray(starts, jnp.int32)  # [k], output-grid row units
    # banded flow: [B, k, bh2, ws, 2] (2-channel copy — negligible traffic)
    row_idx = starts_a[:, None] + jnp.arange(bh2, dtype=jnp.int32)[None]  # [k, bh2]
    flow_b = flow[:, row_idx]  # [B, k, bh2, ws, 2]

    ix = lax.broadcasted_iota(jnp.float32, (bh2, ws), 1) * stride
    iy = (row_idx.astype(jnp.float32) * stride)[:, :, None]  # [k, bh2, 1]
    x = ix[None, None] + flow_b[..., 0].astype(jnp.float32)
    y = iy[None] + flow_b[..., 1].astype(jnp.float32)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(dtype)
    wy = (y - y0).astype(dtype)

    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)
    oob = (xi < -1) | (xi > w - 1) | (yi < -1) | (yi > h - 1)
    xc = jnp.clip(xi + 1, 0, w)
    yc = jnp.clip(yi + 1, 0, h)
    flat_idx = (yc * (w + 1) + xc).reshape(b, k * bh2 * ws)
    vals = jnp.take_along_axis(
        packed, flat_idx[..., None], axis=1, mode="promise_in_bounds",
    ).reshape(b, k, bh2, ws, 4, c)

    one = jnp.asarray(1, dtype)
    w00 = (one - wx) * (one - wy)
    w01 = wx * (one - wy)
    w10 = (one - wx) * wy
    w11 = wx * wy
    weights = jnp.stack([w00, w01, w10, w11], axis=-1)  # [B,k,bh2,ws,4]
    weights = jnp.where(oob[..., None], jnp.zeros((), dtype), weights)
    out = jnp.einsum("bkhwt,bkhwtc->bkhwc", weights, vals)
    return out.reshape(b * k, bh2, ws, c)
