"""Backward warping: bilinear gather of an image/feature map by a dense flow.

Matches ``torch.nn.functional.grid_sample(mode='bilinear',
padding_mode='zeros', align_corners=True)`` driven by the normalized mesh grid
the reference builds in ``backwarp`` (reference ``src/models.py:20-35``).
Because the reference grid is ``linspace(-1, 1, W)`` with ``align_corners=True``
normalization, the composite math collapses to *pixel-space* sampling at
``(x + u, y + v)`` — no normalization round-trip is needed on TPU, and the
reference's per-shape grid cache (reference ``src/models.py:17-27``) is
unnecessary under jit (the iota is traced once).

Out-of-bounds corner taps contribute zero (grid_sample 'zeros' padding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def backwarp(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Sample ``img`` at ``(x + u, y + v)`` bilinearly with zeros padding.

    img:  [B, H, W, C]
    flow: [B, H, W, 2]  (u = flow[..., 0] horizontal, v = flow[..., 1] vertical)
    """
    b, h, w, c = img.shape
    dtype = img.dtype

    ix = lax.broadcasted_iota(dtype, (h, w), 1)
    iy = lax.broadcasted_iota(dtype, (h, w), 0)
    x = ix[None] + flow[..., 0]
    y = iy[None] + flow[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(yi, xi):
        """Gather img[b, yi, xi, :] with zero fill for OOB indices."""
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat_idx = (yc * w + xc).reshape(b, h * w)
        vals = jnp.take_along_axis(
            img.reshape(b, h * w, c), flat_idx[..., None], axis=1
        ).reshape(b, h, w, c)
        return vals * valid[..., None].astype(dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)

    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )
