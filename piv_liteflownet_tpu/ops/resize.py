"""Bilinear resize with torch ``F.interpolate(align_corners=False)`` numerics.

Used for (a) the image pyramid downsampled to feature-map sizes (reference
``src/models.py:336-343``), (b) the /32 adaptive resize in ``estimate()``
(reference ``inference.py:39-49``), and (c) LiteFlowNet2's final training
upsample (reference ``src/models.py:709-713``).

``jax.image.resize`` anti-aliases on downscale, which torch does NOT — so this
is implemented exactly: separable 1-D linear interpolation with half-pixel
source coordinates ``src = (dst + 0.5) * in/out - 0.5`` clamped to the valid
range. The per-axis gathers are expressed as small dense interpolation-matrix
matmuls (built with numpy at trace time, shapes are static), which map straight
onto the MXU instead of dynamic gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=256)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense [out_size, in_size] torch-style bilinear interpolation matrix."""
    m = np.zeros((out_size, in_size), np.float32)
    if in_size == out_size:
        np.fill_diagonal(m, 1.0)
        return m
    scale = in_size / out_size
    d = np.arange(out_size, dtype=np.float64)
    src = np.clip((d + 0.5) * scale - 0.5, 0.0, in_size - 1)
    x0 = np.floor(src).astype(np.int64)
    x1 = np.minimum(x0 + 1, in_size - 1)
    wgt = (src - x0).astype(np.float32)
    np.add.at(m, (np.arange(out_size), x0), 1.0 - wgt)
    np.add.at(m, (np.arange(out_size), x1), wgt)
    return m


#: exact factor-2 downsamples as avg_pool ("pool") or the interp matmuls
#: ("einsum", default pending the in-model A/B). For out = in/2 the torch
#: half-pixel source is src = 2d + 0.5, i.e. weights (0.5, 0.5) on
#: (2d, 2d+1) — identical math (bit-exact vs torch, test_ops) — and
#: reduce_window avoids the layout transpose XLA inserts for the
#: W-contraction einsum (c is the minor dim; the r3 trace attributed
#: 20-23%% of forward time to such copies). Probe knob PIV_RESIZE_HALF.
_RESIZE_HALF = __import__("os").environ.get("PIV_RESIZE_HALF", "einsum")


def resize_bilinear(x: jax.Array, out_h: int, out_w: int, precision=None) -> jax.Array:
    """Resize NHWC ``x`` to (out_h, out_w), torch align_corners=False bilinear."""
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    if (h, w) == (2 * out_h, 2 * out_w) and _RESIZE_HALF == "pool":
        # f32 accumulation like the MXU matmuls (bf16 reduce_window would
        # accumulate in bf16); the convert fuses into the reduce_window.
        return avg_pool(x.astype(jnp.float32), 2).astype(x.dtype)
    dtype = x.dtype
    mh = jnp.asarray(_interp_matrix(h, out_h), dtype)
    mw = jnp.asarray(_interp_matrix(w, out_w), dtype)
    # [B,H,W,C] -> contract H -> [B,out_h,W,C] -> contract W -> [B,out_h,out_w,C]
    y = jnp.einsum("oh,bhwc->bowc", mh, x, precision=precision)
    y = jnp.einsum("ow,bhwc->bhoc", mw, y, precision=precision)
    return y


def avg_pool(x: jax.Array, k: int) -> jax.Array:
    """Non-overlapping average pool (``torch.nn.AvgPool2d(k, k)``), NHWC."""
    if k == 1:
        return x
    out = lax.reduce_window(
        x, 0.0, lax.add, (1, k, k, 1), (1, k, k, 1), padding="VALID"
    )
    return out / (k * k)
