"""Minimal NHWC conv primitives with torch-compatible numerics.

The reference model (reference ``src/models.py``) is built from
``torch.nn.Conv2d`` / ``ConvTranspose2d`` / ``LeakyReLU(0.1)``. Here the same
math is expressed TPU-first: NHWC layout, ``lax.conv_general_dilated`` on the
MXU, and explicit parameter pytrees (flat dicts keyed by torch-style names so
the weight converter is a pure layout transpose).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

# Dimension numbers for NHWC activations and HWIO kernels (TPU-native).
DIMNUMS = ("NHWC", "HWIO", "NHWC")


def leaky_relu(x: jax.Array, negative_slope: float = 0.1) -> jax.Array:
    """LeakyReLU matching ``torch.nn.LeakyReLU(negative_slope=0.1)``."""
    return jnp.where(x >= 0, x, x * negative_slope)


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] = 0,
    precision=None,
) -> jax.Array:
    """2D convolution, NHWC input, HWIO kernel, symmetric integer padding.

    Matches ``torch.nn.Conv2d(stride=stride, padding=padding)`` numerics
    (cross-correlation, zero padding).
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=pad,
        dimension_numbers=DIMNUMS,
        precision=precision,
    )
    if b is not None:
        out = out + b
    return out


def depthwise_deconv4x2(x: jax.Array, w_flipped: jax.Array, precision=None) -> jax.Array:
    """Depthwise ``ConvTranspose2d(C, C, kernel=4, stride=2, padding=1, groups=C)``.

    The reference uses this as a *trainable* 2x flow / cost-volume upsampler
    (reference ``src/models.py:144-152``). Implemented as the standard
    transposed-conv identity: dilate the input by 2 and run a stride-1
    depthwise conv with the spatially flipped kernel and padding k-1-p = 2.

    ``w_flipped`` must already be spatially flipped and laid out ``(4, 4, 1, C)``
    (HWIO for ``feature_group_count=C``); the torch->JAX converter performs the
    flip once at load time.
    """
    c = x.shape[-1]
    return lax.conv_general_dilated(
        x,
        w_flipped,
        window_strides=(1, 1),
        padding=[(2, 2), (2, 2)],
        lhs_dilation=(2, 2),
        dimension_numbers=DIMNUMS,
        feature_group_count=c,
        precision=precision,
    )


def torch_conv_init(
    key: jax.Array,
    kh: int,
    kw: int,
    c_in: int,
    c_out: int,
    bias: bool = True,
    transpose_groups: Optional[int] = None,
):
    """Initialize conv params with torch's default scheme.

    torch uses ``kaiming_uniform_(a=sqrt(5))`` which reduces to
    ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))``, and the same bound for bias.
    For ``ConvTranspose2d`` torch computes fan_in from ``weight.size(1)``
    (= out_channels/groups), which we mirror via ``transpose_groups``.

    Returns ``(w, b)`` with ``w`` in HWIO layout (for transposed depthwise
    convs: already in the ``depthwise_deconv4x2`` layout).
    """
    kw_, kb_ = jax.random.split(key)
    if transpose_groups is None:
        fan_in = c_in * kh * kw
        shape = (kh, kw, c_in, c_out)
    else:
        fan_in = (c_out // transpose_groups) * kh * kw
        # depthwise transpose: stored (kh, kw, 1, C)
        shape = (kh, kw, c_in // transpose_groups, c_out)
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw_, shape, jnp.float32, -bound, bound)
    b = jax.random.uniform(kb_, (c_out,), jnp.float32, -bound, bound) if bias else None
    return w, b


def unfold_nhwc(x: jax.Array, k: int) -> jax.Array:
    """Extract k*k zero-padded sliding patches of a 1-channel NHWC map.

    Equivalent to ``torch.nn.functional.unfold(kernel_size=k, padding=(k-1)//2)``
    on a ``[B,1,H,W]`` tensor followed by a view back to ``[B,k*k,H,W]``
    (reference ``src/models.py:288-300``), but returned NHWC: ``[B,H,W,k*k]``.
    Patch channel order matches torch: d = dy*k + dx, row-major over the window.
    """
    b, h, w, c = x.shape
    assert c == 1
    pad = (k - 1) // 2
    xp = jnp.pad(x[..., 0], ((0, 0), (pad, pad), (pad, pad)))
    outs = []
    for dy in range(k):
        for dx in range(k):
            outs.append(lax.slice(xp, (0, dy, dx), (b, dy + h, dx + w)))
    return jnp.stack(outs, axis=-1)
