"""Flow post-processing: vorticity / shear / normal strain from Sobel-style
derivatives (reference ``src/postpro.py:5-50``), vectorized in JAX.

Derivative convention matches the reference ``calc_vorticity``:
Sobel 3x3 kernels over symmetric-padded fields, divided by ``8 * calib``;
``vort = dv/dx - du/dy``, ``shear = dv/dx + du/dy``, ``normal = -shear``.
Batched NHWC-friendly (works on [H,W,2] or [B,H,W,2]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# Sobel x-derivative kernel (as in reference: [[1,0,-1],[2,0,-2],[1,0,-1]]/8)
_SOBEL = jnp.asarray([[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]]) / 8.0


def _conv_symm(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """'same' 2D correlation with symmetric (reflect-edge) padding on [B,H,W]."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode="symmetric")
    # scipy.convolve2d flips the kernel; use the flipped kernel to match.
    k = kernel[::-1, ::-1][..., None, None]  # HWIO
    return lax.conv_general_dilated(
        xp[..., None], k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )[..., 0]


def calc_vorticity(flow: jax.Array, calib: float = 1.0):
    """Returns (vorticity, shear_strain, normal_strain).

    flow: [H, W, 2] or [B, H, W, 2].
    """
    squeeze = flow.ndim == 3
    if squeeze:
        flow = flow[None]
    u = flow[..., 0]
    v = flow[..., 1]
    # reference: du = conv(u, -kernel.T), dv = conv(v, kernel), both /calib
    du = _conv_symm(u, -_SOBEL.T) / calib  # du/dy (sign per reference)
    dv = _conv_symm(v, _SOBEL) / calib  # dv/dx
    vort = dv - du
    shear = dv + du
    normal = -(dv + du)
    if squeeze:
        return vort[0], shear[0], normal[0]
    return vort, shear, normal


def de_vort(flow: jax.Array, calib: float = 1.0):
    """Loop-free equivalent of the reference's explicit-stencil variant
    (reference ``src/postpro.py:27-50``): returns (vort, du/dy, dv/dx)."""
    squeeze = flow.ndim == 3
    if squeeze:
        flow = flow[None]
    u = flow[..., 0]
    v = flow[..., 1]
    # vx[i,j] = (v[i+1,j+1]+2v[i,j+1]+v[i-1,j+1] - (v[i+1,j-1]+2v[i,j-1]+v[i-1,j-1]))/8
    kx = jnp.asarray([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]]) / 8.0
    ky = jnp.asarray([[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]]) / 8.0

    def corr(x, k):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode="edge")
        return lax.conv_general_dilated(
            xp[..., None], k[..., None, None], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[..., 0]

    vx = corr(v, kx) / calib
    uy = corr(u, ky) / calib
    vort = vx - uy
    if squeeze:
        return vort[0], uy[0], vx[0]
    return vort, uy, vx
