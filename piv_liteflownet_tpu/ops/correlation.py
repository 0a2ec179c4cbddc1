"""Cost-volume (local correlation) op — the centerpiece custom op.

Semantics (matching the reference CuPy CUDA kernels, reference
``src/correlation.py:36-104``): for feature maps ``f1, f2`` of shape
``[B, H, W, C]`` (the reference is NCHW; we are NHWC) and integer ``stride``
``s``, the output is ``[B, ceil(H/s), ceil(W/s), 49]`` with

    out[b, y, x, d] = (1/C) * sum_c f1[b, y*s, x*s, c] * f2z[b, y*s + dy*s, x*s + dx*s, c]

where ``d = (dy+3)*7 + (dx+3)``, ``dy, dx in [-3, 3]`` and ``f2z`` is ``f2``
zero-padded by ``3*s`` on each spatial side (displacements that fall outside
the image contribute zero).

``correlation_xla`` is the reference/parity formulation: 49 shifted
elementwise multiplies + channel reductions that XLA fuses into a handful of
VPU loops. ``correlation`` wraps it in ``jax.custom_vjp`` so the backward pass
is the transposed shift-stack (one fused XLA program) instead of the
reference's per-sample Python loop over scatter kernels (reference
``src/correlation.py:361-396``). A Pallas VMEM-resident kernel slots in behind
the same API in the performance pass (see ``piv_liteflownet_tpu/ops/pallas_corr.py``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

# perf-experiment escape hatch (work/prof_*.py): skip the operand fences
_NO_BARRIER = os.environ.get("PIV_NO_CORR_BARRIER", "") == "1"


def _fence(x):
    return x if _NO_BARRIER else lax.optimization_barrier(x)

MD = 3  # max displacement (7x7 window)
NDISP = (2 * MD + 1) ** 2  # 49


def out_hw(h: int, w: int, stride: int) -> tuple[int, int]:
    return -(-h // stride), -(-w // stride)


def correlation_xla(f1: jax.Array, f2: jax.Array, stride: int = 1) -> jax.Array:
    """Pure-XLA cost volume. NHWC in, [B,H',W',49] out.

    The operands are fenced with ``optimization_barrier``: without it XLA
    fuses each operand's producer (e.g. the backwarp feeding ``f2``,
    reference ``src/models.py:171``) into all 49 shifted multiply-reduce
    consumers and RECOMPUTES it per tap — measured 345 ms instead of 16 ms
    inside the full model at 1024^2.
    """
    f1, f2 = _fence((f1, f2))
    b, h, w, c = f1.shape
    # Displacements are multiples of the stride and outputs live on the
    # stride-s grid, so only the even phase of both maps participates:
    # subsample ONCE, then every shifted tap is a cheap stride-1 slice.
    f1s = f1[:, ::stride, ::stride, :]
    f2s = f2[:, ::stride, ::stride, :]
    if stride > 1:
        f1s, f2s = _fence((f1s, f2s))
    hs, ws = f1s.shape[1], f1s.shape[2]
    f2p = jnp.pad(f2s, ((0, 0), (MD, MD), (MD, MD), (0, 0)))
    f2p = _fence(f2p)
    inv_c = jnp.asarray(1.0 / c, f1.dtype)
    outs = []
    for dy in range(-MD, MD + 1):
        for dx in range(-MD, MD + 1):
            sl = lax.slice(
                f2p,
                (0, MD + dy, MD + dx, 0),
                (b, MD + dy + hs, MD + dx + ws, c),
            )
            outs.append(jnp.sum(f1s * sl, axis=-1) * inv_c)
    return jnp.stack(outs, axis=-1)


def _corr_fwd_rule(f1, f2, stride):
    return correlation_xla(f1, f2, stride), (f1, f2)


def _corr_bwd_rule(stride, res, g):
    f1, f2 = res
    _, vjp = jax.vjp(lambda a, b: correlation_xla(a, b, stride), f1, f2)
    return vjp(g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def correlation(f1: jax.Array, f2: jax.Array, stride: int = 1) -> jax.Array:
    """Differentiable cost volume; see module docstring for semantics."""
    return correlation_xla(f1, f2, stride)


correlation.defvjp(_corr_fwd_rule, _corr_bwd_rule)
