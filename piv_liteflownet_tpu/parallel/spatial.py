"""Spatial (H-axis) sharding for larger-than-chip images.

The reference destructively center-crops/resizes large frames to fit one GPU
(reference ``inference.py:39-49``, ``src/datasets.py:307-315``; a 1024^2 input
already earns a memory warning at ``inference.py:227``). The TPU-native answer
is to shard the image HEIGHT across the mesh and let GSPMD insert the halo
exchanges: convolutions, the shift-stack correlation and the resize matmuls
all have static, local stencils, so XLA materializes only +-halo rows per
chip and rides ICI for the exchanges.

Usage:
    mesh = make_mesh(n, axes=("spatial",))
    flow = spatial_estimate(model, img1, img2, mesh)

Works under jit with ``NamedSharding`` annotations only — no shard_map, no
manual collectives. The per-pixel gather warp is the one op whose sharded
lowering may all-gather its operand; the coarse pyramid levels are tiny, so
only level-1/2 warps matter (acceptable for a memory-bound regime; a halo
variant is the optimization follow-up).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from piv_liteflownet_tpu.models.liteflownet import ModelConfig, forward


def spatial_shardings(mesh: Mesh, axis: str = "spatial"):
    """(input, replicated) shardings: [B, H, W, C] split on H."""
    return NamedSharding(mesh, P(None, axis)), NamedSharding(mesh, P())


@functools.partial(jax.jit, static_argnames=("cfg", "precision", "ctx"))
def _spatial_forward(params, img1, img2, cfg, precision=None, ctx=None):
    # ctx is static (hashable frozen dataclass incl. the Mesh) so the halo
    # and non-halo variants trace/cache separately.
    if ctx is not None:
        from piv_liteflownet_tpu.parallel.ctx import spatial_context

        with spatial_context(ctx.mesh, ctx.axis, ctx.halo):
            return forward(params, img1, img2, cfg, train=False, precision=precision)
    return forward(params, img1, img2, cfg, train=False, precision=precision)


def spatial_estimate(model, img1, img2, mesh: Mesh, axis: str = "spatial",
                     halo: int = 32, halo_warp: bool = True):
    """Eval-mode forward with the batch's H dimension sharded over ``mesh``.

    img1/img2: [B, H, W, 3] with H divisible by (32 * mesh size). Returns the
    final scaled flow, fully replicated (gathered) on exit.

    ``halo_warp=True`` routes the full-res warps through the halo-exchange
    implementation (ops/halo_warp.py): per-device peak memory stays ~H/N and
    boundary traffic is 2*halo rows over ICI instead of a GSPMD all-gather of
    the warped operand. Exact — an on-device v-bound check falls back to the
    gather warp when |v| >= halo.
    """
    from piv_liteflownet_tpu.parallel.ctx import SpatialCtx

    in_sh, repl = spatial_shardings(mesh, axis)
    img1 = jax.device_put(jnp.asarray(img1), in_sh)
    img2 = jax.device_put(jnp.asarray(img2), in_sh)
    params = jax.device_put(model.params, repl)
    ctx = SpatialCtx(mesh, axis, halo) if halo_warp else None
    out = _spatial_forward(params, img1, img2, model.cfg, ctx=ctx)
    return jax.device_put(out, repl)
