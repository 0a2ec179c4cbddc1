"""Halo-exchange backwarp for H-sharded images (spatial parallelism).

Under GSPMD, the per-pixel gather warp is the one model op whose sharded
lowering all-gathers its operand (every output row may read any input row in
principle), defeating the memory scaling that spatial sharding exists for
(SURVEY §5: the reference center-crops big frames instead,
``src/datasets.py:307-315``). This op makes the locality explicit:

1. each shard ``ppermute``-exchanges ``halo`` boundary rows with its mesh
   neighbors over ICI (2*halo rows of traffic instead of H),
2. the halos at the global top/bottom are zeroed (grid_sample 'zeros'
   semantics — identical to the zero padding the unsharded warp reads),
3. the exact packed-gather backwarp then runs purely shard-locally on the
   ``[B, Hs + 2*halo, W, C]`` slab with the v-component rebased by ``halo``.

EXACT while every ``|v|`` stays < halo (checked by ``v_bound_ok``; callers
``lax.cond``-fall back to the plain GSPMD warp otherwise). Per-device peak
memory stays ~H/N + 2*halo rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from piv_liteflownet_tpu.ops.warp import backwarp


def v_bound_ok(flow: jax.Array, halo: int) -> jax.Array:
    """Scalar bool: the halo warp is exact for this flow's v component."""
    return jnp.max(jnp.abs(flow[..., 1].astype(jnp.float32))) < float(halo)


def halo_backwarp(img: jax.Array, flow: jax.Array, mesh: Mesh,
                  axis: str = "spatial", halo: int = 32,
                  stride: int = 1) -> jax.Array:
    """H-sharded exact backwarp (see module docstring).

    img  [B, H, W, C]   sharded P(None, axis) on H
    flow [B, H/stride, W/stride, 2] (the stride-s output grid, like
         ``ops.warp.backwarp``); H/stride must divide evenly by the mesh axis.
    """
    n = mesh.shape[axis]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis)),
        out_specs=P(None, axis),
    )
    def _local(img_l, flow_l):
        k = lax.axis_index(axis)
        # neighbor boundary rows ride ICI; ring wrap-around rows are zeroed at
        # the global edges = the zero padding grid_sample('zeros') reads.
        up = lax.ppermute(img_l[:, -halo:], axis,
                          [(i, (i + 1) % n) for i in range(n)])
        dn = lax.ppermute(img_l[:, :halo], axis,
                          [(i, (i - 1) % n) for i in range(n)])
        zero = jnp.zeros((), img_l.dtype)
        up = jnp.where(k == 0, zero, up)
        dn = jnp.where(k == n - 1, zero, dn)
        slab = jnp.concatenate([up, img_l, dn], axis=1)
        # output row y of this shard samples global row k*Hs + stride*y + v
        # = slab row stride*y + v + halo; rebase v by +halo.
        shift = jnp.asarray([0.0, float(halo)], jnp.float32)
        return backwarp(slab, flow_l.astype(jnp.float32) + shift, stride=stride)

    return _local(img, flow)
