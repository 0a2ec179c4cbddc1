"""Device mesh + sharding helpers.

The reference's only parallelism is single-process multi-GPU
``nn.parallel.DataParallel`` (reference ``trainer.py:371-376``). The
TPU-native replacement is SPMD over a ``jax.sharding.Mesh``: batch axis
sharded over ``data``, params replicated, XLA inserting the gradient
``psum`` over ICI. An optional ``spatial`` axis shards image H for
larger-than-chip images (halo exchange comes from XLA's conv padding
handling under ``shard_map``-free jit).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None, devices=None) -> Mesh:
    """Build a mesh over the first ``n_devices`` local devices.

    axes/shape default to a 1-D ``data`` axis covering all devices.
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axes) - 1)
    arr = np.asarray(devs).reshape(tuple(shape))
    return Mesh(arr, tuple(axes))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-dim sharding for [B, ...] arrays."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
