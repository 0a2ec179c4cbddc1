"""Spatial-sharding context: lets the model's warp pick the halo-exchange
implementation when the forward runs H-sharded, without threading mesh
objects through every layer call.

Set by ``parallel.spatial.spatial_estimate`` around the jitted forward; read
by ``models.liteflownet._warp`` at TRACE time (the context is static under
jit, so the traced program bakes in the right implementation).
"""

from __future__ import annotations

import contextlib
import dataclasses
import threading
from typing import Optional

from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class SpatialCtx:
    mesh: Mesh
    axis: str = "spatial"
    halo: int = 32  # exactness bound: max |v| must stay < halo (guarded)


_tls = threading.local()


def get_spatial_ctx() -> Optional[SpatialCtx]:
    return getattr(_tls, "ctx", None)


@contextlib.contextmanager
def spatial_context(mesh: Mesh, axis: str = "spatial", halo: int = 32):
    prev = get_spatial_ctx()
    _tls.ctx = SpatialCtx(mesh, axis, halo)
    try:
        yield
    finally:
        _tls.ctx = prev
