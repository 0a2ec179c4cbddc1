"""Spatial (H-axis) sharding: sharded eval must match single-device output."""

import numpy as np

import jax
import jax.numpy as jnp

from piv_liteflownet_tpu.models.factory import piv_liteflownet
from piv_liteflownet_tpu.parallel.mesh import make_mesh
from piv_liteflownet_tpu.parallel.spatial import spatial_estimate, spatial_shardings


def test_spatial_sharded_forward_matches_single_device():
    model = piv_liteflownet(version=1)
    rng = np.random.default_rng(0)
    # H = 128 over 4 chips -> 32 rows/chip at full res, 1 row/chip at level 6
    img1 = rng.random((1, 128, 64, 3), dtype=np.float32)
    img2 = rng.random((1, 128, 64, 3), dtype=np.float32)

    ref = np.asarray(model(jnp.asarray(img1), jnp.asarray(img2)))

    mesh = make_mesh(4, axes=("spatial",))
    out = spatial_estimate(model, img1, img2, mesh)
    assert len(jax.device_put(out, spatial_shardings(mesh)[1]).sharding.device_set) == 4
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=1e-3)
