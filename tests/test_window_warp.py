"""XLA window warp vs the exact gather warp, incl. full-model equivalence."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piv_liteflownet_tpu.ops.warp import backwarp
from piv_liteflownet_tpu.ops.window_warp import backwarp_window


def _case(seed, shape=(2, 64, 96, 8), base_mag=6.0, var_mag=1.5):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.random(shape, dtype=np.float32))
    b = rng.uniform(-base_mag, base_mag, (shape[0], 1, 1, 2)).astype(np.float32)
    v = rng.standard_normal((*shape[:3], 2)).astype(np.float32) * var_mag
    return img, jnp.asarray(b + v)


def test_matches_gather_for_smooth_flow():
    img, flow = _case(0)
    got = backwarp_window(img, flow, residual=8, tile=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(backwarp(img, flow)), atol=1e-5)


def test_identity_offimage_odd():
    img, _ = _case(1)
    out = backwarp_window(img, jnp.zeros((*img.shape[:3], 2)), residual=2, tile=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)
    big = jnp.full((*img.shape[:3], 2), 40.0)
    np.testing.assert_allclose(
        np.asarray(backwarp_window(img, big, 4, 32)),
        np.asarray(backwarp(img, big)), atol=1e-6)
    rng = np.random.default_rng(2)
    img3 = jnp.asarray(rng.random((1, 50, 70, 4), dtype=np.float32))
    flow3 = jnp.asarray(rng.standard_normal((1, 50, 70, 2)).astype(np.float32) * 2)
    np.testing.assert_allclose(
        np.asarray(backwarp_window(img3, flow3, 10, 32)),
        np.asarray(backwarp(img3, flow3)), atol=1e-5)


def test_gradients_match_gather():
    img, flow = _case(3, var_mag=0.8)

    def loss(fn):
        return lambda f: jnp.sum(jnp.square(fn(img, f)))

    g_win = jax.grad(loss(lambda a, f: backwarp_window(a, f, 8, 32)))(flow)
    g_ref = jax.grad(loss(backwarp))(flow)
    np.testing.assert_allclose(np.asarray(g_win), np.asarray(g_ref), atol=1e-3, rtol=1e-3)


def test_full_model_window_matches_gather():
    """Eval forward with window warp == gather warp on realistic inputs."""
    from piv_liteflownet_tpu.models.factory import piv_liteflownet
    from piv_liteflownet_tpu.models.liteflownet import forward

    model = piv_liteflownet(version=1)
    rng = np.random.default_rng(4)
    img1 = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    img2 = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    ref = forward(model.params, img1, img2, model.cfg, train=False)
    cfg_w = dataclasses.replace(model.cfg, warp_impl="window", warp_residual=8, warp_tile=32)
    got = forward(model.params, img1, img2, cfg_w, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-3)
