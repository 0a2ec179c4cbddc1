"""Pallas tiled warp vs the exact gather warp (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piv_liteflownet_tpu.ops.pallas_warp import backwarp_tiled
from piv_liteflownet_tpu.ops.warp import backwarp


def _case(seed, shape=(2, 64, 96, 8), base_mag=6.0, var_mag=1.5):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.random(shape, dtype=np.float32))
    b = rng.uniform(-base_mag, base_mag, (shape[0], 1, 1, 2)).astype(np.float32)
    v = rng.standard_normal((*shape[:3], 2)).astype(np.float32) * var_mag
    return img, jnp.asarray(b + v)


def test_matches_gather_for_smooth_flow():
    img, flow = _case(0)
    got = backwarp_tiled(img, flow, residual=8, tile=32, interpret=True)
    ref = backwarp(img, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_identity_and_zero_padding():
    img, _ = _case(1)
    out = backwarp_tiled(img, jnp.zeros((*img.shape[:3], 2)), residual=2, tile=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)
    # constant flow far outside the frame -> zeros (grid_sample 'zeros')
    big = jnp.full((*img.shape[:3], 2), 40.0)
    out2 = backwarp_tiled(img, big, residual=4, tile=32, interpret=True)
    ref2 = backwarp(img, big)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=1e-6)


def test_non_divisible_shapes():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((1, 50, 70, 4), dtype=np.float32))
    flow = jnp.asarray(rng.standard_normal((1, 50, 70, 2)).astype(np.float32) * 2)
    got = backwarp_tiled(img, flow, residual=10, tile=32, interpret=True)
    ref = backwarp(img, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_residual_clamp_degrades_gracefully():
    """Out-of-window residuals clamp instead of corrupting neighbours."""
    img, flow = _case(3, var_mag=6.0)
    got = np.asarray(backwarp_tiled(img, flow, residual=3, tile=32, interpret=True))
    ref = np.asarray(backwarp(img, flow))
    assert np.isfinite(got).all()
    # pixels whose true in-tile residual fits well inside the window stay exact
    f = np.asarray(flow)
    tiles = f.reshape(2, 2, 32, 3, 32, 2)
    mean = np.round(tiles.mean(axis=(2, 4), keepdims=True))
    res = np.abs(tiles - mean).max(-1)
    small = (res <= 2.0).reshape(2, 2, 32, 3, 32).transpose(0, 1, 2, 3, 4)
    small = small.reshape(2, 64, 96)
    close = np.abs(got - ref).max(-1) < 1e-5
    assert close[small].mean() > 0.99, close[small].mean()
