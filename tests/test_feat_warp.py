"""Value-accumulated feature tent warp vs the exact gather warp."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piv_liteflownet_tpu.ops.pallas_feat_warp import (
    feat_residual_ok,
    feat_warp_pallas,
)
from piv_liteflownet_tpu.ops.warp import backwarp


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


requires_tpu = pytest.mark.skipif(not _on_tpu(), reason="needs a real TPU backend")


def _case(seed, shape=(2, 64, 96, 8), base_mag=6.0, var_mag=0.25):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.random(shape, dtype=np.float32))
    b = rng.uniform(-base_mag, base_mag, (shape[0], 1, 1, 2)).astype(np.float32)
    v = rng.standard_normal((*shape[:3], 2)).astype(np.float32) * var_mag
    return img, jnp.asarray(b + v)


def test_matches_gather_smooth_flow():
    img, flow = _case(0)
    assert bool(feat_residual_ok(flow, r=2))
    got = feat_warp_pallas(img, flow, r=2, interpret=True)
    ref = backwarp(img, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_identity_and_oob_zeros():
    img, _ = _case(1)
    out = feat_warp_pallas(img, jnp.zeros((*img.shape[:3], 2)), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)
    # constant flow far outside the frame: base clips at lim, residual fails
    # the guard — but with base within lim the taps read the zero pad
    big = jnp.full((*img.shape[:3], 2), 20.0)
    out2 = feat_warp_pallas(img, big, lim=24, interpret=True)
    ref2 = backwarp(img, big)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=1e-6)


def test_non_divisible_shapes():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((1, 50, 70, 12), dtype=np.float32))
    flow = jnp.asarray(rng.standard_normal((1, 50, 70, 2)).astype(np.float32) * 0.8)
    got = feat_warp_pallas(img, flow, r=4, interpret=True)
    ref = backwarp(img, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_guard_rejects_rough_flow():
    img, flow = _case(3, var_mag=2.0)
    assert not bool(feat_residual_ok(flow, r=2))


@pytest.mark.tpu
@requires_tpu
def test_ondevice_matches_gather():
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.random((2, 128, 256, 64), dtype=np.float32)).astype(jnp.bfloat16)
    base = rng.uniform(-4, 4, (2, 1, 1, 2)).astype(np.float32)
    flow = jnp.asarray(base + rng.standard_normal((2, 128, 256, 2)).astype(np.float32) * 0.5)
    got = feat_warp_pallas(img, flow)
    ref = backwarp(img, flow)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )
