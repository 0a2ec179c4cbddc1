"""Planar tent feature-warp kernel vs the packed gather (interpret mode).

The kernel is exact (same grid_sample bilinear/zeros/align_corners=True
semantics as ops/warp.py) whenever the per-tile residual bounds hold;
``feat_warp`` checks them on device and falls back to the gather otherwise.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from piv_liteflownet_tpu.ops.pallas_feat_warp import (
    feat_warp_bounds_ok,
    feat_warp_pallas,
)
from piv_liteflownet_tpu.ops.warp import backwarp


def _smooth_flow(h, w, u0, v0, amp=1.0):
    yy, xx = np.mgrid[0:h, 0:w]
    u = u0 + amp * np.sin(xx / 60.0) + 0.4 * np.cos(yy / 35.0)
    v = v0 + amp * np.cos(xx / 50.0) + 0.5 * np.sin(yy / 25.0)
    return jnp.asarray(np.stack([u, v], -1).astype(np.float32))[None]


@pytest.mark.parametrize("u0,v0", [(0.3, -0.7), (5.3, -2.1), (90.0, 3.0),
                                   (0.2, -43.6), (-17.0, 11.2)])
def test_tent_matches_gather(u0, v0):
    rng = np.random.default_rng(0)
    h, w, c = 48, 256, 8
    img = jnp.asarray(rng.random((2, h, w, c), dtype=np.float32))
    flow = jnp.concatenate([_smooth_flow(h, w, u0, v0)] * 2, axis=0)
    assert bool(feat_warp_bounds_ok(flow))
    ref = np.asarray(backwarp(img, flow))
    got = np.asarray(feat_warp_pallas(img, flow, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_bounds_reject_rough_flow():
    rng = np.random.default_rng(1)
    flow = jnp.asarray((rng.random((1, 32, 128, 2), dtype=np.float32) - 0.5) * 30)
    assert not bool(feat_warp_bounds_ok(flow))


def test_guarded_feat_warp_falls_back_on_rough_flow():
    """feat_warp's on-device cond must route bound-violating flows to the
    exact gather (both branches trace; interpret mode runs them on CPU)."""
    from piv_liteflownet_tpu.ops.pallas_feat_warp import feat_warp

    rng = np.random.default_rng(3)
    h, w, c = 32, 128, 4
    img = jnp.asarray(rng.random((1, h, w, c), dtype=np.float32))
    flow = jnp.asarray((rng.random((1, h, w, 2), dtype=np.float32) - 0.5) * 30)
    assert not bool(feat_warp_bounds_ok(flow))
    ref = np.asarray(backwarp(img, flow))
    got = np.asarray(feat_warp(img, flow, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_tiered_feat_warp_exact_across_tiers():
    """Every tier of the guarded entry (narrow tent, wide tent, gather) must
    agree with the exact gather on flows routed to it."""
    from piv_liteflownet_tpu.ops.pallas_feat_warp import feat_warp

    rng = np.random.default_rng(5)
    h, w, c = 32, 128, 4
    img = jnp.asarray(rng.random((1, h, w, c), dtype=np.float32))
    xs = np.arange(w, dtype=np.float32)[None, None, :] * np.ones((1, h, 1), np.float32)
    cases = {
        # smooth small flow -> tier 1 (residual < 4)
        "tier1": np.stack([2.0 * np.sin(2 * np.pi * xs / w),
                           1.5 * np.cos(2 * np.pi * xs / w)], axis=-1),
        # steep high-frequency flow -> tier 2 (residual ~8 > 4, <= 11)
        "tier2": np.stack([8.0 * np.sin(2 * np.pi * 5 * xs / w),
                           7.0 * np.cos(2 * np.pi * 7 * xs / w)], axis=-1),
    }
    from piv_liteflownet_tpu.ops.pallas_feat_warp import feat_warp_bounds_ok

    assert bool(feat_warp_bounds_ok(jnp.asarray(cases["tier1"]), 4, 4))
    assert not bool(feat_warp_bounds_ok(jnp.asarray(cases["tier2"]), 4, 4))
    assert bool(feat_warp_bounds_ok(jnp.asarray(cases["tier2"]), 11, 11))
    for name, f in cases.items():
        flow = jnp.asarray(f.astype(np.float32))
        ref = np.asarray(backwarp(img, flow))
        got = np.asarray(feat_warp(img, flow, interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-5, err_msg=name)


def test_tent_zero_padding_semantics():
    """Samples beyond the image blend with zeros exactly like grid_sample."""
    rng = np.random.default_rng(2)
    h, w, c = 32, 128, 4
    img = jnp.asarray(rng.random((1, h, w, c), dtype=np.float32))
    flow = jnp.full((1, h, w, 2), jnp.float32(-6.6)).at[..., 1].set(-7.7)
    ref = np.asarray(backwarp(img, flow))
    got = np.asarray(feat_warp_pallas(img, flow, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_unguarded_config_accepted_and_train_forces_gather():
    """warp_impl="tent!" (unguarded kernel, no switch) must be accepted by
    the forward config plumbing; on CPU the Pallas gate routes it to the
    gather, so eval output matches the default exactly, and the train path
    must force the (differentiable) gather regardless."""
    import dataclasses

    import jax

    from piv_liteflownet_tpu.models.factory import piv_liteflownet
    from piv_liteflownet_tpu.models.liteflownet import forward

    model = piv_liteflownet(version=1)
    rng = np.random.default_rng(11)
    img1 = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))
    img2 = jnp.asarray(rng.random((1, 64, 64, 3), dtype=np.float32))

    base = forward(model.params, img1, img2, model.cfg, train=False)
    cfg = dataclasses.replace(model.cfg, warp_impl="tent!")
    got = forward(model.params, img1, img2, cfg, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=0)

    outs = forward(model.params, img1, img2, cfg, train=True)
    ref = forward(model.params, img1, img2, model.cfg, train=True)
    for a, b in zip(jax.tree.leaves(outs), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
