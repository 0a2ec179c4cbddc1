"""Tent-transpose warp VJP (ops/pallas_warp_vjp.py) vs XLA autodiff.

The image gradient of ``backwarp`` is a scatter-add under autodiff; the
kernel reformulates the adjoint as a bounded tent gather over gout. Exact
whenever ``warp_img_grad_bounds_ok`` holds; ``backwarp_tvjp`` cond-falls
back to the scatter, so the custom VJP equals autodiff on EVERY input."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piv_liteflownet_tpu.ops.pallas_warp_vjp import (
    make_backwarp_tvjp,
    warp_img_grad_bounds_ok,
    warp_img_grad_pallas,
)
from piv_liteflownet_tpu.ops.warp import backwarp


def _smooth_flow(h, w, u0, v0, amp=1.0, batch=1):
    yy, xx = np.mgrid[0:h, 0:w]
    u = u0 + amp * np.sin(xx / 60.0) + 0.4 * np.cos(yy / 35.0)
    v = v0 + amp * np.cos(xx / 50.0) + 0.5 * np.sin(yy / 25.0)
    f = np.stack([u, v], -1).astype(np.float32)[None]
    return jnp.asarray(np.concatenate([f] * batch, axis=0))


def _autodiff_img_grad(img, flow, gout):
    _, pull = jax.vjp(lambda a: backwarp(a, flow), img)
    (gimg,) = pull(gout)
    return np.asarray(gimg)


@pytest.mark.parametrize("u0,v0", [(0.3, -0.7), (3.2, 2.1), (-2.5, -3.0)])
def test_tent_transpose_matches_scatter(u0, v0):
    rng = np.random.default_rng(0)
    b, h, w, c = 2, 48, 256, 8
    img = jnp.asarray(rng.random((b, h, w, c), dtype=np.float32))
    gout = jnp.asarray(rng.random((b, h, w, c), dtype=np.float32))
    flow = _smooth_flow(h, w, u0, v0, batch=b)
    assert bool(warp_img_grad_bounds_ok(flow))
    ref = _autodiff_img_grad(img, flow, gout)
    got = np.asarray(warp_img_grad_pallas(gout, flow, interpret=True))
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)


def test_edge_contributions_match():
    """Flow pushing sample points off the frame: targets whose footprint
    leaves the image contribute nothing there; interior sources near the
    edge still accumulate — exactly like the scatter."""
    rng = np.random.default_rng(1)
    b, h, w, c = 1, 32, 128, 4
    img = jnp.asarray(rng.random((b, h, w, c), dtype=np.float32))
    gout = jnp.asarray(rng.random((b, h, w, c), dtype=np.float32))
    flow = jnp.full((b, h, w, 2), jnp.float32(-3.4)).at[..., 1].set(2.6)
    assert bool(warp_img_grad_bounds_ok(flow))
    ref = _autodiff_img_grad(img, flow, gout)
    got = np.asarray(warp_img_grad_pallas(gout, flow, interpret=True))
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)


def test_bounds_reject_rough_and_large_flow():
    rng = np.random.default_rng(2)
    rough = jnp.asarray((rng.random((1, 32, 128, 2), np.float32) - 0.5) * 30)
    assert not bool(warp_img_grad_bounds_ok(rough))
    large = jnp.full((1, 32, 128, 2), 14.0, jnp.float32)  # > vlim + ry
    assert not bool(warp_img_grad_bounds_ok(large))
    ok = _smooth_flow(32, 128, 1.0, -1.0)
    assert bool(warp_img_grad_bounds_ok(ok))


def test_base_spread_guard():
    """Per-tile residual alone is small but neighboring tile bases differ by
    more than the tent covers -> the guard must reject (cross-tile taps
    would use the wrong base)."""
    h, w = 64, 128
    yy = np.mgrid[0:h, 0:w][0]
    # v jumps by 9 px between 16-row tile bands: residual-per-tile ~0,
    # base spread 9 > ry=4
    v = 9.0 * (yy // 16).astype(np.float32)
    v -= v.mean()
    flow = jnp.asarray(np.stack([np.zeros_like(v), v], -1))[None]
    assert not bool(warp_img_grad_bounds_ok(flow))


@pytest.mark.parametrize("steep", [False, True])
def test_custom_vjp_equals_autodiff(steep):
    """backwarp_tvjp's full VJP (img + flow grads) must equal autodiff both
    on the tent tier and through the scatter fallback."""
    rng = np.random.default_rng(3)
    b, h, w, c = 1, 32, 128, 4
    img = jnp.asarray(rng.random((b, h, w, c), dtype=np.float32))
    if steep:
        flow = jnp.asarray((rng.random((b, h, w, 2), np.float32) - 0.5) * 30)
        assert not bool(warp_img_grad_bounds_ok(flow))
    else:
        flow = _smooth_flow(h, w, 1.2, -0.8)
        assert bool(warp_img_grad_bounds_ok(flow))
    tgt = jnp.asarray(rng.random((b, h, w, c), dtype=np.float32))

    bw = make_backwarp_tvjp(interpret=True)

    def loss_t(a, f):
        return jnp.sum((bw(a, f) - tgt) ** 2)

    def loss_r(a, f):
        return jnp.sum((backwarp(a, f) - tgt) ** 2)

    gi_t, gf_t = jax.grad(loss_t, argnums=(0, 1))(img, flow)
    gi_r, gf_r = jax.grad(loss_r, argnums=(0, 1))(img, flow)
    np.testing.assert_allclose(np.asarray(gf_t), np.asarray(gf_r),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gi_t), np.asarray(gi_r),
                               atol=1e-4, rtol=1e-4)


def test_train_step_with_tent_vjp_matches_gather():
    """One full train-step gradient with cfg.warp_vjp='tent' (interpret-less
    CPU path: the wrapper falls back to the scatter on CPU backends, so this
    checks the plumbing is loss-neutral and grad-identical end to end)."""
    import dataclasses

    from piv_liteflownet_tpu.models.factory import piv_liteflownet
    from piv_liteflownet_tpu.models.liteflownet import forward
    from piv_liteflownet_tpu.training.loss import piv_loss

    model = piv_liteflownet(version=1)
    rng = np.random.default_rng(4)
    img1 = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    img2 = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    target = jnp.asarray(rng.standard_normal((2, 64, 64, 2)).astype(np.float32))
    loss_obj = piv_loss(version=1)

    def loss_fn(params, cfg):
        out = forward(params, img1, img2, cfg, True, None)
        lv, _ = loss_obj(out, target)
        return lv

    cfg_t = dataclasses.replace(model.cfg, warp_vjp="tent")
    g_ref = jax.grad(loss_fn)(model.params, model.cfg)
    g_tent = jax.grad(loss_fn)(model.params, cfg_t)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_tent[k]), np.asarray(g_ref[k]),
                                   atol=1e-6, err_msg=k)
