"""Shifted-GEMM conv weight-grad (ops/nn.wgrad_shift_gemm) vs XLA autodiff.

The r5 wall probe attributes 55.7 ms of the 151 ms train step to the
weight-grad convs (work/r5_wall.log); the shift formulation computes the
same contraction as k^2 MXU-friendly GEMMs. Equal up to f32 summation order.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import piv_liteflownet_tpu.ops.nn as nn


@pytest.mark.parametrize("mode", ["shift", "stride2"])
@pytest.mark.parametrize("shape", [
    # (B, H, W, cin, cout, k, stride, pad) — odd sizes + stride 2 + k7 + 1x1
    (2, 16, 20, 5, 7, 3, 1, 1),
    (2, 17, 20, 5, 7, 3, 2, 1),
    (1, 12, 12, 3, 4, 7, 1, 3),
    (2, 10, 10, 4, 6, 1, 1, 0),
])
def test_shift_wgrad_matches_autodiff(shape, mode):
    b, h, w, cin, cout, k, s, p = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((b, h, w, cin), np.float32))
    wgt = jnp.asarray(rng.random((k, k, cin, cout), np.float32) - 0.5)
    bias = jnp.asarray(rng.random((cout,), np.float32))

    def grads():
        return jax.grad(
            lambda ww, xx, bb: jnp.sum(jnp.sin(nn.conv2d(xx, ww, bb, s, p))),
            argnums=(0, 1, 2))(wgt, x, bias)

    prev = nn.set_conv_wgrad("xla")
    try:
        ref = grads()
        nn.set_conv_wgrad(mode)
        got = grads()
    finally:
        nn.set_conv_wgrad(prev)
    for a, r, name in zip(got, ref, ("gw", "gx", "gb")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-5, atol=1e-5, err_msg=name)


def test_shift_wgrad_train_step_grads_match():
    """Full v1 train-step gradient under set_conv_wgrad('shift') equals the
    autodiff baseline (f32 summation-order tolerance)."""
    from piv_liteflownet_tpu.models.factory import piv_liteflownet
    from piv_liteflownet_tpu.models.liteflownet import forward
    from piv_liteflownet_tpu.training.loss import piv_loss

    model = piv_liteflownet(version=1)
    rng = np.random.default_rng(1)
    img1 = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    img2 = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    target = jnp.asarray(rng.standard_normal((2, 64, 64, 2)).astype(np.float32))
    loss_obj = piv_loss(version=1)

    def loss_fn(params):
        out = forward(params, img1, img2, model.cfg, True, None)
        lv, _ = loss_obj(out, target)
        return lv

    prev = nn.set_conv_wgrad("xla")
    try:
        g_ref = jax.grad(loss_fn)(model.params)
        nn.set_conv_wgrad("shift")
        g_got = jax.grad(loss_fn)(model.params)
    finally:
        nn.set_conv_wgrad(prev)
    for k in g_ref:
        a, r = np.asarray(g_got[k]), np.asarray(g_ref[k])
        scale = max(np.abs(r).max(), 1e-8)
        np.testing.assert_allclose(a / scale, r / scale, atol=3e-5, err_msg=k)
