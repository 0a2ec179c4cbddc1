"""netc_head="parity" (the space-to-depth NetC L1→L2 head,
ModelConfig.netc_head) must match the direct conv1+conv2.0 composite to f32
summation-order tolerance — as an op, through the full v2 model, and in
train mode with gradients."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piv_liteflownet_tpu.models.factory import piv_liteflownet
from piv_liteflownet_tpu.models.liteflownet import forward
from piv_liteflownet_tpu.ops.nn import conv2d, leaky_relu, netc_head_parity


def _head_direct(x, w1, b1, w2, b2):
    l1 = leaky_relu(conv2d(x, w1, b1, 1, 3))
    return leaky_relu(conv2d(l1, w2, b2, 2, 1))


@pytest.mark.parametrize("h,w", [(64, 96), (32, 32), (64, 130)])
def test_netc_head_parity_op(h, w):
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, h, w, 3), jnp.float32)
    w1 = jax.random.normal(jax.random.fold_in(key, 1), (7, 7, 3, 32)) * 0.1
    b1 = jax.random.normal(jax.random.fold_in(key, 2), (32,)) * 0.1
    w2 = jax.random.normal(jax.random.fold_in(key, 3), (3, 3, 32, 32)) * 0.1
    b2 = jax.random.normal(jax.random.fold_in(key, 4), (32,)) * 0.1
    ref = _head_direct(x, w1, b1, w2, b2)
    got = netc_head_parity(x, w1, b1, w2, b2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_netc_head_parity_in_model_v2():
    m = piv_liteflownet(version=2)
    key = jax.random.PRNGKey(7)
    a = jax.random.uniform(key, (2, 64, 96, 3), jnp.float32)
    b = jax.random.uniform(jax.random.fold_in(key, 1), (2, 64, 96, 3),
                           jnp.float32)
    pa = forward(m.params, a, b,
                 dataclasses.replace(m.cfg, netc_head="parity"))
    di = forward(m.params, a, b,
                 dataclasses.replace(m.cfg, netc_head="direct"))
    np.testing.assert_allclose(np.asarray(pa), np.asarray(di),
                               rtol=2e-4, atol=2e-4)


def test_netc_head_parity_ignored_when_invalid():
    """v1 (lowest_level=1 consumes L1 features) must silently use the direct
    head even when parity is requested."""
    m = piv_liteflownet(version=1)
    key = jax.random.PRNGKey(9)
    a = jax.random.uniform(key, (1, 32, 32, 3), jnp.float32)
    b = jax.random.uniform(jax.random.fold_in(key, 1), (1, 32, 32, 3),
                           jnp.float32)
    pa = forward(m.params, a, b, dataclasses.replace(m.cfg, netc_head="parity"))
    di = forward(m.params, a, b, m.cfg)
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(di))


def test_netc_head_parity_grads():
    m = piv_liteflownet(version=2)
    key = jax.random.PRNGKey(11)
    a = jax.random.uniform(key, (1, 64, 64, 3), jnp.float32)
    b = jax.random.uniform(jax.random.fold_in(key, 1), (1, 64, 64, 3),
                           jnp.float32)

    def loss(params, head):
        outs = forward(params, a, b,
                       dataclasses.replace(m.cfg, netc_head=head), train=True)
        return sum(jnp.sum(x ** 2) for lvl in outs for x in lvl)

    gp = jax.grad(lambda p: loss(p, "parity"))(m.params)
    gd = jax.grad(lambda p: loss(p, "direct"))(m.params)
    for k in gd:
        np.testing.assert_allclose(np.asarray(gp[k]), np.asarray(gd[k]),
                                   rtol=5e-3, atol=5e-3, err_msg=k)
