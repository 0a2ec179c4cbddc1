"""lastconv_impl="shift" (the 1x1+shift-sum flow-delta head,
ModelConfig.lastconv_impl) must match the direct conv head through the FULL
model to f32 summation-order tolerance, in eval and train mode."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from piv_liteflownet_tpu.models.factory import piv_liteflownet
from piv_liteflownet_tpu.models.liteflownet import forward


def _imgs(seed, shape=(2, 64, 96, 3)):
    key = jax.random.PRNGKey(seed)
    a = jax.random.uniform(key, shape, jnp.float32)
    b = jax.random.uniform(jax.random.fold_in(key, 1), shape, jnp.float32)
    return a, b


def test_lastconv_shift_matches_direct_v1_and_v2():
    for version in (1, 2):
        m = piv_liteflownet(version=version)
        a, b = _imgs(version)
        sh = forward(m.params, a, b,
                     dataclasses.replace(m.cfg, lastconv_impl="shift"))
        di = forward(m.params, a, b,
                     dataclasses.replace(m.cfg, lastconv_impl="direct"))
        np.testing.assert_allclose(np.asarray(sh), np.asarray(di),
                                   rtol=2e-4, atol=2e-4)


def test_lastconv_pad_matches_direct_v1_and_v2():
    """"pad" (cout 2->32 zero-pad + slice) is exact up to conv scheduling."""
    for version in (1, 2):
        m = piv_liteflownet(version=version)
        a, b = _imgs(10 + version)
        pa = forward(m.params, a, b,
                     dataclasses.replace(m.cfg, lastconv_impl="pad"))
        di = forward(m.params, a, b,
                     dataclasses.replace(m.cfg, lastconv_impl="direct"))
        np.testing.assert_allclose(np.asarray(pa), np.asarray(di),
                                   rtol=2e-4, atol=2e-4)


def test_lastconv_shift_matches_direct_train_mode():
    m = piv_liteflownet(version=1)
    a, b = _imgs(3)
    sh = forward(m.params, a, b,
                 dataclasses.replace(m.cfg, lastconv_impl="shift"), train=True)
    di = forward(m.params, a, b,
                 dataclasses.replace(m.cfg, lastconv_impl="direct"), train=True)
    for lo, lf in zip(sh, di):
        for xo, xf in zip(lo, lf):
            np.testing.assert_allclose(np.asarray(xo), np.asarray(xf),
                                       rtol=2e-4, atol=2e-4)


def test_lastconv_shift_grads_close():
    """The reformulated head must be differentiable and match the direct
    head's gradients (training uses whatever lastconv_impl selects)."""
    m = piv_liteflownet(version=1)
    a, b = _imgs(5, (1, 64, 64, 3))

    def loss(params, impl):
        outs = forward(params, a, b,
                       dataclasses.replace(m.cfg, lastconv_impl=impl),
                       train=True)
        return sum(jnp.sum(x ** 2) for lvl in outs for x in lvl)

    gs = jax.grad(lambda p: loss(p, "shift"))(m.params)
    gd = jax.grad(lambda p: loss(p, "direct"))(m.params)
    for k in gd:
        np.testing.assert_allclose(np.asarray(gs[k]), np.asarray(gd[k]),
                                   rtol=5e-3, atol=5e-3, err_msg=k)
