"""netc_joint must be numerically EXACT: running NetC (and the per-level ext
convs) over the batch-concat of (img1, img2) touches only the batch dim, and
conv/LeakyReLU are batch-row-independent, so joint and separate evaluation
are the same program on permuted rows."""

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


def test_netc_joint_exact_v1_and_v2():
    for version in (1, 2):
        m = piv_liteflownet(version=version)
        a, b = _imgs(version)
        on = forward(m.params, a, b, dataclasses.replace(m.cfg, netc_joint="on"))
        off = forward(m.params, a, b, dataclasses.replace(m.cfg, netc_joint="off"))
        np.testing.assert_array_equal(np.asarray(on), np.asarray(off))


def test_netc_joint_exact_train_mode():
    m = piv_liteflownet(version=1)
    a, b = _imgs(3)
    on = forward(m.params, a, b, dataclasses.replace(m.cfg, netc_joint="on"), train=True)
    off = forward(m.params, a, b, dataclasses.replace(m.cfg, netc_joint="off"), train=True)
    for lo, lf in zip(on, off):
        for xo, xf in zip(lo, lf):
            np.testing.assert_array_equal(np.asarray(xo), np.asarray(xf))
