"""Pallas correlation kernel vs the XLA shift-stack (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from piv_liteflownet_tpu.ops.correlation import correlation_xla
from piv_liteflownet_tpu.ops.pallas_corr import correlation_pallas


@pytest.mark.parametrize("shape", [(2, 32, 48, 8), (2, 24, 40, 3), (1, 16, 16, 16)])
def test_matches_xla_shift_stack(shape):
    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    ref = correlation_xla(f1, f2, 1)
    got = correlation_pallas(f1, f2, tile_h=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_stride2_composition():
    """Caller-side phase subsampling composes to the stride-2 cost volume."""
    rng = np.random.default_rng(1)
    f1 = jnp.asarray(rng.standard_normal((1, 32, 32, 4)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((1, 32, 32, 4)).astype(np.float32))
    ref = correlation_xla(f1, f2, 2)
    got = correlation_pallas(f1[:, ::2, ::2], f2[:, ::2, ::2], tile_h=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("shape", [(2, 32, 48, 8), (2, 24, 40, 3), (1, 16, 256, 16)])
def test_planar_matches_xla_shift_stack(shape):
    from piv_liteflownet_tpu.ops.pallas_corr import correlation_planar_pallas

    rng = np.random.default_rng(2)
    f1 = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    ref = correlation_xla(f1, f2, 1)
    got = correlation_planar_pallas(f1, f2, tile_h=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
