"""On-device (interpret=False) Pallas kernel coverage.

Mosaic lowering, tiling/alignment rules, and DMA behavior are only exercised
on real hardware — interpret-mode tests (test_pallas_corr/test_pallas_warp)
cannot catch them (VERDICT r1). Run on the bench chip with:

    PIV_TPU_TESTS=1 python -m pytest tests -m tpu

Skipped automatically on CPU runs (the default conftest forces JAX_PLATFORMS
=cpu unless PIV_TPU_TESTS=1).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


requires_tpu = pytest.mark.skipif(not _on_tpu(), reason="needs a real TPU backend")


@requires_tpu
@pytest.mark.parametrize("shape", [(1, 128, 128, 64), (2, 96, 200, 96)])
def test_pallas_correlation_on_device(shape):
    from piv_liteflownet_tpu.ops.correlation import correlation_xla
    from piv_liteflownet_tpu.ops.pallas_corr import correlation_pallas

    b, h, w, c = shape
    key = jax.random.PRNGKey(0)
    f1 = jax.random.normal(key, shape, jnp.float32)
    f2 = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.float32)
    got = np.asarray(correlation_pallas(f1, f2))
    ref = np.asarray(correlation_xla(f1, f2, 1))
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=1e-5)


@requires_tpu
@pytest.mark.parametrize("shape", [(1, 64, 128, 32), (2, 100, 260, 16)])
def test_pallas_window_warp_on_device(shape):
    from piv_liteflownet_tpu.ops.pallas_window_warp import (
        backwarp_pallas_window,
        residual_ok,
    )
    from piv_liteflownet_tpu.ops.warp import backwarp

    b, h, w, c = shape
    key = jax.random.PRNGKey(2)
    img = jax.random.normal(key, shape, jnp.float32)
    base = jax.random.uniform(jax.random.fold_in(key, 1), (b, 1, 1, 2),
                              jnp.float32, -6, 6)
    flow = base + 0.8 * jax.random.normal(jax.random.fold_in(key, 2),
                                          (b, h, w, 2), jnp.float32)
    assert bool(residual_ok(flow))
    got = np.asarray(backwarp_pallas_window(img, flow))
    ref = np.asarray(backwarp(img, flow))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


@requires_tpu
def test_pallas_window_warp_guard_fallback_on_device():
    """Flow violating the residual bound must take the exact gather branch."""
    from piv_liteflownet_tpu.ops.pallas_window_warp import backwarp_auto, residual_ok
    from piv_liteflownet_tpu.ops.warp import backwarp

    key = jax.random.PRNGKey(3)
    img = jax.random.normal(key, (1, 64, 128, 16), jnp.float32)
    flow = 30.0 * jax.random.normal(jax.random.fold_in(key, 1),
                                    (1, 64, 128, 2), jnp.float32)
    assert not bool(residual_ok(flow))
    got = np.asarray(backwarp_auto(img, flow))
    ref = np.asarray(backwarp(img, flow))
    np.testing.assert_array_equal(got, ref)
