"""On-device (interpret=False) Pallas kernel coverage.

Mosaic lowering, tiling/alignment rules, and DMA behavior are only exercised
on real hardware — interpret-mode tests (test_pallas_corr etc.) cannot catch
them (VERDICT r1). Run on the bench chip with:

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
@pytest.mark.parametrize("shape,dtype", [
    ((1, 128, 128, 64), jnp.float32),
    ((2, 96, 200, 96), jnp.float32),
    ((2, 128, 512, 64), jnp.bfloat16),
])
def test_planar_correlation_on_device(shape, dtype):
    from piv_liteflownet_tpu.ops.correlation import correlation_xla
    from piv_liteflownet_tpu.ops.pallas_corr import correlation_planar_pallas

    key = jax.random.PRNGKey(0)
    f1 = jax.random.normal(key, shape, jnp.float32).astype(dtype)
    f2 = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.float32).astype(dtype)
    got = np.asarray(correlation_planar_pallas(f1, f2).astype(jnp.float32))
    ref = np.asarray(correlation_xla(f1, f2, 1).astype(jnp.float32))
    tol = 2e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(got, ref, atol=tol, rtol=tol)


@requires_tpu
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_planar_feat_warp_on_device(dtype):
    from piv_liteflownet_tpu.ops.pallas_feat_warp import (
        feat_warp_bounds_ok,
        feat_warp_pallas,
    )
    from piv_liteflownet_tpu.ops.warp import backwarp

    b, h, w, c = 2, 96, 384, 64
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (b, h, w, c), jnp.float32).astype(dtype)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    u = 33.0 + 1.2 * jnp.sin(xx / 60.0) + 0.4 * jnp.cos(yy / 35.0)
    v = -9.0 + 0.8 * jnp.cos(xx / 50.0) + 0.5 * jnp.sin(yy / 25.0)
    flow = jnp.broadcast_to(jnp.stack([u + 0 * yy, v + 0 * xx], -1), (b, h, w, 2))
    assert bool(feat_warp_bounds_ok(flow))
    got = np.asarray(feat_warp_pallas(img, flow).astype(jnp.float32))
    ref = np.asarray(backwarp(img.astype(dtype), flow).astype(jnp.float32))
    # f32: the tent recomputes the bilinear weights from the f32 residual
    # rv = v - round(tile_mean(v)), so each weight carries ~|flow|*eps of
    # rounding the gather's (1-wx)(1-wy) form doesn't (|u|~33 here) —
    # device-measured worst deviation 1.6e-5 abs / 9e-4 rel
    # (work/pytest_tpu_r4r.log); this is summation-order noise, not a tap
    # error (those would be O(pixel value) = O(1)).
    tol = 5e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(got, ref, atol=tol)


@requires_tpu
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_warp_vjp_tent_transpose_on_device(dtype):
    """Tent-transpose warp img-grad (ops/pallas_warp_vjp.py) vs the XLA
    scatter on real Mosaic lowering (r5; the DMA-alignment and dynamic-rotate
    rules only surface on device).

    The flow is cast to ``dtype`` like the model's (a bf16 train step's flow
    IS bf16 at the warp; ``backwarp_tvjp`` routes mixed dtypes to the
    scatter). In bf16 the two programs round differently — the scatter
    multiplies bf16-cast tap weights while the kernel keeps its weights in
    f32 (strictly more accurate) — so bf16 additionally checks both against
    the f32 ground truth: the kernel must be no LESS accurate than the
    scatter it replaces."""
    from piv_liteflownet_tpu.ops.pallas_warp_vjp import (
        warp_img_grad_bounds_ok,
        warp_img_grad_pallas,
    )
    from piv_liteflownet_tpu.ops.warp import backwarp

    b, h, w, c = 2, 96, 384, 32
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (b, h, w, c), jnp.float32).astype(dtype)
    gout = jax.random.uniform(jax.random.fold_in(key, 1), (b, h, w, c),
                              jnp.float32).astype(dtype)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    u = 3.0 + 1.2 * jnp.sin(xx / 60.0) + 0.4 * jnp.cos(yy / 35.0)
    v = -2.0 + 0.8 * jnp.cos(xx / 50.0) + 0.5 * jnp.sin(yy / 25.0)
    flow = jnp.broadcast_to(jnp.stack([u + 0 * yy, v + 0 * xx], -1),
                            (b, h, w, 2)).astype(dtype)
    assert bool(warp_img_grad_bounds_ok(flow))

    def pull(a, f):
        _, vjp = jax.vjp(lambda x: backwarp(x, f), a)
        (g,) = vjp(gout.astype(a.dtype))
        return g

    ref = np.asarray(pull(img, flow).astype(jnp.float32))
    got = np.asarray(warp_img_grad_pallas(gout, flow).astype(jnp.float32))
    if dtype == jnp.float32:
        np.testing.assert_allclose(got, ref, atol=5e-5)
    else:
        truth = np.asarray(pull(img.astype(jnp.float32),
                                flow.astype(jnp.float32)))
        err_kernel = np.abs(got - truth).max()
        err_scatter = np.abs(ref - truth).max()
        assert err_kernel <= err_scatter * 1.05 + 1e-6, (
            f"kernel err {err_kernel} > scatter err {err_scatter}")
        np.testing.assert_allclose(got, ref, atol=6e-2)


@requires_tpu
def test_backwarp_tvjp_full_grads_on_device():
    """The guarded custom VJP end to end on device: img+flow grads equal
    autodiff on a tent-eligible flow AND on a steep flow (scatter fallback)."""
    from piv_liteflownet_tpu.ops.pallas_warp_vjp import (
        backwarp_tvjp,
        warp_img_grad_bounds_ok,
    )
    from piv_liteflownet_tpu.ops.warp import backwarp

    b, h, w, c = 1, 64, 256, 16
    key = jax.random.PRNGKey(2)
    img = jax.random.uniform(key, (b, h, w, c), jnp.float32)
    tgt = jax.random.uniform(jax.random.fold_in(key, 1), (b, h, w, c), jnp.float32)
    smooth = jnp.broadcast_to(
        jnp.asarray([1.5, -0.8], jnp.float32), (b, h, w, 2))
    rough = (jax.random.uniform(jax.random.fold_in(key, 2), (b, h, w, 2),
                                jnp.float32) - 0.5) * 30
    for flow, expect in ((smooth, True), (rough, False)):
        assert bool(warp_img_grad_bounds_ok(flow)) == expect
        gi_t, gf_t = jax.grad(
            lambda a, f: jnp.sum((backwarp_tvjp(a, f) - tgt) ** 2),
            argnums=(0, 1))(img, flow)
        gi_r, gf_r = jax.grad(
            lambda a, f: jnp.sum((backwarp(a, f) - tgt) ** 2),
            argnums=(0, 1))(img, flow)
        np.testing.assert_allclose(np.asarray(gi_t), np.asarray(gi_r),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gf_t), np.asarray(gf_r),
                                   atol=1e-3, rtol=1e-3)
