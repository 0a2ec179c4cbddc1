"""Fused planar rgb warp+norm kernel vs the exact gather formulation.

CPU tests run the kernel in interpret mode; the `-m tpu` test (hardware,
PIV_TPU_TESTS=1) checks the compiled Mosaic lowering bit-for-bit behavior.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piv_liteflownet_tpu.ops.pallas_rgb_warp import (
    rgb_norm_bounds_ok,
    rgb_warp_norm,
    rgb_warp_norm_gather,
    rgb_warp_norm_pallas,
)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


requires_tpu = pytest.mark.skipif(not _on_tpu(), reason="needs a real TPU backend")


def _case(seed, shape=(2, 64, 128), base_mag=4.0, var_mag=0.3):
    rng = np.random.default_rng(seed)
    b, h, w = shape
    img1 = jnp.asarray(rng.random((b, h, w, 3), dtype=np.float32))
    img2 = jnp.asarray(rng.random((b, h, w, 3), dtype=np.float32))
    base = rng.uniform(-base_mag, base_mag, (b, 1, 1, 2)).astype(np.float32)
    var = rng.standard_normal((b, h, w, 2)).astype(np.float32) * var_mag
    return img1, img2, jnp.asarray(base + var)


def test_matches_gather_smooth_flow():
    img1, img2, flow = _case(0)
    assert bool(rgb_norm_bounds_ok(flow, r=2, lim=8))
    got = rgb_warp_norm_pallas(img1, img2, flow, r=2, lim=8, interpret=True)
    ref = rgb_warp_norm_gather(img1, img2, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_zero_flow_is_abs_diff():
    img1, img2, _ = _case(1)
    zero = jnp.zeros((*img1.shape[:3], 2))
    got = rgb_warp_norm_pallas(img1, img2, zero, interpret=True)
    ref = jnp.sqrt(jnp.sum(jnp.square(img1 - img2), axis=-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_oob_taps_read_zeros():
    """Flow pushing samples outside the frame: grid_sample 'zeros' semantics
    (the norm then equals |img1|)."""
    rng = np.random.default_rng(2)
    img1 = jnp.asarray(rng.random((1, 32, 128, 3), dtype=np.float32))
    img2 = jnp.asarray(rng.random((1, 32, 128, 3), dtype=np.float32))
    # constant v=+7: the bottom rows sample below the frame
    flow = jnp.concatenate(
        [jnp.zeros((1, 32, 128, 1)), jnp.full((1, 32, 128, 1), 7.0)], axis=-1
    )
    got = rgb_warp_norm_pallas(img1, img2, flow, r=2, lim=8, interpret=True)
    ref = rgb_warp_norm_gather(img1, img2, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_non_multiple_width_and_height():
    img1, img2, flow = _case(3, shape=(1, 50, 96))
    got = rgb_warp_norm_pallas(img1, img2, flow, interpret=True)
    ref = rgb_warp_norm_gather(img1, img2, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_guard_rejects_large_u():
    _, _, flow = _case(4)
    flow = flow.at[..., 0].add(20.0)  # |u| > lim
    assert not bool(rgb_norm_bounds_ok(flow, r=2, lim=8))


def test_wide_tier_matches_gather():
    """A wide tent (r=11, lim=13) stays exact on steep flows that blow the
    shipped tier's bounds — |u| to 12, high-frequency v (the trained-model
    regime measured in work/guard_resid.log). The wide tier was removed from
    RGB_NORM_TIERS (Mosaic scoped-VMEM stack OOM at small levels; steep flows
    use the gather), but the kernel's exactness at wide params is still the
    invariant this guards."""
    rng = np.random.default_rng(9)
    b, h, w = 2, 64, 256
    img1 = jnp.asarray(rng.random((b, h, w, 3), dtype=np.float32))
    img2 = jnp.asarray(rng.random((b, h, w, 3), dtype=np.float32))
    xs = np.arange(w, dtype=np.float32)
    u = 11.0 * np.sin(2 * np.pi * 6 * xs / w)[None, None, :] * np.ones((b, h, 1), np.float32)
    v = 7.0 * np.cos(2 * np.pi * 8 * xs / w)[None, None, :] * np.ones((b, h, 1), np.float32)
    flow = jnp.asarray(np.stack([u, v], axis=-1))
    assert not bool(rgb_norm_bounds_ok(flow, r=4, lim=8))    # tier 1 rejects
    assert bool(rgb_norm_bounds_ok(flow, r=11, lim=13))      # tier 2 accepts
    got = rgb_warp_norm_pallas(img1, img2, flow, r=11, lim=13, interpret=True)
    ref = rgb_warp_norm_gather(img1, img2, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_tiered_entry_exact_across_tiers():
    """rgb_warp_norm picks a tent tier (or the gather) per call; every branch
    must agree with the exact gather. Interpret mode exercises the switch on
    CPU."""
    rng = np.random.default_rng(10)
    b, h, w = 1, 64, 128
    img1 = jnp.asarray(rng.random((b, h, w, 3), dtype=np.float32))
    img2 = jnp.asarray(rng.random((b, h, w, 3), dtype=np.float32))
    xs = np.arange(w, dtype=np.float32)[None, None, :] * np.ones((b, h, 1), np.float32)
    cases = {
        "tier1": np.stack([3.0 * np.sin(2 * np.pi * xs / w),
                           2.0 * np.cos(2 * np.pi * xs / w)], axis=-1),
        "tier2": np.stack([12.0 * np.sin(2 * np.pi * 4 * xs / w),
                           8.0 * np.cos(2 * np.pi * 6 * xs / w)], axis=-1),
        "gather": np.stack([30.0 + 0 * xs, 0 * xs], axis=-1),
    }
    for name, f in cases.items():
        flow = jnp.asarray(f.astype(np.float32))
        got = rgb_warp_norm(img1, img2, flow, interpret=True)
        ref = rgb_warp_norm_gather(img1, img2, flow)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, err_msg=name)


@pytest.mark.tpu
@requires_tpu
def test_guarded_entry_falls_back():
    """Out-of-bound flow routes through the exact gather branch on device
    (lax.cond traces both branches, so this needs real Mosaic lowering)."""
    img1, img2, flow = _case(5, base_mag=30.0)  # way past lim: gather path
    ref = rgb_warp_norm_gather(img1, img2, flow)
    got = rgb_warp_norm(img1, img2, flow)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.tpu
@requires_tpu
def test_ondevice_matches_gather():
    img1, img2, flow = _case(6, shape=(2, 128, 256))
    img1 = img1.astype(jnp.bfloat16)
    img2 = img2.astype(jnp.bfloat16)
    got = rgb_warp_norm_pallas(img1, img2, flow)
    ref = rgb_warp_norm_gather(img1, img2, flow)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


@pytest.mark.tpu
@requires_tpu
def test_grad_through_nograd_wrapper():
    """Differentiating a loss whose forward uses the kernel must not crash
    (pallas_call has no JVP rule; the _nograd wrappers declare zero tangent —
    the model stop-gradients the norm anyway). Regression: r3 training run
    crashed with NotImplementedError at _pallas_call_jvp_rule."""
    from piv_liteflownet_tpu.ops.pallas_rgb_warp import rgb_warp_norm_nograd

    img1, img2, flow = _case(7)

    def loss(f):
        return jnp.sum(rgb_warp_norm_nograd(img1, img2, f) * jnp.abs(f).sum())

    val, g = jax.value_and_grad(loss)(flow)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(g)))
    # the norm factor contributes no gradient; only |f| does
    norm = rgb_warp_norm_nograd(img1, img2, flow)
    sign = jnp.sign(flow)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(jnp.sum(norm) * sign), rtol=1e-4
    )
