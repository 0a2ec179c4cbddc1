"""Post-processing parity vs the reference (scipy-based) implementation."""

import sys

import numpy as np

import jax.numpy as jnp


def _ref_postpro():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import src.postpro as ref

    return ref


def test_calc_vorticity_matches_reference():
    from piv_liteflownet_tpu.postpro import calc_vorticity

    ref = _ref_postpro()
    flow = np.random.default_rng(0).standard_normal((24, 30, 2)).astype(np.float32)
    want_vort, want_shear, want_normal = ref.calc_vorticity(flow, calib=2.0)
    got_vort, got_shear, got_normal = calc_vorticity(jnp.asarray(flow), calib=2.0)
    np.testing.assert_allclose(np.asarray(got_vort), want_vort, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_shear), want_shear, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_normal), want_normal, atol=1e-5)


def test_de_vort_matches_reference():
    from piv_liteflownet_tpu.postpro import de_vort

    ref = _ref_postpro()
    flow = np.random.default_rng(1).standard_normal((12, 14, 2)).astype(np.float32)
    want_vort, want_uy, want_vx = ref.de_vort(flow, calib=1.5)
    got_vort, got_uy, got_vx = de_vort(jnp.asarray(flow), calib=1.5)
    np.testing.assert_allclose(np.asarray(got_vort), want_vort, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_uy), want_uy, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_vx), want_vx, atol=1e-5)


def test_batched_vorticity():
    from piv_liteflownet_tpu.postpro import calc_vorticity

    flows = np.random.default_rng(2).standard_normal((3, 16, 16, 2)).astype(np.float32)
    vort, shear, normal = calc_vorticity(jnp.asarray(flows))
    assert vort.shape == (3, 16, 16)
    single, _, _ = calc_vorticity(jnp.asarray(flows[0]))
    np.testing.assert_allclose(np.asarray(vort[0]), np.asarray(single), atol=1e-6)
