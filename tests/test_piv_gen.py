"""Synthetic PIV generator tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piv_liteflownet_tpu.data.piv_gen import (
    ParticleImageGen,
    make_dataset_dir,
    sine_flow,
    uniform_flow,
    vortex_flow,
)


def test_pair_shapes_and_range():
    gen = ParticleImageGen(image_size=(64, 64), ppp=0.02)
    flow = uniform_flow(64, 64, 3.0, -2.0)
    im1, im2 = gen.generate_pair(jax.random.PRNGKey(0), flow)
    assert im1.shape == (64, 64, 3) and im2.shape == (64, 64, 3)
    a1, a2 = np.asarray(im1), np.asarray(im2)
    assert 0.0 <= a1.min() and a1.max() <= 1.0
    assert a1.std() > 0.01  # particles actually rendered
    assert not np.allclose(a1, a2)  # advection moved them


def test_uniform_advection_is_a_shift():
    """For uniform integer flow, img2 must equal img1 shifted by (u, v)."""
    gen = ParticleImageGen(image_size=(96, 96), ppp=0.03)
    u, v = 5.0, 3.0
    flow = uniform_flow(96, 96, u, v)
    im1, im2 = gen.generate_pair(jax.random.PRNGKey(1), flow)
    a1 = np.asarray(im1)[..., 0]
    a2 = np.asarray(im2)[..., 0]
    # compare interior (avoid border effects): img2[y, x] == img1[y-v, x-u]
    shifted = a1[10 - int(v) : 86 - int(v), 10 - int(u) : 86 - int(u)]
    core2 = a2[10:86, 10:86]
    err = np.abs(shifted - core2).mean()
    assert err < 1e-3, err


def test_batch_generation():
    gen = ParticleImageGen(image_size=(32, 32), ppp=0.02)
    flows = jnp.stack([vortex_flow(32, 32), sine_flow(32, 32)])
    im1, im2 = gen.generate_batch(jax.random.PRNGKey(2), flows)
    assert im1.shape == (2, 32, 32, 3)
    assert not np.allclose(np.asarray(im1)[0], np.asarray(im1)[1])


def test_make_dataset_dir(tmp_path):
    from piv_liteflownet_tpu.data.datasets import PIVData

    out = str(tmp_path / "synth")
    make_dataset_dir(out, n=4, size=(64, 64))
    ds = PIVData(out, mode="train")
    (i1, i2), flow = ds[0]
    assert i1.shape == (64, 64, 3) and flow.shape == (64, 64, 2)
    assert ds.render_size == (64, 64)
    val = PIVData(out, mode="val")
    assert len(ds) + len(val) == 4
