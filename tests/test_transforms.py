"""Device-side augmentation pipeline tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piv_liteflownet_tpu.data.transforms import (
    Photometric,
    Pipeline,
    apply_pipeline,
    gaussian_blur,
    normalize,
)


def _pair(h=64, w=80, b=2, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.random((b, h, w, 3), dtype=np.float32),
            rng.random((b, h, w, 3), dtype=np.float32),
            rng.standard_normal((b, h, w, 2)).astype(np.float32))


def test_identity_center_crop():
    img1, img2, flow = _pair()
    pipe = Pipeline(crop_size=(32, 32), crop_type="center")
    o1, o2, of = apply_pipeline(jax.random.PRNGKey(0), *map(jnp.asarray, (img1, img2, flow)), pipe)
    # pure center crop: exact slice of the source
    np.testing.assert_allclose(np.asarray(o1), img1[:, 16:48, 24:56], atol=1e-5)
    np.testing.assert_allclose(np.asarray(of), flow[:, 16:48, 24:56], atol=1e-5)


def test_output_shapes_and_determinism():
    img1, img2, flow = _pair()
    pipe = Pipeline(
        crop_size=(32, 32), translate=10, scale_range=(0.95, 1.45), hflip=True, vflip=True,
        photometric=Photometric((0.0, 0.04), (-0.8, 0.4), 0.2, (0.5, 2.0), (0.7, 1.5)),
    )
    args = tuple(map(jnp.asarray, (img1, img2, flow)))
    o1a, o2a, ofa = apply_pipeline(jax.random.PRNGKey(7), *args, pipe)
    o1b, o2b, ofb = apply_pipeline(jax.random.PRNGKey(7), *args, pipe)
    assert o1a.shape == (2, 32, 32, 3) and ofa.shape == (2, 32, 32, 2)
    np.testing.assert_array_equal(np.asarray(o1a), np.asarray(o1b))  # keyed PRNG
    o1c, _, _ = apply_pipeline(jax.random.PRNGKey(8), *args, pipe)
    assert np.abs(np.asarray(o1a) - np.asarray(o1c)).max() > 1e-4  # different key


def test_flip_negates_flow():
    """With hflip forced (via key search) flow u must negate and mirror."""
    img1, img2, flow = _pair(h=32, w=32)
    pipe = Pipeline(crop_size=(32, 32), crop_type="center", hflip=True)
    # find keys for both flip outcomes
    found = {True: None, False: None}
    for s in range(20):
        _, _, of = apply_pipeline(jax.random.PRNGKey(s), *map(jnp.asarray, (img1, img2, flow)), pipe)
        flipped = bool(np.allclose(np.asarray(of)[:, :, :, 0], -flow[:, :, ::-1, 0], atol=1e-5))
        ident = bool(np.allclose(np.asarray(of), flow, atol=1e-5))
        if flipped:
            found[True] = s
        if ident:
            found[False] = s
        if all(v is not None for v in found.values()):
            break
    assert found[True] is not None and found[False] is not None


def test_translate_offsets_flow():
    """Translate: flow += (tw, th); img2 sampled from the opposite window."""
    h = w = 64
    img1 = np.zeros((1, h, w, 3), np.float32)
    img2 = np.zeros((1, h, w, 3), np.float32)
    # constant flow of zeros: after translate, flow should equal (tw, th)
    flow = np.zeros((1, h, w, 2), np.float32)
    pipe = Pipeline(crop_size=(32, 32), crop_type="center", translate=20)
    _, _, of = apply_pipeline(jax.random.PRNGKey(3), *map(jnp.asarray, (img1, img2, flow)), pipe)
    of = np.asarray(of)
    # spatially constant integer offset
    assert np.allclose(of, of[:, :1, :1, :], atol=1e-5)
    assert np.allclose(of, np.round(of), atol=1e-5)


def test_photometric_range_and_sharing():
    img1, img2, flow = _pair()
    pipe = Pipeline(crop_size=(32, 32), crop_type="center",
                    photometric=Photometric((0.0, 0.0), (-0.5, 0.5), 0.0, (0.8, 1.2), (0.8, 1.2)))
    o1, o2, _ = apply_pipeline(jax.random.PRNGKey(1), *map(jnp.asarray, (img1, img2, flow)), pipe)
    assert np.asarray(o1).min() >= 0.0 and np.asarray(o1).max() <= 1.0 + 1e-5


def test_gaussian_blur_and_normalize():
    img = jnp.asarray(np.random.default_rng(0).random((1, 16, 16, 3), dtype=np.float32))
    blurred = gaussian_blur(img, radius=2.0)
    assert blurred.shape == img.shape
    assert float(jnp.var(blurred)) < float(jnp.var(img))  # smoothing reduces variance
    normed = normalize(img, mean=[0.5, 0.5, 0.5], std=[2.0, 2.0, 2.0])
    np.testing.assert_allclose(np.asarray(normed), (np.asarray(img) - 0.5) / 2.0, atol=1e-6)


def test_crop_with_padding_centers_and_fills():
    """Oversized crop: frame centered, border filled with pad_fill, flow 0
    (reference Crop(padding=...), src/flow_transforms.py:285-377)."""
    h = w = 32
    img1 = np.ones((1, h, w, 3), np.float32) * 0.5
    img2 = np.ones((1, h, w, 3), np.float32) * 0.5
    flow = np.ones((1, h, w, 2), np.float32)
    pipe = Pipeline(crop_size=(64, 64), crop_type="center",
                    pad_fill=(0.1, 0.2, 0.3))
    o1, o2, of = apply_pipeline(
        jax.random.PRNGKey(0), *map(jnp.asarray, (img1, img2, flow)), pipe)
    o1, of = np.asarray(o1), np.asarray(of)
    assert o1.shape == (1, 64, 64, 3)
    # center is the frame, corner is the fill
    np.testing.assert_allclose(o1[0, 32, 32], [0.5, 0.5, 0.5], atol=1e-5)
    np.testing.assert_allclose(o1[0, 2, 2], [0.1, 0.2, 0.3], atol=1e-5)
    np.testing.assert_allclose(of[0, 32, 32], [1.0, 1.0], atol=1e-5)
    np.testing.assert_allclose(of[0, 2, 2], [0.0, 0.0], atol=1e-5)


def test_pipeline_blur_and_normalize_fields():
    rng = np.random.default_rng(1)
    img1 = rng.random((2, 32, 32, 3), dtype=np.float32)
    img2 = rng.random((2, 32, 32, 3), dtype=np.float32)
    flow = rng.random((2, 32, 32, 2), dtype=np.float32)
    base = Pipeline(crop_size=(32, 32), crop_type="center")
    o1, _, _ = apply_pipeline(jax.random.PRNGKey(0), *map(jnp.asarray, (img1, img2, flow)), base)
    # blur_prob=1: output variance drops for every sample
    pipe_b = Pipeline(crop_size=(32, 32), crop_type="center",
                      blur_radius=2.0, blur_prob=1.0)
    b1, _, _ = apply_pipeline(jax.random.PRNGKey(0), *map(jnp.asarray, (img1, img2, flow)), pipe_b)
    assert float(jnp.var(b1)) < float(jnp.var(o1))
    # blur_prob=0: bit-identical to base
    pipe_nb = Pipeline(crop_size=(32, 32), crop_type="center",
                       blur_radius=2.0, blur_prob=0.0)
    nb1, _, _ = apply_pipeline(jax.random.PRNGKey(0), *map(jnp.asarray, (img1, img2, flow)), pipe_nb)
    np.testing.assert_allclose(np.asarray(nb1), np.asarray(o1), atol=1e-6)
    # normalize applies last
    pipe_n = Pipeline(crop_size=(32, 32), crop_type="center",
                      normalize_mean=(0.5, 0.5, 0.5), normalize_std=(2.0, 2.0, 2.0))
    n1, _, _ = apply_pipeline(jax.random.PRNGKey(0), *map(jnp.asarray, (img1, img2, flow)), pipe_n)
    np.testing.assert_allclose(np.asarray(n1), (np.asarray(o1) - 0.5) / 2.0, atol=1e-5)


def test_separable_resample_matches_gather():
    """Pipeline.resample="auto" (two-matmul separable path, rotation-free
    geometry) must reproduce the packed-tap gather path to f32 tolerance,
    with and without crop-with-padding fill."""
    import dataclasses

    key = jax.random.PRNGKey(11)
    img1 = jax.random.uniform(key, (3, 96, 112, 3), jnp.float32)
    img2 = jax.random.uniform(jax.random.fold_in(key, 1), (3, 96, 112, 3))
    flow = jax.random.normal(jax.random.fold_in(key, 2), (3, 96, 112, 2)) * 3

    for kw in (
        dict(crop_size=(64, 80), scale_range=(0.8, 1.3), translate=10,
             hflip=True, vflip=True),
        dict(crop_size=(128, 128), pad_fill=(0.2, 0.3, 0.4)),
    ):
        pipe = Pipeline(**kw)
        a = apply_pipeline(jax.random.PRNGKey(7), img1, img2, flow, pipe)
        b = apply_pipeline(jax.random.PRNGKey(7), img1, img2, flow,
                           dataclasses.replace(pipe, resample="gather"))
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=5e-6)
