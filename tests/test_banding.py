"""Space-to-batch conv banding must be numerically equivalent to the plain
forward (the halo covers each stack's receptive radius, so banded SAME-padded
convs see identical receptive fields)."""

import numpy as np

import jax.numpy as jnp

import piv_liteflownet_tpu.models.liteflownet as lfn
from piv_liteflownet_tpu.models.factory import piv_liteflownet


def test_banded_forward_matches_plain(monkeypatch):
    model = piv_liteflownet(version=1)
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.random((1, 128, 96, 3), dtype=np.float32))
    img2 = jnp.asarray(rng.random((1, 128, 96, 3), dtype=np.float32))

    ref = np.asarray(model(img1, img2))

    def forced(shape, halo):
        b, h, w, _ = shape
        for k in (4, 2):
            if h % k == 0 and h >= h // k + 2 * halo:
                return k
        return 1

    monkeypatch.setattr(lfn, "_band_plan", forced)
    # fresh Model with conv_bands on -> fresh jit cache, banded trace compiles
    import dataclasses

    from piv_liteflownet_tpu.models.factory import Model

    banded_model = Model(
        cfg=dataclasses.replace(model.cfg, conv_bands=True), params=model.params
    )
    got = np.asarray(banded_model(img1, img2))

    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_space_to_batch_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 64, 32, 5), dtype=np.float32))
    y = lfn._space_to_batch(x, 4, 3)
    assert y.shape == (8, 16 + 6, 32, 5)
    back = lfn._batch_to_space(y, 4, 3)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
