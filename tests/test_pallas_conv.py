"""Fused conv-chain kernel vs the XLA conv chain (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piv_liteflownet_tpu.ops.pallas_conv import conv_chain_pallas, conv_chain_xla


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


requires_tpu = pytest.mark.skipif(not _on_tpu(), reason="needs a real TPU backend")


def _chain(seed, shapes, b=1, h=40, w=48, parts_c=None):
    """shapes: [(k, cin, cout), ...]; parts_c: split of shapes[0] cin."""
    rng = np.random.default_rng(seed)
    parts_c = parts_c or [shapes[0][1]]
    parts = [jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32) * 0.5)
             for c in parts_c]
    weights, biases = [], []
    for k, cin, cout in shapes:
        weights.append(jnp.asarray(
            rng.standard_normal((k, k, cin, cout)).astype(np.float32)
            * (1.0 / np.sqrt(k * k * cin))))
        biases.append(jnp.asarray(rng.standard_normal(cout).astype(np.float32) * 0.1))
    return parts, weights, biases


def test_single_conv_matches():
    parts, weights, biases = _chain(0, [(3, 16, 24)])
    got = conv_chain_pallas(parts, weights, biases, tile_h=16, tile_w=24,
                            interpret=True)
    ref = conv_chain_xla(parts, weights, biases)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_s_stack_shape_matches():
    """The v1 S-stack shape: split 130-ch input, 3x3 chain + 7x7 last."""
    shapes = [(3, 130, 32), (3, 32, 24), (3, 24, 16), (7, 16, 2)]
    parts, weights, biases = _chain(1, shapes, b=2, h=48, w=56,
                                    parts_c=[64, 64, 2])
    got = conv_chain_pallas(parts, weights, biases, tile_h=16, tile_w=32,
                            interpret=True)
    ref = conv_chain_xla(parts, weights, biases)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_non_divisible_sizes():
    shapes = [(3, 8, 16), (3, 16, 8)]
    parts, weights, biases = _chain(2, shapes, b=1, h=35, w=41)
    got = conv_chain_pallas(parts, weights, biases, tile_h=16, tile_w=24,
                            interpret=True)
    ref = conv_chain_xla(parts, weights, biases)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_last_activation_flag():
    shapes = [(3, 8, 8), (3, 8, 4)]
    parts, weights, biases = _chain(3, shapes, b=1, h=24, w=24)
    got = conv_chain_pallas(parts, weights, biases, last_linear=False,
                            tile_h=8, tile_w=16, interpret=True)
    ref = conv_chain_xla(parts, weights, biases, last_linear=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.tpu
@requires_tpu
def test_ondevice_s_stack():
    shapes = [(3, 130, 128), (3, 128, 64), (3, 64, 32), (7, 32, 2)]
    parts, weights, biases = _chain(4, shapes, b=1, h=128, w=256,
                                    parts_c=[64, 64, 2])
    parts = [p.astype(jnp.bfloat16) for p in parts]
    got = conv_chain_pallas(parts, weights, biases, tile_h=16, tile_w=128)
    ref = conv_chain_xla([p.astype(jnp.float32) for p in parts], weights, biases)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               atol=0.15, rtol=0.05)


@pytest.mark.tpu
@requires_tpu
def test_ondevice_model_parity():
    """Full v1 forward with conv_impl=pallas matches the xla path."""
    import dataclasses

    from piv_liteflownet_tpu.models.factory import piv_liteflownet
    from piv_liteflownet_tpu.models.liteflownet import forward

    model = piv_liteflownet(version=1)
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.random((1, 128, 128, 3), dtype=np.float32))
    img2 = jnp.asarray(rng.random((1, 128, 128, 3), dtype=np.float32))
    ref = forward(model.params, img1, img2, model.cfg, train=False)
    cfgp = dataclasses.replace(model.cfg, conv_impl="pallas")
    got = forward(model.params, img1, img2, cfgp, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)
