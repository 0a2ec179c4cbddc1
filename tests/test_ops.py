"""Unit tests for core ops vs numpy/torch oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from piv_liteflownet_tpu.ops.correlation import correlation, correlation_xla
from piv_liteflownet_tpu.ops.nn import conv2d, depthwise_deconv4x2, leaky_relu, unfold_nhwc
from piv_liteflownet_tpu.ops.resize import avg_pool, resize_bilinear
from piv_liteflownet_tpu.ops.warp import backwarp

from tests.torch_oracles import torch_backwarp, torch_correlation


def _rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape, dtype=np.float32)


# ---------------------------------------------------------------- correlation
@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("hw", [(12, 16), (11, 13)])
def test_correlation_matches_oracle(stride, hw):
    h, w = hw
    f1 = _rand((2, h, w, 8), 1)
    f2 = _rand((2, h, w, 8), 2)
    got = np.asarray(correlation(jnp.asarray(f1), jnp.asarray(f2), stride))
    ref = torch_correlation(
        torch.from_numpy(f1).permute(0, 3, 1, 2),
        torch.from_numpy(f2).permute(0, 3, 1, 2),
        stride,
    ).permute(0, 2, 3, 1).numpy()
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_correlation_grad_matches_torch():
    f1 = _rand((1, 8, 10, 4), 3)
    f2 = _rand((1, 8, 10, 4), 4)

    def loss_jax(a, b):
        return jnp.sum(jnp.square(correlation(a, b, 1)))

    ga, gb = jax.grad(loss_jax, argnums=(0, 1))(jnp.asarray(f1), jnp.asarray(f2))

    t1 = torch.from_numpy(f1).permute(0, 3, 1, 2).requires_grad_(True)
    t2 = torch.from_numpy(f2).permute(0, 3, 1, 2).requires_grad_(True)
    torch_correlation(t1, t2, 1).pow(2).sum().backward()
    np.testing.assert_allclose(
        np.asarray(ga), t1.grad.permute(0, 2, 3, 1).numpy(), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gb), t2.grad.permute(0, 2, 3, 1).numpy(), atol=1e-4, rtol=1e-4
    )


# ---------------------------------------------------------------- backwarp
def test_backwarp_matches_grid_sample():
    img = _rand((2, 9, 14, 5), 5)
    flow = (_rand((2, 9, 14, 2), 6) * 3.0).astype(np.float32)
    got = np.asarray(backwarp(jnp.asarray(img), jnp.asarray(flow)))
    ref = torch_backwarp(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(flow).permute(0, 3, 1, 2),
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_backwarp_zero_flow_identity():
    img = _rand((1, 6, 7, 3), 7)
    out = np.asarray(backwarp(jnp.asarray(img), jnp.zeros((1, 6, 7, 2), np.float32)))
    np.testing.assert_allclose(out, img, atol=1e-6)


# ---------------------------------------------------------------- resize
@pytest.mark.parametrize("out_hw", [(8, 12), (17, 23), (32, 32), (7, 9)])
def test_resize_matches_torch_interpolate(out_hw):
    img = _rand((2, 15, 21, 3), 8)
    oh, ow = out_hw
    got = np.asarray(resize_bilinear(jnp.asarray(img), oh, ow))
    ref = F.interpolate(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        size=(oh, ow),
        mode="bilinear",
        align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("mode", ["pool", "einsum"])
def test_resize_half_modes_match_torch(mode, monkeypatch):
    """Exact factor-2 downsample: the avg_pool fast path and the interp
    matmuls both reproduce torch bilinear(align_corners=False) — the
    (0.5, 0.5) weights make them the same sum (the pool path is bit-exact;
    PIV_RESIZE_HALF is trace-time, so patch the module global)."""
    import piv_liteflownet_tpu.ops.resize as R

    monkeypatch.setattr(R, "_RESIZE_HALF", mode)
    img = _rand((2, 16, 24, 3), 11)
    got = np.asarray(R.resize_bilinear(jnp.asarray(img), 8, 12))
    ref = F.interpolate(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        size=(8, 12), mode="bilinear", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    tol = 0 if mode == "pool" else 1e-6
    np.testing.assert_allclose(got, ref, atol=tol)


def test_avg_pool_matches_torch():
    img = _rand((2, 16, 24, 2), 9)
    got = np.asarray(avg_pool(jnp.asarray(img), 4))
    ref = F.avg_pool2d(torch.from_numpy(img).permute(0, 3, 1, 2), 4, 4)
    np.testing.assert_allclose(got, ref.permute(0, 2, 3, 1).numpy(), atol=1e-6)


# ---------------------------------------------------------------- conv / deconv
def test_conv2d_matches_torch():
    x = _rand((2, 10, 12, 4), 10)
    w = _rand((3, 3, 4, 8), 11)
    b = _rand((8,), 12)
    got = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 2, 1))
    ref = F.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(w).permute(3, 2, 0, 1),
        torch.from_numpy(b),
        stride=2,
        padding=1,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("c", [2, 49])
def test_depthwise_deconv_matches_conv_transpose(c):
    x = _rand((2, 7, 9, c), 13)
    wt = _rand((c, 1, 4, 4), 14)  # torch (in, out/groups, kH, kW)
    ref = F.conv_transpose2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(wt),
        stride=2,
        padding=1,
        groups=c,
    ).permute(0, 2, 3, 1).numpy()
    # converter layout: flip spatial, -> (kh, kw, 1, C)
    wj = np.ascontiguousarray(np.transpose(wt[:, :, ::-1, ::-1], (2, 3, 1, 0)))
    got = np.asarray(depthwise_deconv4x2(jnp.asarray(x), jnp.asarray(wj)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------- unfold
@pytest.mark.parametrize("k", [3, 5, 7])
def test_unfold_matches_torch(k):
    x = _rand((2, 8, 11, 1), 15)
    got = np.asarray(unfold_nhwc(jnp.asarray(x), k))
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.unfold(t, kernel_size=k, stride=1, padding=(k - 1) // 2)
    ref = ref.view(2, k * k, 8, 11).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_leaky_relu():
    x = jnp.asarray([-2.0, 0.0, 3.0])
    np.testing.assert_allclose(np.asarray(leaky_relu(x)), [-0.2, 0.0, 3.0], atol=1e-7)


def test_deconv_phase_decomposition_matches_conv_path():
    """The reference-kept phase decomposition must equal the conv-path
    depthwise deconv (it is exact; only net-slower in-model)."""
    import jax
    import jax.numpy as jnp

    from piv_liteflownet_tpu.ops.nn import _deconv4x2_phases, depthwise_deconv4x2

    key = jax.random.PRNGKey(11)
    for c in (2, 49):
        x = jax.random.normal(key, (2, 8, 12, c), jnp.float32)
        w = jax.random.normal(jax.random.fold_in(key, c), (4, 4, 1, c), jnp.float32)
        a = depthwise_deconv4x2(x, w)
        b = _deconv4x2_phases(x, w)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_gather_warp_banded_matches_space_to_batch():
    """gather_warp_banded(starts, bh2) must equal banding the full warp."""
    from piv_liteflownet_tpu.models.liteflownet import _band_starts, _space_to_batch
    from piv_liteflownet_tpu.ops.warp import gather_warp, gather_warp_banded, pack_img

    rng = np.random.default_rng(7)
    b, h, w, c = 2, 48, 40, 5
    img = jnp.asarray(rng.random((b, h, w, c), dtype=np.float32))
    flow = jnp.asarray((rng.random((b, h, w, 2), dtype=np.float32) - 0.5) * 9)

    packed = pack_img(img)
    k, halo = 4, 5
    starts, _, bh2 = _band_starts(h, k, halo)
    want = _space_to_batch(gather_warp(packed, h, w, flow), k, halo)
    got = gather_warp_banded(packed, h, w, flow, starts, bh2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gather_warp_banded_stride2():
    from piv_liteflownet_tpu.models.liteflownet import _band_starts, _space_to_batch
    from piv_liteflownet_tpu.ops.warp import gather_warp, gather_warp_banded, pack_img

    rng = np.random.default_rng(8)
    b, h, w, c = 1, 64, 32, 3
    img = jnp.asarray(rng.random((b, h, w, c), dtype=np.float32))
    hs, ws = h // 2, w // 2
    flow = jnp.asarray((rng.random((b, hs, ws, 2), dtype=np.float32) - 0.5) * 7)

    packed = pack_img(img)
    k, halo = 2, 4
    starts, _, bh2 = _band_starts(hs, k, halo)
    want = _space_to_batch(gather_warp(packed, h, w, flow, 2), k, halo)
    got = gather_warp_banded(packed, h, w, flow, starts, bh2, 2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("k,cin,cout", [(7, 32, 2), (5, 32, 2), (3, 8, 2)])
def test_conv2d_shift_smallcout_matches_direct(k, cin, cout):
    """The 1x1+shift-sum flow-head reformulation (ModelConfig.lastconv_impl)
    equals the direct conv up to f32 summation order."""
    from piv_liteflownet_tpu.ops.nn import conv2d_shift_smallcout

    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 24, 20, cin), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (k, k, cin, cout),
                          jnp.float32) * 0.1
    b = jax.random.normal(jax.random.fold_in(key, 2), (cout,), jnp.float32)
    pad = (k - 1) // 2
    ref = conv2d(x, w, b, 1, pad)
    got = conv2d_shift_smallcout(x, w, b, pad)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
