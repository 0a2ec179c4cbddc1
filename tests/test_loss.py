"""Loss parity vs the reference torch loss module (pure torch, CPU-safe)."""

import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from piv_liteflownet_tpu.training.loss import EPE, L1Loss, L2Loss, LevelLoss, MultiScale, hui_loss, piv_loss


def _ref_loss():
    import types

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import src.loss as ref_loss

    return ref_loss


def _rand(shape, seed):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_epe_matches_reference():
    ref = _ref_loss()
    a, b = _rand((2, 8, 8, 2), 0), _rand((2, 8, 8, 2), 1)
    at = torch.from_numpy(a).permute(0, 3, 1, 2)
    bt = torch.from_numpy(b).permute(0, 3, 1, 2)
    for mean in (True, False):
        got = float(EPE(jnp.asarray(a), jnp.asarray(b), mean=mean))
        want = float(ref.EPE(at, bt, mean=mean))
        assert abs(got - want) < 1e-5


@pytest.mark.parametrize("version", [1, 2])
def test_multiscale_matches_reference(version):
    ref = _ref_loss()
    ref_ms = ref.piv_loss(version=version)
    ours = piv_loss(version=version)

    # model-shaped training output: levels 6..lowest, each [M, S, R] (+v2 upsample)
    lowest = version  # piv v1 -> 1, v2 loss has 5 weights -> 5 outputs
    h = w = 64
    n_levels = len(ours.l_weight)
    out_np, out_t, out_j = [], [], []
    rng_seed = 0
    for i in range(n_levels):
        k = ours.startScale * (2 ** (ours.numScales - 1 - i)) if i < ours.numScales else 1
        hw = (h // k, w // k) if i < ours.numScales else (h, w)
        entry_np = [_rand((2, *hw, 2), rng_seed + j) for j in range(3)]
        rng_seed += 3
        out_t.append([torch.from_numpy(x).permute(0, 3, 1, 2) for x in entry_np])
        out_j.append([jnp.asarray(x) for x in entry_np])
    target = _rand((2, h, w, 2), 999)
    tt = torch.from_numpy(target).permute(0, 3, 1, 2)

    want_loss, want_epe = ref_ms(out_t, tt)
    got_loss, got_epe = ours(out_j, jnp.asarray(target))
    assert abs(float(got_loss) - float(want_loss)) < 1e-5
    assert abs(float(got_epe) - float(want_epe)) < 1e-5


def test_multiscale_eval_branch_matches_reference():
    ref = _ref_loss()
    ref_ms = ref.hui_loss()
    ours = hui_loss()
    out = _rand((2, 32, 32, 2), 5)
    target = _rand((2, 64, 64, 2), 6)
    want = ref_ms(torch.from_numpy(out).permute(0, 3, 1, 2),
                  torch.from_numpy(target).permute(0, 3, 1, 2))
    got = ours(jnp.asarray(out), jnp.asarray(target))
    assert abs(float(got[0]) - float(want[0])) < 1e-5
    assert abs(float(got[1]) - float(want[1])) < 1e-5


def test_levelloss_matches_reference():
    ref = _ref_loss()
    ref_ll = ref.piv_loss(level_eval=True, version=1)
    ours = piv_loss(level_eval=True, version=1)
    h = w = 64
    out_t, out_j = [], []
    for i in range(6):
        k = 1 * (2 ** (6 - 1 - i))
        x = _rand((2, h // k, w // k, 2), 100 + i)
        out_t.append([torch.from_numpy(x).permute(0, 3, 1, 2)])
        out_j.append([jnp.asarray(x)])
    target = _rand((2, h, w, 2), 200)
    want_l, want_e = ref_ll(out_t, torch.from_numpy(target).permute(0, 3, 1, 2))
    got_l, got_e = ours(out_j, jnp.asarray(target))
    for g, wv in zip(got_l, want_l):
        assert abs(float(g) - float(wv)) < 1e-5
    for g, wv in zip(got_e, want_e):
        assert abs(float(g) - float(wv)) < 1e-5


def test_l1_l2_modules():
    ref = _ref_loss()
    a, b = _rand((2, 8, 8, 2), 7), _rand((2, 8, 8, 2), 8)
    at = torch.from_numpy(a).permute(0, 3, 1, 2)
    bt = torch.from_numpy(b).permute(0, 3, 1, 2)
    got = L1Loss(mul_scale=3.0)(jnp.asarray(a), jnp.asarray(b))
    want = ref.L1Loss(mul_scale=3.0)(at, bt)
    assert abs(float(got[0]) - float(want[0])) < 1e-5
    got = L2Loss(mul_scale=2.0)(jnp.asarray(a), jnp.asarray(b))
    want = ref.L2Loss(mul_scale=2.0)(at, bt)
    assert abs(float(got[0]) - float(want[0])) < 1e-5
