"""Flow visualization parity vs the reference color wheel."""

import sys

import numpy as np
import pytest


def _ref_color():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import src.utils_color as ref

    return ref


def test_compute_color_matches_reference():
    from piv_liteflownet_tpu.utils.flow_viz import compute_color

    ref = _ref_color()
    rng = np.random.default_rng(0)
    fx = rng.uniform(-1.5, 1.5, (16, 20))
    fy = rng.uniform(-1.5, 1.5, (16, 20))
    want = np.zeros((16, 20, 3), np.uint8)
    # reference uses removed np.int alias; shim it for the comparison
    if not hasattr(np, "int"):
        np.int = int  # noqa: NPY001
    ref.compute_color(fx, fy, want, original_color=False)
    got = compute_color(fx, fy, original_color=False)
    np.testing.assert_array_equal(got, want)


def test_motion_to_color_shapes():
    from piv_liteflownet_tpu.utils.flow_viz import motion_to_color

    flow = np.random.default_rng(1).standard_normal((8, 10, 2)).astype(np.float32)
    col = motion_to_color(flow)
    assert col.shape == (8, 10, 3) and col.dtype == np.uint8
    seq = motion_to_color(np.stack([flow, flow * 2]))
    assert seq.shape == (2, 8, 10, 3)
    # unknown flow pixels are blacked out
    flow2 = flow.copy()
    flow2[0, 0] = 1e10
    col2 = motion_to_color(flow2)
    assert (col2[0, 0] == 0).all()


def test_quiver_plot_writes_png(tmp_path):
    from piv_liteflownet_tpu.utils.flow_viz import quiver_plot

    flow = np.random.default_rng(2).standard_normal((8, 8, 2)).astype(np.float32)
    out = str(tmp_path / "q.png")
    u, v = quiver_plot(flow, filename=out)
    assert u.shape == (8, 8)
    import os

    assert os.path.getsize(out) > 0
