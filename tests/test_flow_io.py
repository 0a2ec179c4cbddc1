"""Flow I/O byte-contract tests."""

import os

import numpy as np
import pytest

from piv_liteflownet_tpu.utils.flow_io import (
    TAG_FLOAT,
    flowname_modifier,
    read_flow,
    read_flow_collection,
    write_flow,
)

REF_DEMO = "/root/reference/images/demo"


def test_roundtrip(tmp_path):
    flow = np.random.default_rng(0).standard_normal((17, 23, 2)).astype(np.float32)
    path = str(tmp_path / "a.flo")
    write_flow(flow, path)
    got = read_flow(path)
    np.testing.assert_array_equal(got, flow)
    # exact byte layout: tag, w, h, then raster
    raw = open(path, "rb").read()
    assert len(raw) == 12 + 17 * 23 * 2 * 4
    assert np.frombuffer(raw[:4], np.float32)[0] == np.float32(TAG_FLOAT)
    assert np.frombuffer(raw[4:8], np.int32)[0] == 23
    assert np.frombuffer(raw[8:12], np.int32)[0] == 17


def test_roundtrip_3band(tmp_path):
    flow = np.random.default_rng(1).standard_normal((5, 6, 3)).astype(np.float32)
    path = str(tmp_path / "s.flo")
    write_flow(flow, path)
    got = read_flow(path, use_stereo=True)
    np.testing.assert_array_equal(got, flow)


def test_bad_tag_raises(tmp_path):
    path = str(tmp_path / "bad.flo")
    with open(path, "wb") as f:
        np.array([1.0], np.float32).tofile(f)
        np.array([4, 4], np.int32).tofile(f)
        np.zeros(32, np.float32).tofile(f)
    with pytest.raises(AssertionError):
        read_flow(path)


@pytest.mark.skipif(not os.path.isdir(REF_DEMO), reason="reference demo not mounted")
def test_reads_reference_demo_fixture():
    flow = read_flow(os.path.join(REF_DEMO, "DNS_turbulence_flow.flo"))
    assert flow.shape == (256, 256, 2)
    assert np.isfinite(flow).all()
    out = read_flow(os.path.join(REF_DEMO, "DNS_turbulence_out.flo"))
    assert out.shape == (256, 256, 2)
    # sanity: saved model output is within a plausible EPE of ground truth
    epe = np.linalg.norm(out - flow, axis=-1).mean()
    assert epe < 1.0


def test_flowname_modifier(tmp_path):
    assert flowname_modifier("/x/abc_img1.png", "/o") == "/o/abc_out.flo"
    assert flowname_modifier("/x/frame_0001.png", "/o", pair=False) == "/o/frame_0001_out.flo"


def test_read_flow_collection(tmp_path):
    for i in [2, 0, 1]:
        write_flow(
            np.full((4, 4, 2), float(i), np.float32), str(tmp_path / f"f_{i:04d}.flo")
        )
    flows, names = read_flow_collection(str(tmp_path))
    assert flows.shape == (3, 4, 4, 2)
    assert [f[0, 0, 0] for f in flows] == [0.0, 1.0, 2.0]
    flows2, _ = read_flow_collection(str(tmp_path), start_at=1, num_images=1)
    assert flows2.shape == (1, 4, 4, 2) and flows2[0, 0, 0, 0] == 1.0
