"""Native (C++) I/O runtime vs the Python implementations."""

import os

import numpy as np
import pytest

from piv_liteflownet_tpu.data import native
from piv_liteflownet_tpu.utils.flow_io import read_flow, write_flow

pytestmark = pytest.mark.skipif(
    native.build_library() is None, reason="g++ build unavailable"
)


def test_flo_roundtrip_native_vs_python(tmp_path):
    flow = np.random.default_rng(0).standard_normal((17, 23, 2)).astype(np.float32)
    p1 = str(tmp_path / "py.flo")
    p2 = str(tmp_path / "nat.flo")
    write_flow(flow, p1)
    native.flo_write(p2, flow)
    # byte-identical files
    assert open(p1, "rb").read() == open(p2, "rb").read()
    np.testing.assert_array_equal(native.flo_read(p1), flow)
    np.testing.assert_array_equal(read_flow(p2), flow)


def test_flo_read_3band(tmp_path):
    flow = np.random.default_rng(1).standard_normal((5, 6, 3)).astype(np.float32)
    p = str(tmp_path / "s.flo")
    native.flo_write(p, flow)
    np.testing.assert_array_equal(native.flo_read(p, bands=3), flow)


def test_pgm_ppm_decode_vs_pil(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(2)
    gray = (rng.random((20, 30)) * 255).astype(np.uint8)
    rgb = (rng.random((20, 30, 3)) * 255).astype(np.uint8)
    pgm = str(tmp_path / "g.pgm")
    ppm = str(tmp_path / "c.ppm")
    Image.fromarray(gray).save(pgm)
    Image.fromarray(rgb).save(ppm)

    got_g = native.image_read(pgm)
    ref_g = np.asarray(Image.open(pgm).convert("RGB"), np.float32) / 255.0
    np.testing.assert_allclose(got_g, ref_g, atol=1e-6)

    got_c = native.image_read(ppm)
    ref_c = np.asarray(Image.open(ppm).convert("RGB"), np.float32) / 255.0
    np.testing.assert_allclose(got_c, ref_c, atol=1e-6)


def test_native_batch_loader(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(3)
    pairs = []
    for i in range(5):
        a = (rng.random((16, 24, 3)) * 255).astype(np.uint8)
        b = (rng.random((16, 24, 3)) * 255).astype(np.uint8)
        p1 = str(tmp_path / f"s{i}_img1.ppm")
        p2 = str(tmp_path / f"s{i}_img2.ppm")
        Image.fromarray(a).save(p1)
        Image.fromarray(b).save(p2)
        pairs.append((p1, p2))

    loader = native.NativeBatchLoader(pairs, batch_size=2, height=16, width=24, threads=2)
    batches = list(loader)
    loader.close()
    assert len(batches) == 3
    (im1, im2), names = batches[0]
    assert im1.shape == (2, 16, 24, 3) and names[0].endswith("s0_img1.ppm")
    assert batches[-1][0][0].shape[0] == 1  # trimmed final batch
    # content parity with PIL
    from PIL import Image as I

    ref = np.asarray(I.open(pairs[0][0]).convert("RGB"), np.float32) / 255.0
    np.testing.assert_allclose(im1[0], ref, atol=1e-6)
    # batches arrive in order
    ref3 = np.asarray(I.open(pairs[4][0]).convert("RGB"), np.float32) / 255.0
    np.testing.assert_allclose(batches[2][0][0][0], ref3, atol=1e-6)


def test_native_loader_for_gating(tmp_path):
    """native_loader_for: native path for PGM/PPM Run datasets, None for PNG."""
    from PIL import Image

    from piv_liteflownet_tpu.data.datasets import Run
    from piv_liteflownet_tpu.data.loader import native_loader_for

    rng = np.random.default_rng(4)
    for i in range(3):
        for tag in ("img1", "img2"):
            Image.fromarray((rng.random((16, 24, 3)) * 255).astype(np.uint8)).save(
                str(tmp_path / f"s{i}_{tag}.ppm"))
    ds = Run(root=str(tmp_path), is_pair=True)
    loader = native_loader_for(ds, batch_size=2)
    assert loader is not None
    batches = list(loader)
    loader.close()
    assert len(batches) == 2 and batches[0][0][0].shape == (2, 16, 24, 3)

    png_dir = tmp_path / "png"
    png_dir.mkdir()
    for tag in ("img1", "img2"):
        Image.fromarray((rng.random((16, 24, 3)) * 255).astype(np.uint8)).save(
            str(png_dir / f"s0_{tag}.png"))
    assert native_loader_for(Run(root=str(png_dir), is_pair=True), 2) is None


def test_run_cli_native_io(tmp_path):
    """run.py --native_io produces the same flows as the Python loader."""
    import importlib.util
    import os

    from PIL import Image

    spec = importlib.util.spec_from_file_location("repo_run", "/root/repo/run.py")
    run_cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(run_cli)
    from piv_liteflownet_tpu.utils.flow_io import read_flow

    indir = str(tmp_path / "in")
    os.makedirs(indir)
    rng = np.random.default_rng(5)
    for i in range(3):
        for tag in ("img1", "img2"):
            Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(
                os.path.join(indir, f"p{i:02d}_{tag}.ppm"))

    args = ["--model", "piv", "-v", "1", "-p", "-i", indir, "--cpu"]
    run_cli.main(args + ["-o", str(tmp_path / "py")])
    run_cli.main(args + ["-o", str(tmp_path / "nat"), "--native_io"])
    for name in ("p00_img1_out.flo", "p02_img1_out.flo"):
        f_py = read_flow(str(tmp_path / "py" / "PIV-LiteFlowNet-en" / "in" / "flow" / name))
        f_nat = read_flow(str(tmp_path / "nat" / "PIV-LiteFlowNet-en" / "in" / "flow" / name))
        np.testing.assert_allclose(f_nat, f_py, atol=1e-5)
