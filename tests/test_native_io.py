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


def test_png_decode_vs_pil(tmp_path):
    """PNG color types 0/2/3/4/6 at 8-bit + 16-bit gray match PIL exactly."""
    from PIL import Image

    rng = np.random.default_rng(6)
    arr = (rng.random((21, 33, 3)) * 255).astype(np.uint8)
    cases = {
        "rgb.png": Image.fromarray(arr),
        "gray.png": Image.fromarray(arr[..., 0]),
        "rgba.png": Image.fromarray(np.dstack([arr, arr[..., :1]])),
        "pal.png": Image.fromarray(arr).convert("P"),
        "la.png": Image.fromarray(arr[..., 0]).convert("LA"),
        "gray16.png": Image.fromarray((rng.random((21, 33)) * 65535).astype(np.uint16)),
    }
    for name, im in cases.items():
        p = str(tmp_path / name)
        im.save(p)
        got = native.image_read(p)
        if name == "gray16.png":
            ref = np.asarray(Image.open(p), np.float32) / 65535.0
            ref = np.repeat(ref[..., None], 3, -1)
        else:
            ref = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
        np.testing.assert_allclose(got, ref, atol=1e-6, err_msg=name)


def test_tiff_decode_vs_pil(tmp_path):
    """Baseline TIFF (uncompressed + packbits, gray/RGB) matches PIL; the
    reference demo tifs are gray packbits (reference images/demo/)."""
    from PIL import Image

    rng = np.random.default_rng(7)
    arr = (rng.random((19, 27, 3)) * 255).astype(np.uint8)
    cases = [
        ("gray.tif", Image.fromarray(arr[..., 0]), {}),
        ("rgb.tif", Image.fromarray(arr), {}),
        ("gray_pb.tif", Image.fromarray(arr[..., 0]), {"compression": "packbits"}),
        ("rgb_pb.tif", Image.fromarray(arr), {"compression": "packbits"}),
    ]
    for name, im, kw in cases:
        p = str(tmp_path / name)
        im.save(p, **kw)
        got = native.image_read(p)
        ref = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
        np.testing.assert_allclose(got, ref, atol=1e-6, err_msg=name)
    demo = "/root/reference/images/demo/DNS_turbulence_img1.tif"
    if os.path.isfile(demo):
        got = native.image_read(demo)
        ref = np.asarray(Image.open(demo).convert("RGB"), np.float32) / 255.0
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_native_loader_for_gating(tmp_path):
    """native_loader_for: native path for PNM *and* PNG/TIFF Run datasets;
    None for variants the minimal decoders reject (probe fallback)."""
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
    png_loader = native_loader_for(Run(root=str(png_dir), is_pair=True), 2)
    assert png_loader is not None
    (im1, _), _ = next(iter(png_loader))
    png_loader.close()
    ref = np.asarray(Image.open(str(png_dir / "s0_img1.png")).convert("RGB"),
                     np.float32) / 255.0
    np.testing.assert_allclose(im1[0], ref, atol=1e-6)

    # 1-bit PNG: the minimal decoder rejects depth<8 -> probe fails -> None
    bw_dir = tmp_path / "bw"
    bw_dir.mkdir()
    for tag in ("img1", "img2"):
        Image.fromarray(rng.random((16, 24)) > 0.5).save(str(bw_dir / f"s0_{tag}.png"))
    assert native_loader_for(Run(root=str(bw_dir), is_pair=True), 2) is None


def test_native_train_loader(tmp_path):
    """NativeTrainLoader: triplet batches match PIL + python .flo readers;
    shuffle order is set_epoch-deterministic."""
    from PIL import Image

    from piv_liteflownet_tpu.data.loader import native_train_loader_for
    from piv_liteflownet_tpu.utils.flow_io import read_flow

    rng = np.random.default_rng(8)
    trips = []
    for i in range(5):
        p1 = str(tmp_path / f"s{i}_img1.png")
        p2 = str(tmp_path / f"s{i}_img2.png")
        pf = str(tmp_path / f"s{i}_flow.flo")
        Image.fromarray((rng.random((16, 24)) * 255).astype(np.uint8)).save(p1)
        Image.fromarray((rng.random((16, 24)) * 255).astype(np.uint8)).save(p2)
        write_flow(rng.standard_normal((16, 24, 2)).astype(np.float32), pf)
        trips.append((p1, p2, pf))

    class DS:
        samples = trips

    loader = native_train_loader_for(DS(), batch_size=2, shuffle=False, drop_last=False)
    assert loader is not None
    batches = list(loader)
    assert len(batches) == 3 and batches[-1][0][0].shape[0] == 1
    (im1, im2), fl = batches[0]
    ref1 = np.asarray(Image.open(trips[0][0]).convert("RGB"), np.float32) / 255.0
    np.testing.assert_allclose(im1[0], ref1, atol=1e-6)
    np.testing.assert_array_equal(fl[1], read_flow(trips[1][2]))

    shuf = native_train_loader_for(DS(), batch_size=2, shuffle=True, seed=1,
                                   drop_last=True)
    assert len(shuf) == 2
    shuf.set_epoch(3)
    a = [f.sum() for _, f in shuf]
    shuf.set_epoch(3)
    b = [f.sum() for _, f in shuf]
    assert a == b


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
