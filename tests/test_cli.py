"""CLI contract tests: run.py, convert.py, stereo_cal.py (tiny inputs, CPU)."""

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, "/root/repo")

from piv_liteflownet_tpu.utils.flow_io import read_flow

pytestmark = pytest.mark.slow  # CLI subprocess battery (fresh interpreter + compile per test)


def _load_repo_module(name):
    """Import a repo-root CLI module by path (the reference mount has
    same-named scripts and other tests put /root/reference on sys.path)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        f"repo_{name}", f"/root/repo/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _make_pairs(root, n=2, size=(32, 32)):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        for tag in ("img1", "img2"):
            Image.fromarray((rng.random((*size, 3)) * 255).astype(np.uint8)).save(
                os.path.join(root, f"p{i:02d}_{tag}.png"))


def test_run_cli_pair_mode(tmp_path):
    run_cli = _load_repo_module("run")

    indir = str(tmp_path / "in")
    outdir = str(tmp_path / "out")
    _make_pairs(indir, n=2)
    run_cli.main(["--model", "piv", "--version", "1", "-p",
                  "-i", indir, "-o", outdir, "--cpu"])
    flodir = os.path.join(outdir, "PIV-LiteFlowNet-en", "in", "flow")
    flos = sorted(os.listdir(flodir))
    # reference main_dl names outputs with pair=False (run.py:165):
    assert flos == ["p00_img1_out.flo", "p01_img1_out.flo"]
    flow = read_flow(os.path.join(flodir, flos[0]))
    assert flow.shape == (32, 32, 2) and np.isfinite(flow).all()
    # args.txt metadata dump exists (reference run.py:261-266 contract)
    assert os.path.isfile(os.path.join(outdir, "PIV-LiteFlowNet-en", "in", "args.txt"))


def test_run_cli_start_slice_naming(tmp_path):
    run_cli = _load_repo_module("run")

    indir = str(tmp_path / "in2")
    outdir = str(tmp_path / "out2")
    _make_pairs(indir, n=3)
    run_cli.main(["--model", "piv", "-p", "-s", "1", "-n", "2",
                  "-i", indir, "-o", outdir, "--cpu"])
    # non-default slice -> '<base>-<start>_<n>' subdir (reference run.py:251)
    sub = os.path.join(outdir, "PIV-LiteFlowNet-en", "in2-1_2", "flow")
    assert sorted(os.listdir(sub)) == ["p01_img1_out.flo", "p02_img1_out.flo"]


def test_convert_cli_roundtrip(tmp_path):
    import torch

    convert_cli = _load_repo_module("convert")
    from tests.torch_oracles import load_reference_models

    ref_models = load_reference_models()
    torch.manual_seed(0)
    sd = ref_models.piv_liteflownet(None, version=1).state_dict()
    src = str(tmp_path / "w.paramOnly")
    torch.save(sd, src)
    dst = str(tmp_path / "w.npz")
    convert_cli.main(["--mode", "torch", "-i", src, "-o", dst, "-m", "piv", "-v", "1"])
    data = np.load(dst)
    assert "NetC.conv1.0.weight" in data
    assert data["NetC.conv1.0.weight"].shape == (7, 7, 3, 32)

    back = str(tmp_path / "back.paramOnly")
    convert_cli.main(["--mode", "jax2torch", "-i", dst, "-o", back, "-m", "piv", "-v", "1"])
    sd2 = torch.load(back, weights_only=True)
    for k in sd:
        assert torch.allclose(sd[k], sd2[k]), k


def test_stereo_cal_cli_non_interactive(tmp_path):
    # load by path: the reference mount also has a 'stereo_cal' module and
    # other tests put /root/reference on sys.path
    stereo_cal = _load_repo_module("stereo_cal")

    from piv_liteflownet_tpu.stereo.matching import gen_template

    # synthetic calibration plates for both cameras
    template = gen_template(5, 25, 25)
    root = str(tmp_path / "imgs")
    os.makedirs(root)
    img = np.zeros((200, 250), np.uint8)
    for gy in range(4):
        for gx in range(5):
            cy, cx = 40 + gy * 40, 45 + gx * 40
            img[cy - 12 : cy + 13, cx - 12 : cx + 13] = template
    for cam in ("-L", "-R"):
        Image.fromarray(img).save(os.path.join(root, f"cal{cam}.png"))

    save = str(tmp_path / "work")
    stereo_cal.main([
        "-r", root, "-n", "cal", "-s", save,
        "--clicks", "45", "40", "85", "40", "85", "80", "45", "80",
        "--calib", "0.005",
    ])
    with open(os.path.join(save, "cal_coeff.json")) as f:
        coeff = json.load(f)
    assert len(coeff["Left"]) == 24 and len(coeff["Right"]) == 24
    assert coeff["calib"] == 0.005


def test_evaluate_cli(tmp_path):
    from piv_liteflownet_tpu.utils.flow_io import write_flow

    evaluate_cli = _load_repo_module("evaluate")
    indir = str(tmp_path / "ev")
    _make_pairs(indir, n=2)
    rng = np.random.default_rng(9)
    for i in range(2):
        write_flow(rng.standard_normal((32, 32, 2)).astype(np.float32),
                   os.path.join(indir, f"p{i:02d}_flow.flo"))
    save = str(tmp_path / "pred")
    agg = evaluate_cli.main(["-i", indir, "--model", "piv", "--cpu", "--save", save, "--viz"])
    assert agg["pairs"] == 2 and np.isfinite(agg["aee"])
    assert os.path.isfile(os.path.join(save, "p00_out.flo"))
    assert os.path.isfile(os.path.join(save, "p00_out.png"))


def test_evaluate_cli_batched_mixed_shapes(tmp_path):
    """Shape-grouped batching: 3 pairs at 32x32 + 1 at 64x32, batch_size=2 —
    two full flushes plus two partial ones; per-pair records keep dataset
    order and every EPE is exact (same estimate() path as unbatched)."""
    from piv_liteflownet_tpu.utils.flow_io import write_flow

    evaluate_cli = _load_repo_module("evaluate")
    indir = str(tmp_path / "ev")
    _make_pairs(indir, n=3)
    rng = np.random.default_rng(11)
    Image.fromarray((rng.random((64, 32, 3)) * 255).astype(np.uint8)).save(
        os.path.join(indir, "p03_img1.png"))
    Image.fromarray((rng.random((64, 32, 3)) * 255).astype(np.uint8)).save(
        os.path.join(indir, "p03_img2.png"))
    for i, shape in enumerate([(32, 32), (32, 32), (32, 32), (64, 32)]):
        write_flow(rng.standard_normal((*shape, 2)).astype(np.float32),
                   os.path.join(indir, f"p{i:02d}_flow.flo"))
    agg = evaluate_cli.main(["-i", indir, "--model", "piv", "--cpu", "-b", "2"])
    assert agg["pairs"] == 4 and np.isfinite(agg["aee"])
