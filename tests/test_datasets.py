"""Dataset / loader behavior tests on synthetic directories."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from piv_liteflownet_tpu.data.datasets import InferenceEval, InferenceRun, PIVData, PIVH5, Run
from piv_liteflownet_tpu.data.loader import BatchLoader
from piv_liteflownet_tpu.utils.flow_io import write_flow


def _make_pair_dir(root, n=3, size=(40, 50), pair=True):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        a = (rng.random((*size, 3)) * 255).astype(np.uint8)
        b = (rng.random((*size, 3)) * 255).astype(np.uint8)
        if pair:
            Image.fromarray(a).save(os.path.join(root, f"s{i:03d}_img1.png"))
            Image.fromarray(b).save(os.path.join(root, f"s{i:03d}_img2.png"))
        else:
            Image.fromarray(a).save(os.path.join(root, f"frame_{i:04d}.png"))


def test_run_pair_mode(tmp_path):
    root = str(tmp_path / "pairs")
    _make_pair_dir(root, n=3, pair=True)
    ds = Run(root, is_pair=True)
    assert len(ds) == 3
    (i1, i2), name = ds[0]
    assert i1.shape == (40, 50, 3) and i1.dtype == np.float32
    assert name.endswith("s000_img1.png")
    assert 0.0 <= i1.min() and i1.max() <= 1.0


def test_run_sequential_mode_and_slicing(tmp_path):
    root = str(tmp_path / "seq")
    _make_pair_dir(root, n=5, pair=False)
    ds = Run(root, is_pair=False)
    assert len(ds) == 4  # consecutive pairing
    ds2 = Run(root, is_pair=False, start_at=1, n_images=3)
    assert len(ds2) == 2


def test_inference_run_crops_to_64(tmp_path):
    root = str(tmp_path / "c")
    _make_pair_dir(root, n=2, size=(100, 130), pair=True)
    ds = InferenceRun(root, pair=True)
    (i1, i2), _ = ds[0]
    assert i1.shape == (64, 128, 3)


def test_inference_run_stereo(tmp_path):
    for cam in ("left", "right"):
        _make_pair_dir(str(tmp_path / "st" / cam), n=2, size=(64, 64), pair=True)
    ds = InferenceRun(str(tmp_path / "st"), pair=True, use_stereo=True)
    assert len(ds) == 2
    imgs, (lname, rname) = ds[0]
    assert len(imgs) == 4 and "left" in lname and "right" in rname


def test_pivdata_manifest(tmp_path):
    root = str(tmp_path / "pd")
    _make_pair_dir(root, n=4, size=(64, 64), pair=True)
    rng = np.random.default_rng(1)
    entries = []
    for i in range(4):
        flo = f"s{i:03d}_flow.flo"
        write_flow(rng.standard_normal((64, 64, 2)).astype(np.float32), os.path.join(root, flo))
        entries.append(flo)
    with open(os.path.join(root, "train.json"), "w") as f:
        json.dump(entries[:3], f)
    ds = PIVData(root, mode="train")
    assert len(ds) == 3
    (i1, i2), flow = ds[1]
    assert flow.shape == (64, 64, 2)


def test_pivh5_roundtrip(tmp_path):
    h5py = pytest.importorskip("h5py")
    from piv_liteflownet_tpu.data.write_data import write_hdf5

    root = str(tmp_path / "h5src")
    _make_pair_dir(root, n=3, size=(64, 64), pair=True)
    rng = np.random.default_rng(2)
    entries = []
    for i in range(3):
        flo = f"s{i:03d}_flow.flo"
        write_flow(rng.standard_normal((64, 64, 2)).astype(np.float32), os.path.join(root, flo))
        entries.append(flo)
    with open(os.path.join(root, "train.json"), "w") as f:
        json.dump(entries, f)
    out = str(tmp_path / "data.h5")
    write_hdf5(root, out, modes=("train",))
    ds = PIVH5(out, mode="train")
    assert len(ds) == 3
    (i1, i2), flow = ds[0]
    assert i1.shape == (64, 64, 3) and i1.max() <= 1.0
    assert flow.shape == (64, 64, 2)
    ds.close()


def test_inference_eval(tmp_path):
    root = str(tmp_path / "ev")
    _make_pair_dir(root, n=2, size=(32, 32), pair=True)
    rng = np.random.default_rng(3)
    for i in range(2):
        write_flow(rng.standard_normal((32, 32, 2)).astype(np.float32),
                   os.path.join(root, f"s{i:03d}_flow.flo"))
    ds = InferenceEval(root)
    assert len(ds) == 2
    (i1, i2), flow, name = ds[0]
    assert flow.shape == (32, 32, 2)


def test_batch_loader(tmp_path):
    root = str(tmp_path / "bl")
    _make_pair_dir(root, n=5, pair=True)
    ds = Run(root, is_pair=True)
    loader = BatchLoader(ds, batch_size=2)
    batches = list(loader)
    assert len(loader) == 3 and len(batches) == 3
    (im1, im2), names = batches[0]
    assert im1.shape == (2, 40, 50, 3) and len(names) == 2
    assert batches[-1][0][0].shape[0] == 1  # final partial batch

    loader2 = BatchLoader(ds, batch_size=2, drop_last=True, shuffle=True, seed=1)
    assert len(list(loader2)) == 2


def test_split_tool(tmp_path):
    from piv_liteflownet_tpu.data.split import extract_dataset

    root = str(tmp_path / "sp")
    os.makedirs(root)
    rng = np.random.default_rng(4)
    for i in range(10):
        write_flow(rng.standard_normal((8, 8, 2)).astype(np.float32),
                   os.path.join(root, f"x{i:02d}_flow.flo"))
    counts = extract_dataset(root, splits=(0.6, 0.2, 0.2), fmt=("json", "txt", "csv"))
    assert counts == {"train": 6, "val": 2, "test": 2}
    assert os.path.isfile(os.path.join(root, "train.json"))
    with open(os.path.join(root, "val.json")) as f:
        assert len(json.load(f)) == 2
