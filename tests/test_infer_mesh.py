"""Data-parallel inference: mesh-sharded estimate() parity vs single device.

Runs on the 8-virtual-CPU-device pool (tests/conftest.py) — the SURVEY §4
mechanism for testing multi-chip behavior without hardware.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from piv_liteflownet_tpu.inference import estimate
from piv_liteflownet_tpu.models.factory import piv_liteflownet
from piv_liteflownet_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def model():
    return piv_liteflownet(version=1)


def _pairs(b, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.random((b, h, w, 3), dtype=np.float32)),
        jnp.asarray(rng.random((b, h, w, 3), dtype=np.float32)),
    )


def test_sharded_matches_single_device(model):
    mesh = make_mesh(8)
    img1, img2 = _pairs(8, 64, 64)
    ref = estimate(model, img1, img2, tensor=True)
    got = estimate(model, img1, img2, tensor=True, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_sharded_pads_partial_batch(model):
    """B=5 on 8 devices: padded to 8 by repeating the last pair, sliced back."""
    mesh = make_mesh(8)
    img1, img2 = _pairs(5, 64, 64, seed=1)
    ref = estimate(model, img1, img2, tensor=True)
    got = estimate(model, img1, img2, tensor=True, mesh=mesh)
    assert got.shape == ref.shape == (5, 64, 64, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_sharded_estimate_collective_free(model):
    """The x8 DP projection's compute-side mechanism (VERDICT r5 #4): the
    sharded inference executable must contain NO cross-device collectives on
    the data axis — params are replicated, each device runs the full pipeline
    on its batch shard, so aggregate throughput is linear in devices up to
    the host feed. Asserted on the compiled 8-device GSPMD HLO (the
    ``test_halo_warp_keeps_warp_local`` precedent)."""
    from piv_liteflownet_tpu.inference import _estimate_sharded

    mesh = make_mesh(8)
    img1, img2 = _pairs(8, 64, 64, seed=3)
    hlo = _estimate_sharded.lower(
        model.params, img1, img2, model.cfg, 64, 64, None, mesh
    ).compile().as_text()
    for coll in ("all-gather", "all-reduce", "collective-permute",
                 "all-to-all", "reduce-scatter"):
        assert coll not in hlo, f"sharded estimate must not {coll}"


def test_run_cli_num_devices_8_prefetch(tmp_path, model):
    """End-to-end 8-way DP through the CLI: directory scan -> BatchLoader ->
    PrefetchLoader (sharded device_put on a background thread) -> sharded
    forward -> .flo outputs, parity vs single device — incl. a short final
    batch exercising the pad-in-loader path (VERDICT r5 #4)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import run as run_cli
    from piv_liteflownet_tpu.utils.flow_io import read_flow

    rng = np.random.default_rng(4)
    imdir = tmp_path / "imgs8"
    imdir.mkdir()
    from PIL import Image

    for i in range(10):  # 10 pairs, batch 8 -> one full + one short batch
        for k in (1, 2):
            arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(imdir / f"case{i:03d}_img{k}.png")

    out1 = tmp_path / "out1"
    outn = tmp_path / "outn"
    args = ["-m", "piv", "-v", "1", "-p", "-i", str(imdir), "--batch_size", "8"]
    run_cli.main(args + ["-o", str(out1)])
    run_cli.main(args + ["-o", str(outn), "--num_devices", "8"])

    flos1 = sorted((out1 / "PIV-LiteFlowNet-en" / "imgs8" / "flow").glob("*.flo"))
    flosn = sorted((outn / "PIV-LiteFlowNet-en" / "imgs8" / "flow").glob("*.flo"))
    assert len(flos1) == len(flosn) == 10
    for f1, fn in zip(flos1, flosn):
        np.testing.assert_allclose(read_flow(str(fn)), read_flow(str(f1)),
                                   atol=1e-5)


def test_run_cli_num_devices(tmp_path, model):
    """run.py --num_devices 2 produces the same .flo files as single device."""
    import sys

    sys.path.insert(0, "/root/repo")
    import run as run_cli
    from piv_liteflownet_tpu.utils.flow_io import read_flow

    rng = np.random.default_rng(2)
    imdir = tmp_path / "imgs"
    imdir.mkdir()
    from PIL import Image

    for i in range(3):
        for k in (1, 2):
            arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(imdir / f"case{i:03d}_img{k}.png")

    out1 = tmp_path / "out1"
    outn = tmp_path / "outn"
    args = ["-m", "piv", "-v", "1", "-p", "-i", str(imdir), "--batch_size", "2"]
    run_cli.main(args + ["-o", str(out1)])
    run_cli.main(args + ["-o", str(outn), "--num_devices", "2"])

    flos1 = sorted((out1 / "PIV-LiteFlowNet-en" / "imgs" / "flow").glob("*.flo"))
    flosn = sorted((outn / "PIV-LiteFlowNet-en" / "imgs" / "flow").glob("*.flo"))
    assert len(flos1) == len(flosn) == 3
    for f1, fn in zip(flos1, flosn):
        np.testing.assert_allclose(read_flow(str(fn)), read_flow(str(f1)), atol=1e-5)
