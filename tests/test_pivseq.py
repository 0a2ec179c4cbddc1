"""Packed .pivseq ingest: format round-trip, Run-parity pairing, native
loader parity (VERDICT r4 #3: the decode-free inference feed behind the
multi-chip serving projection)."""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from piv_liteflownet_tpu.data import native
from piv_liteflownet_tpu.data.datasets import Run
from piv_liteflownet_tpu.data.pivseq import (PivseqReader, PivseqRun,
                                             pack_directory, write_pivseq)


def _make_dir(tmp_path, n=6, size=(24, 32), mono=False, pair=False, bits=8):
    rng = np.random.default_rng(0)
    d = tmp_path / "frames"
    d.mkdir()
    for i in range(n):
        if mono:
            arr = (rng.random(size) * (255 if bits == 8 else 65535)).astype(
                np.uint8 if bits == 8 else np.uint16)
            im = Image.fromarray(arr, mode="L" if bits == 8 else "I;16")
        else:
            arr = (rng.random((*size, 3)) * 255).astype(np.uint8)
            im = Image.fromarray(arr)
        if pair:
            im.save(d / f"f{i:03d}_img1.png")
            im2 = Image.fromarray(np.roll(np.asarray(im), 1, axis=1))
            im2.save(d / f"f{i:03d}_img2.png")
        else:
            im.save(d / f"f{i:03d}.png")
    return str(d)


def test_pack_and_read_matches_pil(tmp_path):
    d = _make_dir(tmp_path, n=4)
    out = pack_directory(d)
    r = PivseqReader(out)
    assert r.n_frames == 4 and r.c == 3 and r.dtype_id == 0
    files = sorted(os.listdir(d))
    assert r.names == files
    for i, f in enumerate(files):
        ref = np.asarray(Image.open(os.path.join(d, f)).convert("RGB"),
                         np.float32) / 255.0
        np.testing.assert_array_equal(r.frame(i), ref)


def test_mono_sources_collapse_to_one_channel(tmp_path):
    d = _make_dir(tmp_path, n=3, mono=True)
    out = pack_directory(d)
    r = PivseqReader(out)
    assert r.c == 1
    ref = np.asarray(Image.open(os.path.join(d, sorted(os.listdir(d))[0]))
                     .convert("RGB"), np.float32) / 255.0
    np.testing.assert_array_equal(r.frame(0), ref)


def test_16bit_sources_pack_uint16(tmp_path):
    d = _make_dir(tmp_path, n=2, mono=True, bits=16)
    out = pack_directory(d)
    r = PivseqReader(out)
    assert r.dtype_id == 1 and r.c == 1
    f0 = sorted(os.listdir(d))[0]
    ref = (np.asarray(Image.open(os.path.join(d, f0)), np.float32)
           / 65535.0)[..., None].repeat(3, axis=2)
    np.testing.assert_array_equal(r.frame(0), ref)


@pytest.mark.parametrize("is_pair", [False, True])
def test_pivseqrun_matches_run(tmp_path, is_pair):
    d = _make_dir(tmp_path, n=4, pair=is_pair)
    out = pack_directory(d)
    ref_ds = Run(d, is_pair=is_pair)
    got_ds = PivseqRun(out, is_pair=is_pair)
    assert len(got_ds) == len(ref_ds) > 0
    for k in range(len(ref_ds)):
        (r1, r2), rname = ref_ds[k]
        (g1, g2), gname = got_ds[k]
        assert gname == os.path.basename(rname)
        np.testing.assert_array_equal(g1, r1)
        np.testing.assert_array_equal(g2, r2)


def test_pivseqrun_slicing(tmp_path):
    d = _make_dir(tmp_path, n=6)
    out = pack_directory(d)
    ref = Run(d, is_pair=False, n_images=3, start_at=2)
    got = PivseqRun(out, is_pair=False, n_images=3, start_at=2)
    assert [tuple(map(os.path.basename, p)) for p in ref.pairs] == got.pairs


@pytest.mark.skipif(native.build_library() is None,
                    reason="g++ build unavailable")
def test_native_seq_loader_matches_reader(tmp_path):
    d = _make_dir(tmp_path, n=7)
    out = pack_directory(d)
    ds = PivseqRun(out, is_pair=False)
    from piv_liteflownet_tpu.data.native import NativeSeqLoader

    loader = NativeSeqLoader(ds, batch_size=3, threads=2)
    seen = 0
    for (b1, b2), names in loader:
        for i, name in enumerate(names):
            (r1, r2), rname = ds[seen]
            assert name == rname
            np.testing.assert_array_equal(b1[i], r1)
            np.testing.assert_array_equal(b2[i], r2)
            seen += 1
    loader.close()
    assert seen == len(ds)


@pytest.mark.skipif(native.build_library() is None,
                    reason="g++ build unavailable")
def test_native_seq_frame_matches_python(tmp_path):
    d = _make_dir(tmp_path, n=2, mono=True, bits=16)
    out = pack_directory(d)
    r = PivseqReader(out)
    got = native.seq_read_frame(out, 1, r.h, r.w)
    np.testing.assert_array_equal(got, r.frame(1))


def test_native_loader_for_picks_seq(tmp_path):
    d = _make_dir(tmp_path, n=4)
    out = pack_directory(d)
    ds = PivseqRun(out)
    from piv_liteflownet_tpu.data.loader import native_loader_for

    loader = native_loader_for(ds, batch_size=2)
    if native.build_library() is None:
        assert loader is None
        return
    assert type(loader).__name__ == "NativeSeqLoader"
    assert len(loader) == 2  # 3 pairs -> batches of 2
    loader.close()


def test_pack_cli(tmp_path):
    d = _make_dir(tmp_path, n=3)
    out = str(tmp_path / "packed.pivseq")
    r = subprocess.run(
        [sys.executable, "-m", "piv_liteflownet_tpu.data.pivseq", d, out],
        capture_output=True, text=True, timeout=120,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "packed 3 frames" in r.stdout
    assert PivseqReader(out).n_frames == 3
