"""Packed vs PNG inference ingest at 1024^2 (VERDICT r5 #3).

Measures, on this host:
  - .pivseq packed ingest (NativeSeqLoader) at threads 1/2/4/8
  - .pivseq python-side reader (numpy memmap fallback) single-thread
  - PNG ingest (NativeBatchLoader) for the baseline ~8 pairs/s/core figure

NOTE this rig has ONE cpu core (nproc=1): the thread sweep shows intra-core
scheduling effects only; cross-core scaling is arithmetic (rates are per-core
and the loader is shared-nothing per batch). The serving-feasibility section
in BASELINE.md does that arithmetic.

Usage: python work/prof_ingest_packed.py [n_frames=64] [size=1024]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
BATCH = 4
TMP = "/tmp/ingest_packed"


def make_frames():
    from PIL import Image

    os.makedirs(TMP, exist_ok=True)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(N):
        p = os.path.join(TMP, f"f{i:04d}.png")
        paths.append(p)
        if not os.path.isfile(p):
            # realistic particle-ish content (PNG size/deflate work matters)
            base = rng.random((SIZE // 8, SIZE // 8))
            img = np.kron(base, np.ones((8, 8)))
            img = (255 * (img + 0.15 * rng.random((SIZE, SIZE)))
                   / 1.15).astype(np.uint8)
            Image.fromarray(img, mode="L").save(p)
    return paths


def time_loader(loader, n_pairs):
    t0 = time.perf_counter()
    seen = 0
    for (b1, b2), names in loader:
        seen += len(names)
        # touch the data like a consumer would (device_put reads it all)
        _ = b1[0, 0, 0, 0] + b2[0, 0, 0, 0]
    dt = time.perf_counter() - t0
    assert seen == n_pairs, (seen, n_pairs)
    return n_pairs / dt


def main():
    from piv_liteflownet_tpu.data.datasets import Run
    from piv_liteflownet_tpu.data.loader import BatchLoader
    from piv_liteflownet_tpu.data.native import (NativeBatchLoader,
                                                 NativeSeqLoader, get_lib)
    from piv_liteflownet_tpu.data.pivseq import PivseqReader, PivseqRun, \
        pack_directory

    assert get_lib() is not None, "libpivio build failed"
    make_frames()
    seq_path = TMP + ".pivseq"
    if not os.path.isfile(seq_path):
        t0 = time.perf_counter()
        pack_directory(TMP, seq_path)
        print(f"pack: {N} frames in {time.perf_counter() - t0:.1f}s "
              f"({os.path.getsize(seq_path) / 1e6:.0f} MB)", flush=True)

    ds = PivseqRun(seq_path)
    n_pairs = len(ds)

    # warm the page cache once
    PivseqReader(seq_path)._mm[:].sum()

    for threads in (1, 2, 4, 8):
        ld = NativeSeqLoader(ds, BATCH, threads=threads)
        rate = time_loader(ld, n_pairs)
        ld.close()
        print(f"packed native threads={threads}: {rate:7.1f} pairs/s "
              f"({rate * 2 * SIZE * SIZE * 12 / 1e9:.2f} GB/s decoded f32 out)",
              flush=True)

    # python fallback (memmap reader through BatchLoader, 2 workers)
    rate = time_loader(BatchLoader(ds, batch_size=BATCH, num_workers=2),
                       n_pairs)
    print(f"packed python  (memmap) : {rate:7.1f} pairs/s", flush=True)

    # PNG baseline (native decoder path)
    run = Run(TMP)
    for threads in (1, 2, 4):
        ld = NativeBatchLoader(run.pairs, BATCH, SIZE, SIZE, threads=threads)
        rate = time_loader(ld, len(run.pairs))
        ld.close()
        print(f"png    native threads={threads}: {rate:7.1f} pairs/s",
              flush=True)


if __name__ == "__main__":
    main()
