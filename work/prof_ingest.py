"""Ingest throughput: native C++ pthread loader vs Python BatchLoader.

Host-side only (no TPU): generates a 1024^2 PGM pair dataset in /tmp and
times a full pass through each loader.
"""

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

N_PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 40
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
BATCH = 4

root = f"/tmp/ingest_bench_{SIZE}"
if not os.path.isdir(root) or len(os.listdir(root)) != 2 * N_PAIRS:
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    from PIL import Image

    rng = np.random.default_rng(0)
    for i in range(N_PAIRS):
        for tag in ("img1", "img2"):
            arr = (rng.random((SIZE, SIZE)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(root, f"p{i:04d}_{tag}.pgm"))
    print(f"wrote {N_PAIRS} pairs of {SIZE}^2 pgm")

from piv_liteflownet_tpu.data.datasets import Run
from piv_liteflownet_tpu.data.loader import BatchLoader, native_loader_for

ds = Run(root=root, is_pair=True)


def drain(loader):
    n = 0
    t0 = time.perf_counter()
    for (im1, im2), names in loader:
        n += im1.shape[0]
        assert im1.dtype == np.float32
    dt = time.perf_counter() - t0
    return n, dt


for name, make in (
    ("python", lambda: BatchLoader(ds, batch_size=BATCH, num_workers=8)),
    ("native", lambda: native_loader_for(ds, BATCH, num_workers=8)),
):
    best = None
    for _ in range(3):
        loader = make()
        assert loader is not None, name
        n, dt = drain(loader)
        if hasattr(loader, "close"):
            loader.close()
        best = dt if best is None else min(best, dt)
    print(f"{name}: {n} pairs in {best:.3f}s = {n/best:.1f} pairs/s "
          f"({n*2*SIZE*SIZE/best/1e6:.0f} Mpx/s decoded)", flush=True)
