"""Beyond-HBM-resolution spatial sharding exercise (VERDICT r3 #9).

Runs H-sharded inference at 2048^2..4096^2 on the virtual 8-device CPU mesh
(the same GSPMD program a real multi-chip TPU slice would execute) and checks
parity against the unsharded forward where the single "device" can still hold
it. This validates the scale story of SURVEY §5: the reference destructively
crops/resizes big frames (reference inference.py:39-49, src/datasets.py:307-315);
we shard H across chips instead.

Usage: python work/prof_spatial_hires.py [size] [version] [parity:0|1]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count="
                      + os.environ.get("PIV_NDEV", "8"))

import numpy as np


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    version = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    parity = bool(int(sys.argv[3])) if len(sys.argv) > 3 else True
    ndev = int(os.environ.get("PIV_NDEV", "8"))

    import jax.numpy as jnp

    from piv_liteflownet_tpu.models.factory import piv_liteflownet
    from piv_liteflownet_tpu.parallel.mesh import make_mesh
    from piv_liteflownet_tpu.parallel.spatial import spatial_estimate

    print(f"devices: {len(jax.devices())}  size={size} v{version} parity={parity}",
          flush=True)
    model = piv_liteflownet(version=version)
    rng = np.random.default_rng(0)
    img1 = rng.random((1, size, size, 3), dtype=np.float32)
    img2 = rng.random((1, size, size, 3), dtype=np.float32)

    mesh = make_mesh(ndev, axes=("spatial",))
    t0 = time.time()
    out = spatial_estimate(model, img1, img2, mesh, halo=32, halo_warp=True)
    out = np.asarray(out)
    print(f"sharded   {size}^2 v{version}: {time.time()-t0:8.1f}s  "
          f"|flow| mean {np.abs(out).mean():.4f} max {np.abs(out).max():.4f}",
          flush=True)
    assert np.isfinite(out).all()

    if parity:
        t0 = time.time()
        ref = np.asarray(model(jnp.asarray(img1), jnp.asarray(img2)))
        print(f"unsharded {size}^2 v{version}: {time.time()-t0:8.1f}s", flush=True)
        epe = np.sqrt(((out - ref) ** 2).sum(-1))
        print(f"parity: max EPE {epe.max():.2e}  mean {epe.mean():.2e}", flush=True)
        assert epe.max() <= 5e-4, epe.max()
    print("OK", flush=True)


if __name__ == "__main__":
    main()
