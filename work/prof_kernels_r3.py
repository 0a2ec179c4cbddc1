"""Round-3 kernel experiments: fused rgb-norm + tent feature warp.

Standalone kernel timings, then the in-model matrix on v1 b2 @1024^2.
"""

import dataclasses
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/work")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench_lib import chained_time
from piv_liteflownet_tpu.models.factory import piv_liteflownet
from piv_liteflownet_tpu.models.liteflownet import forward
from piv_liteflownet_tpu.ops.pallas_feat_warp import feat_warp_pallas
from piv_liteflownet_tpu.ops.pallas_rgb_warp import (
    rgb_warp_norm_gather,
    rgb_warp_norm_pallas,
)
from piv_liteflownet_tpu.ops.warp import backwarp

key = jax.random.PRNGKey(0)


def dep(fn):
    """Make every argument depend on the (perturbed) first one, so the
    chained-timing scan cannot loop-hoist the expensive ops that only read
    the later args (XLA loop-invariant code motion — the gather of img2 is
    otherwise computed ONCE outside the chain)."""
    def g(a, *rest):
        eps = jnp.sum(a).astype(jnp.float32) * jnp.float32(1e-30)
        return fn(a, *[r + eps.astype(r.dtype) for r in rest])
    return g


def smooth_flow(b, h, w, mag=3.0):
    f = (jax.random.uniform(key, (b, h // 16, w // 16, 2), jnp.float32) - 0.5) * 2 * mag
    f = jax.image.resize(f, (b, h, w, 2), "linear")
    return f


# ---- standalone: rgb norm ----
for size in (1024, 512):
    b = 2
    img1 = jax.random.uniform(key, (b, size, size, 3), jnp.bfloat16)
    img2 = jax.random.uniform(jax.random.fold_in(key, 1), (b, size, size, 3), jnp.bfloat16)
    flow = smooth_flow(b, size, size)
    for name, fn in (("gather", rgb_warp_norm_gather),
                     ("pallas", lambda a, c, f: rgb_warp_norm_pallas(a, c, f))):
        try:
            t = chained_time(dep(fn), (img1, img2, flow), n_lo=2, n_hi=10)
            print(f"rgbnorm {size}^2 b{b} {name}: {t*1000/b:7.3f} ms/pair", flush=True)
        except Exception as e:
            print(f"rgbnorm {size}^2 b{b} {name}: FAILED {type(e).__name__}: {str(e)[:250]}",
                  flush=True)
    if size == 512:
        g = np.asarray(rgb_warp_norm_gather(img1, img2, flow), np.float32)
        p = np.asarray(rgb_warp_norm_pallas(img1, img2, flow), np.float32)
        print(f"rgbnorm device parity: max|d|={np.abs(g-p).max():.5f}", flush=True)

# ---- standalone: feature tent warp (S-warp shapes) ----
for size, c in ((1024, 64), (512, 64)):
    b = 2
    img = jax.random.uniform(key, (b, size, size, c), jnp.bfloat16)
    flow = smooth_flow(b, size, size)
    for name, fn in (
        ("gather ", lambda a, f: backwarp(a, f)),
        ("tent r2", lambda a, f: feat_warp_pallas(a, f, r=2)),
        ("tent r4", lambda a, f: feat_warp_pallas(a, f, r=4)),
    ):
        try:
            t = chained_time(dep(fn), (img, flow), n_lo=2, n_hi=10)
            print(f"featwarp {size}^2xc{c} b{b} {name}: {t*1000/b:7.3f} ms/pair", flush=True)
        except Exception as e:
            print(f"featwarp {size}^2xc{c} b{b} {name}: FAILED {type(e).__name__}: {str(e)[:250]}",
                  flush=True)
    if size == 512:
        g = np.asarray(backwarp(img, flow), np.float32)
        p = np.asarray(feat_warp_pallas(img, flow, r=2), np.float32)
        print(f"featwarp device parity r2: max|d|={np.abs(g-p).max():.5f}", flush=True)

# ---- in-model matrix ----
SIZE, BATCH = 1024, 2
model = piv_liteflownet(version=1)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params)
img1 = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.bfloat16)
img2 = jax.random.uniform(jax.random.fold_in(key, 1), (BATCH, SIZE, SIZE, 3), jnp.bfloat16)

for label, kw in (
    ("baseline           ", {}),
    ("rgb=pallas         ", dict(rgb_norm="pallas")),
    ("rgb=auto           ", dict(rgb_norm="auto")),
    ("tent r4            ", dict(warp_impl="tent", warp_residual=4)),
    ("tent r2            ", dict(warp_impl="tent", warp_residual=2)),
    ("tent r2 + rgb=auto ", dict(warp_impl="tent", warp_residual=2, rgb_norm="auto")),
    ("tent r2 + rgb=palls", dict(warp_impl="tent", warp_residual=2, rgb_norm="pallas")),
):
    cfg = dataclasses.replace(model.cfg, **kw)

    def fn(a, b, cfg=cfg):
        return forward(params, a, b, cfg, train=False)

    try:
        t = chained_time(fn, (img1, img2), n_lo=2, n_hi=6)
        print(f"v1 {SIZE}^2 b{BATCH} {label}: {t*1000/BATCH:7.2f} ms/pair "
              f"= {BATCH/t:6.2f} pairs/s", flush=True)
    except Exception as e:
        print(f"v1 {SIZE}^2 b{BATCH} {label}: FAILED {type(e).__name__}: {str(e)[:250]}",
              flush=True)
