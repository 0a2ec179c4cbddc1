"""rgb warp+norm kernel: standalone vs gather, then in-model v1 effect."""

import dataclasses
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/work")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench_lib import chained_time
from piv_liteflownet_tpu.models.factory import piv_liteflownet
from piv_liteflownet_tpu.models.liteflownet import forward
from piv_liteflownet_tpu.ops.pallas_rgb_warp import (
    rgb_warp_norm,
    rgb_warp_norm_gather,
    rgb_warp_norm_pallas,
)

key = jax.random.PRNGKey(0)

# ---- standalone: L1/L2 shapes, bf16, b=2 ----
for size in (1024, 512):
    b = 2
    img1 = jax.random.uniform(key, (b, size, size, 3), jnp.bfloat16)
    img2 = jax.random.uniform(jax.random.fold_in(key, 1), (b, size, size, 3), jnp.bfloat16)
    flow = (jax.random.uniform(jax.random.fold_in(key, 2), (b, size, size, 2),
                               jnp.float32) - 0.5) * 4.0

    for name, fn in (
        ("gather", rgb_warp_norm_gather),
        ("pallas", lambda a, c, f: rgb_warp_norm_pallas(a, c, f)),
        ("auto  ", rgb_warp_norm),
    ):
        try:
            t = chained_time(fn, (img1, img2, flow), n_lo=2, n_hi=10)
            print(f"standalone {size}^2 b{b} {name}: {t*1000/b:7.3f} ms/pair", flush=True)
        except Exception as e:
            print(f"standalone {size}^2 b{b} {name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

# correctness on device (bf16): pallas vs gather
import numpy as np
size = 512
img1 = jax.random.uniform(key, (1, size, size, 3), jnp.bfloat16)
img2 = jax.random.uniform(jax.random.fold_in(key, 1), (1, size, size, 3), jnp.bfloat16)
flow = (jax.random.uniform(jax.random.fold_in(key, 2), (1, size, size, 2), jnp.float32) - 0.5) * 4.0
g = np.asarray(rgb_warp_norm_gather(img1, img2, flow), np.float32)
p = np.asarray(rgb_warp_norm_pallas(img1, img2, flow), np.float32)
print(f"device parity pallas-vs-gather: max|d|={np.abs(g-p).max():.5f}", flush=True)

# ---- in-model ----
SIZE, BATCH = 1024, 2
model = piv_liteflownet(version=1)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params)
img1 = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.bfloat16)
img2 = jax.random.uniform(jax.random.fold_in(key, 1), (BATCH, SIZE, SIZE, 3), jnp.bfloat16)

for mode in ("gather", "pallas", "auto"):
    cfg = dataclasses.replace(model.cfg, rgb_norm=mode)

    def fn(a, b, cfg=cfg):
        return forward(params, a, b, cfg, train=False)

    try:
        t = chained_time(fn, (img1, img2), n_lo=2, n_hi=6)
        print(f"v1 {SIZE}^2 b{BATCH} rgb_norm={mode}: {t*1000/BATCH:7.2f} ms/pair "
              f"= {BATCH/t:6.2f} pairs/s", flush=True)
    except Exception as e:
        print(f"v1 {SIZE}^2 b{BATCH} rgb_norm={mode}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
