"""In-model adjudication of lastconv_impl (the 1x1+shift flow heads).

Usage: python -u work/prof_lastconv_model.py [version] [batch] [size]
"""

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

VERSION = int(sys.argv[1]) if len(sys.argv) > 1 else 1
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 4
SIZE = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

model = piv_liteflownet(version=VERSION)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params)

key = jax.random.PRNGKey(0)
img1 = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.bfloat16)
img2 = jax.random.uniform(jax.random.fold_in(key, 1), (BATCH, SIZE, SIZE, 3), jnp.bfloat16)

CONFIGS = [
    dict(lastconv_impl="direct"),
    dict(lastconv_impl="shift"),
    dict(lastconv_impl="shift", warp_impl="tent!"),
]

for over in CONFIGS:
    cfg = dataclasses.replace(model.cfg, **over)

    def fn(a, b, cfg=cfg):
        return forward(params, a, b, cfg, train=False)

    name = ",".join(f"{k}={v}" for k, v in over.items()) or "baseline"
    try:
        t = chained_time(fn, (img1, img2), n_lo=2, n_hi=6) * 1000 / BATCH
        print(f"v{VERSION} b={BATCH} {SIZE}^2 {name:<40s}: {t:7.1f} ms/pair "
              f"= {1000/t:6.2f} pairs/s", flush=True)
    except Exception as e:
        print(f"v{VERSION} b={BATCH} {SIZE}^2 {name:<40s}: FAILED "
              f"{type(e).__name__}: {e}", flush=True)
