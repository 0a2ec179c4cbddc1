"""Attribution profiling: full v1 model with components ablated (honest harness)."""

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

import sys as _sys
SIZE, BATCH = 1024, 4
VERSION = int(_sys.argv[1]) if len(_sys.argv) > 1 else 1
BATCH = int(_sys.argv[2]) if len(_sys.argv) > 2 else 4
model = piv_liteflownet(version=VERSION)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params)

key = jax.random.PRNGKey(0)
img1 = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.bfloat16)
img2 = jax.random.uniform(jax.random.fold_in(key, 1), (BATCH, SIZE, SIZE, 3), jnp.bfloat16)

base = None
for ablate in [(), ("warpS",), ("warpR",), ("Rconv",), ("upcorr",), ("warp", "corr")]:
    cfg = dataclasses.replace(model.cfg, ablate=ablate)

    def fn(a, b, cfg=cfg):
        return forward(params, a, b, cfg, train=False)

    t = chained_time(fn, (img1, img2), n_lo=2, n_hi=6) * 1000 / BATCH
    if base is None:
        base = t
        print(f"full model: {t:.1f} ms/pair", flush=True)
    else:
        print(f"ablate {','.join(ablate):<28s}: {t:7.1f} ms/pair  (saves {base - t:6.1f})", flush=True)
