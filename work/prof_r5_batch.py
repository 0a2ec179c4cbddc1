"""Intermediate batch sweep for the serving configs (r5): b4 is the record
holder and b8 regresses (half-split warp + HBM pressure), but b5/b6/b7 were
never probed — XLA's large-frame conv tiling wants batch >= 8 while the
packed-warp transient wants small batches; the optimum may sit between.

Usage: python work/prof_r5_batch.py [version=2] [size=1024]
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/work")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from bench_lib import chained_time
from piv_liteflownet_tpu.models.factory import piv_liteflownet
from piv_liteflownet_tpu.models.liteflownet import forward

VERSION = int(sys.argv[1]) if len(sys.argv) > 1 else 2
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

model = piv_liteflownet(version=VERSION)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params)
cfg = model.cfg

for batch in (4, 5, 6, 7):
    key = jax.random.PRNGKey(0)
    img1 = jax.random.uniform(key, (batch, SIZE, SIZE, 3), jnp.bfloat16)
    img2 = jax.random.uniform(jax.random.fold_in(key, 1),
                              (batch, SIZE, SIZE, 3), jnp.bfloat16)

    def fn(a, b):
        return forward(params, a, b, cfg, train=False)

    try:
        t = chained_time(fn, (img1, img2), n_lo=2, n_hi=6) * 1000 / batch
        print(f"v{VERSION} b{batch} {SIZE}^2: {t:7.2f} ms/pair "
              f"({1000/t:6.2f} pairs/s)", flush=True)
    except Exception as e:
        print(f"v{VERSION} b{batch}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
