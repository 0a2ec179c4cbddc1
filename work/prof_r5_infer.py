"""One in-model inference measurement (eval forward, bf16, chained method).

Usage: python work/prof_r5_infer.py [version=1] [batch=4] [size=1024]
Env knobs under test ride the package's own trace-time flags
(PIV_RESIZE_HALF, PIV_CONV_WGRAD, ...).
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

VERSION = int(sys.argv[1]) if len(sys.argv) > 1 else 1
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 4
SIZE = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

model = piv_liteflownet(version=VERSION)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params)
cfg = model.cfg

key = jax.random.PRNGKey(0)
img1 = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.bfloat16)
img2 = jax.random.uniform(jax.random.fold_in(key, 1),
                          (BATCH, SIZE, SIZE, 3), jnp.bfloat16)


def fn(a, b):
    return forward(params, a, b, cfg, train=False)


t = chained_time(fn, (img1, img2), n_lo=2, n_hi=6) * 1000 / BATCH
print(f"v{VERSION} b{BATCH} {SIZE}^2: {t:7.2f} ms/pair ({1000/t:6.2f} pairs/s)",
      flush=True)
