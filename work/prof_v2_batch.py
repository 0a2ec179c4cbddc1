"""v2 batch sweep at 1024^2 (r4: bench only records b4; v2's quarter-res
decode may leave MXU batch-starved — probe b4/b8/b16 per-pair throughput).

Usage: python -u work/prof_v2_batch.py [version] [batches_csv] [size]
"""

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

VERSION = int(sys.argv[1]) if len(sys.argv) > 1 else 2
BATCHES = [int(b) for b in (sys.argv[2] if len(sys.argv) > 2 else "4,8,16").split(",")]
SIZE = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

model = piv_liteflownet(version=VERSION)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params)
key = jax.random.PRNGKey(0)

for batch in BATCHES:
    img1 = jax.random.uniform(key, (batch, SIZE, SIZE, 3), jnp.bfloat16)
    img2 = jax.random.uniform(jax.random.fold_in(key, 1),
                              (batch, SIZE, SIZE, 3), jnp.bfloat16)

    def fn(a, b):
        return forward(params, a, b, model.cfg, train=False)

    try:
        t = chained_time(fn, (img1, img2), n_lo=2, n_hi=6) * 1000 / batch
        print(f"v{VERSION} b={batch} {SIZE}^2: {t:7.2f} ms/pair = "
              f"{1000/t:7.2f} pairs/s", flush=True)
    except Exception as e:
        print(f"v{VERSION} b={batch} {SIZE}^2: FAILED "
              f"{type(e).__name__}: {str(e)[:160]}", flush=True)
