"""netc_joint on/off across resolutions, in-model (r4: the b4 1024^2 probe
showed joint LOSES ~6 ms/pair in-model despite winning ~0.4 ms standalone —
adjudicate the auto heuristic per size).

Usage: python -u work/prof_netc.py [version] [batch] [sizes_csv] > log 2>&1
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
SIZES = [int(s) for s in (sys.argv[3] if len(sys.argv) > 3 else "256,512,1024").split(",")]

model = piv_liteflownet(version=VERSION)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params)
key = jax.random.PRNGKey(0)

for size in SIZES:
    img1 = jax.random.uniform(key, (BATCH, size, size, 3), jnp.bfloat16)
    img2 = jax.random.uniform(jax.random.fold_in(key, 1),
                              (BATCH, size, size, 3), jnp.bfloat16)
    for mode in ("on", "off"):
        cfg = dataclasses.replace(model.cfg, netc_joint=mode)

        def fn(a, b, cfg=cfg):
            return forward(params, a, b, cfg, train=False)

        try:
            t = chained_time(fn, (img1, img2), n_lo=2, n_hi=6) * 1000 / BATCH
            print(f"v{VERSION} b={BATCH} {size}^2 netc_joint={mode:<4s}: "
                  f"{t:7.2f} ms/pair = {1000/t:7.2f} pairs/s", flush=True)
        except Exception as e:
            print(f"v{VERSION} b={BATCH} {size}^2 netc_joint={mode:<4s}: FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)
