"""Re-measure v1/v2 end-to-end per-pair time on the real chip (chained method)."""

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

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 8
VERSIONS = [int(v) for v in (sys.argv[3].split(",") if len(sys.argv) > 3 else ["1"])]
WARP = sys.argv[4] if len(sys.argv) > 4 else None

for version in VERSIONS:
    import dataclasses
    model = piv_liteflownet(version=version)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params)
    cfg = model.cfg if WARP is None else dataclasses.replace(model.cfg, warp_impl=WARP)

    def fn(a, b):
        return forward(params, a, b, cfg, train=False)

    key = jax.random.PRNGKey(0)
    img1 = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.bfloat16)
    img2 = jax.random.uniform(jax.random.fold_in(key, 1), (BATCH, SIZE, SIZE, 3), jnp.bfloat16)

    t = chained_time(fn, (img1, img2), n_lo=2, n_hi=6)
    print(f"v{version} b={BATCH} {SIZE}^2 bf16 warp={WARP or cfg.warp_impl}: "
          f"{t*1000/BATCH:.2f} ms/pair = {BATCH/t:.2f} pairs/s", flush=True)
