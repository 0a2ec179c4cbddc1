"""Feature-warp microbench on device: packed gather vs planar tent kernel.

Usage: python -u work/prof_fwarp.py [batch] > log 2>&1
Shapes = the v1 S-warp inputs @1024^2 (L1 ext-features 64ch full-res etc).
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/work")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from bench_lib import chained_time
from piv_liteflownet_tpu.ops.pallas_feat_warp import feat_warp_bounds_ok, feat_warp_pallas
from piv_liteflownet_tpu.ops.warp import backwarp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
SHAPES = [(1024, 1024, 64), (512, 512, 64), (256, 256, 64), (128, 128, 96)]

for h, w, c in SHAPES:
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (B, h, w, c), jnp.bfloat16)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    u = 5.0 + 1.2 * jnp.sin(xx / 60.0) + 0.4 * jnp.cos(yy / 35.0)
    v = -3.0 + 0.8 * jnp.cos(xx / 50.0) + 0.5 * jnp.sin(yy / 25.0)
    flow = jnp.broadcast_to(jnp.stack([u + 0 * yy, v + 0 * xx], -1), (B, h, w, 2))
    print(f"[{B},{h},{w},{c}] bounds_ok={bool(feat_warp_bounds_ok(flow))}", flush=True)

    t_g = chained_time(lambda a, f: backwarp(a, f), (img, flow)) * 1000
    print(f"[{B},{h},{w},{c}] gather : {t_g:7.2f} ms ({t_g/B:.2f}/pair)", flush=True)
    try:
        got = np.asarray(feat_warp_pallas(img, flow).astype(jnp.float32))
        ref = np.asarray(backwarp(img, flow).astype(jnp.float32))
        err = np.abs(got - ref).max()
        t_t = chained_time(lambda a, f: feat_warp_pallas(a, f), (img, flow)) * 1000
        print(f"[{B},{h},{w},{c}] tent   : {t_t:7.2f} ms ({t_t/B:.2f}/pair)  "
              f"speedup {t_g/t_t:.2f}x  max|err| {err:.2e}", flush=True)
    except Exception as e:
        print(f"[{B},{h},{w},{c}] tent FAILED: {type(e).__name__}: {e}", flush=True)
