"""Correlation microbench on device: XLA shift-stack vs planar Pallas.

Usage: python -u work/prof_corr.py > log 2>&1
Shapes = the actual per-level corr inputs of v1/v2 @1024^2 (post phase-subsample).
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/work")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench_lib import chained_time
from piv_liteflownet_tpu.ops.correlation import correlation_xla
from piv_liteflownet_tpu.ops.pallas_corr import correlation_planar_pallas

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
# (h, w, c): v1 L1s2=512^2x64, L2s2=256^2x64, L3s2=128^2x64, L4=128^2x96
SHAPES = [(512, 512, 64), (256, 256, 64), (128, 128, 64), (128, 128, 96)]

for h, w, c in SHAPES:
    key = jax.random.PRNGKey(0)
    f1 = jax.random.normal(key, (B, h, w, c), jnp.float32).astype(jnp.bfloat16)
    f2 = jax.random.normal(jax.random.fold_in(key, 1), (B, h, w, c), jnp.float32).astype(jnp.bfloat16)

    t_x = chained_time(lambda a, b: correlation_xla(a, b, 1), (f1, f2)) * 1000
    print(f"[{B},{h},{w},{c}] xla    : {t_x:7.2f} ms ({t_x/B:.2f}/pair)", flush=True)
    try:
        t_p = chained_time(lambda a, b: correlation_planar_pallas(a, b), (f1, f2)) * 1000
        print(f"[{B},{h},{w},{c}] planar : {t_p:7.2f} ms ({t_p/B:.2f}/pair)  "
              f"speedup {t_x/t_p:.2f}x", flush=True)
    except Exception as e:
        print(f"[{B},{h},{w},{c}] planar FAILED: {type(e).__name__}: {e}", flush=True)
