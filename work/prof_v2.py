"""Granular v2 (and v1) attribution: ablation deltas + standalone NetC/pyramid.

Usage: python -u work/prof_v2.py [version] [batch] [size] > log 2>&1
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
from piv_liteflownet_tpu.models.liteflownet import forward, _netc
from piv_liteflownet_tpu.ops.resize import resize_bilinear

VERSION = int(sys.argv[1]) if len(sys.argv) > 1 else 2
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 4
SIZE = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
NETC_JOINT = sys.argv[4] if len(sys.argv) > 4 else "auto"

model = piv_liteflownet(version=VERSION)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params)

key = jax.random.PRNGKey(0)
img1 = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.bfloat16)
img2 = jax.random.uniform(jax.random.fold_in(key, 1), (BATCH, SIZE, SIZE, 3), jnp.bfloat16)

print(f"v{VERSION} b={BATCH} {SIZE}^2 bf16 netc_joint={NETC_JOINT}", flush=True)

# Standalone pieces first (separate jits, but small count)
def netc_sep(a, b):
    f1 = _netc(params, a, None)
    f2 = _netc(params, b, None)
    return f1[-1] + f2[-1]

def netc_joint(a, b):
    f = _netc(params, jnp.concatenate([a, b], axis=0), None)
    return f[-1]

def pyramid(a, b):
    outs = []
    for x in (a, b):
        p = x
        acc = None
        for li in range(1, 6):
            h, w = x.shape[1] // 2 ** li, x.shape[2] // 2 ** li
            p = resize_bilinear(p, h, w, None)
            acc = p.sum() if acc is None else acc + p.sum()
        outs.append(acc)
    return outs[0] + outs[1]

for name, fn in [("NetC separate", netc_sep), ("NetC joint", netc_joint),
                 ("image pyramid", pyramid)]:
    t = chained_time(fn, (img1, img2), n_lo=2, n_hi=6) * 1000 / BATCH
    print(f"standalone {name:<16s}: {t:7.2f} ms/pair", flush=True)

base = None
for ablate in [(), ("warpS",), ("warpR",), ("Mconv",), ("Rconv",), ("dist",),
               ("Rsmooth",), ("upcorr",), ("warp", "corr"), ("S",), ("R",)]:
    cfg = dataclasses.replace(model.cfg, ablate=ablate, netc_joint=NETC_JOINT)

    def fn(a, b, cfg=cfg):
        return forward(params, a, b, cfg, train=False)

    t = chained_time(fn, (img1, img2), n_lo=2, n_hi=6) * 1000 / BATCH
    if base is None:
        base = t
        print(f"full model: {t:.1f} ms/pair", flush=True)
    else:
        print(f"ablate {','.join(ablate):<28s}: {t:7.1f} ms/pair  (saves {base - t:6.1f})", flush=True)
