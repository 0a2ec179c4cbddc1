"""Round-5 v2 inference WALL attribution at the serving shape (b4 1024^2
bf16): complete ablation decomposition before building anything (VERDICT r5
#2; the r4o busy-vs-wall lesson).

Known bill (BASELINE.md r3 ablations): warpS 6.3 | warpR 0.5 | Rconv 5.7 |
corr 3.9 | S-convs ~6.6 of 40.0 — leaving ~17.5 "rest" never attributed.
This probe adds the missing rows: NetC, M-convs, dist convs, R-smooth,
upcorr, and the S/R modules wholesale, so the 40 ms is fully decomposed.

Usage: python work/prof_r5_v2wall.py [version=2] [batch=4] [size=1024]
"""

import dataclasses
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
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 4
SIZE = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

model = piv_liteflownet(version=VERSION)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params)

key = jax.random.PRNGKey(0)
img1 = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.bfloat16)
img2 = jax.random.uniform(jax.random.fold_in(key, 1), (BATCH, SIZE, SIZE, 3),
                          jnp.bfloat16)

ABLATIONS = [
    (),
    ("NetC",),
    ("Mconv",),
    ("upcorr",),
    ("corr",),
    ("warpS",),
    ("warpR",),
    ("Rconv",),
    ("dist",),
    ("Rsmooth",),
    ("S",),
    ("R",),
    ("warp", "corr"),
]

base = None
for ablate in ABLATIONS:
    cfg = dataclasses.replace(model.cfg, ablate=ablate)

    def fn(a, b, cfg=cfg):
        return forward(params, a, b, cfg, train=False)

    try:
        t = chained_time(fn, (img1, img2), n_lo=2, n_hi=6) * 1000 / BATCH
    except Exception as e:
        print(f"ablate {','.join(ablate):<24s}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        continue
    if base is None:
        base = t
        print(f"v{VERSION} full model b{BATCH} {SIZE}^2: {t:.2f} ms/pair "
              f"({BATCH and 1000/t:.2f} pairs/s)", flush=True)
    else:
        print(f"ablate {','.join(ablate):<24s}: {t:7.2f} ms/pair "
              f"(wall delta {base - t:6.2f})", flush=True)
