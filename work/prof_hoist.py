"""Measurement-integrity probe: does XLA hoist the loop-invariant img2
branch (NetC(f2) + pyramid) out of the chained-timing scan?

Every in-model number so far perturbs only img1 inside the chain
(make_chained threads the carry through args[0] alone). If XLA's
while-loop LICM hoists the img2-only subtree, those numbers under-count
by the NetC-f2 cost AND the netc_joint=off advantage measured in the r4
battery is a harness artifact (joint NetC consumes the perturbed x, so
nothing hoists; separate NetC leaves the f2 branch invariant).

A/B: same model, same method, with and without threading the carry
through img2. Equal times -> no hoisting, record stands. dep slower ->
artifact confirmed, fix the harness everywhere and re-baseline.

Usage: python -u work/prof_hoist.py [version=1] [batch=4] [size=1024]
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
SIZE = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

for joint in ("auto", "off"):
    model = piv_liteflownet(version=VERSION)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params)
    cfg = dataclasses.replace(model.cfg, netc_joint=joint)

    def plain(a, b):
        return forward(params, a, b, cfg, train=False)

    def dep2(a, b):
        # thread the carry through img2 as well: nothing is loop-invariant
        eps = jnp.sum(a).astype(jnp.float32) * jnp.float32(1e-30)
        return forward(params, a, b + eps.astype(b.dtype), cfg, train=False)

    key = jax.random.PRNGKey(0)
    img1 = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.bfloat16)
    img2 = jax.random.uniform(jax.random.fold_in(key, 1), (BATCH, SIZE, SIZE, 3),
                              jnp.bfloat16)

    for name, fn in (("img1-only(harness-as-is)", plain), ("img1+img2(dep)", dep2)):
        t = chained_time(fn, (img1, img2), n_lo=2, n_hi=6)
        print(f"v{VERSION} b={BATCH} {SIZE}^2 netc_joint={joint:4s} {name:26s}: "
              f"{t*1000/BATCH:7.2f} ms/pair", flush=True)
