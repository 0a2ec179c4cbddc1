"""Does XLA's latency-hiding scheduler overlap two INDEPENDENT b=2 chains?

The r2 profile attributed ~25 ms/pair of conv scheduling loss at b=2 and
~39 ms/pair of descriptor-bound gathers; the M->S->R chain is serial, so the
MXU idles during gathers. Two independent half-batch chains in one jit give
the scheduler freedom to interleave chain A's gathers with chain B's convs.
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

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
VERSION = int(sys.argv[2]) if len(sys.argv) > 2 else 1

model = piv_liteflownet(version=VERSION)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params)
cfg = model.cfg

key = jax.random.PRNGKey(0)


def imgs(batch):
    img1 = jax.random.uniform(key, (batch, SIZE, SIZE, 3), jnp.bfloat16)
    img2 = jax.random.uniform(jax.random.fold_in(key, 1), (batch, SIZE, SIZE, 3), jnp.bfloat16)
    return img1, img2


def fused(a, b):
    return forward(params, a, b, cfg, train=False)


def split2(a, b):
    # two independent half-batch chains: scheduler may interleave them
    h = a.shape[0] // 2
    o1 = forward(params, a[:h], b[:h], cfg, train=False)
    o2 = forward(params, a[h:], b[h:], cfg, train=False)
    return jnp.concatenate([o1, o2], axis=0)


def split4(a, b):
    q = a.shape[0] // 4
    outs = [forward(params, a[i * q:(i + 1) * q], b[i * q:(i + 1) * q], cfg, train=False)
            for i in range(4)]
    return jnp.concatenate(outs, axis=0)


for name, fn, batch in (
    ("b2 fused   ", fused, 2),
    ("b4 fused   ", fused, 4),
    ("b4 as 2xb2 ", split2, 4),
    ("b4 as 4xb1 ", split4, 4),
    ("b8 as 4xb2 ", split4, 8),
    ("b2 as 2xb1 ", split2, 2),
):
    try:
        a, b = imgs(batch)
        t = chained_time(fn, (a, b), n_lo=2, n_hi=6)
        print(f"v{VERSION} {SIZE}^2 {name}: {t*1000/batch:7.2f} ms/pair = {batch/t:6.2f} pairs/s",
              flush=True)
    except Exception as e:
        print(f"v{VERSION} {SIZE}^2 {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
