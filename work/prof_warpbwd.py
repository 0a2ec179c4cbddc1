"""Warp backward attribution at training shapes: what does the gather's
transpose (scatter-add) actually cost on device?

The r4 train ablation (work/train_ablate_packed.log) charges 44.4 ms/step
to warp fwd+bwd at 256^2 b8. The training trace's scatter rollup read 0.00
ms — suspicious. This measures, standalone, at train shapes:
  fwd            : backwarp forward
  fwd+img-grad   : grad wrt the warped image (the scatter-add path)
  fwd+flow-grad  : grad wrt the flow (gather + elementwise path)
  fwd+both       : full vjp

Usage: python -u work/prof_warpbwd.py [batch] [size] [chan] > log 2>&1
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/work")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench_lib import chained_time
from piv_liteflownet_tpu.ops.warp import backwarp

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 256
CHAN = int(sys.argv[3]) if len(sys.argv) > 3 else 32

key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (BATCH, SIZE, SIZE, CHAN), jnp.bfloat16)
flow = (jax.random.normal(jax.random.fold_in(key, 1),
                          (BATCH, SIZE, SIZE, 2), jnp.bfloat16) * 3)


def loss(img, flow):
    return jnp.sum(backwarp(img, flow).astype(jnp.float32) ** 2)


def fwd(img, flow):
    return backwarp(img, flow)


def g_img(img, flow):
    return jax.grad(loss, argnums=0)(img, flow)


def g_flow(img, flow):
    return jax.grad(loss, argnums=1)(img, flow)


def g_both(img, flow):
    return jax.grad(loss, argnums=(0, 1))(img, flow)


for name, fn in (("fwd", fwd), ("img-grad", g_img),
                 ("flow-grad", g_flow), ("both-grad", g_both)):
    t = chained_time(fn, (img, flow))
    print(f"warp {name:>10s} b={BATCH} {SIZE}^2 c{CHAN}: "
          f"{1e3 * t:7.2f} ms/batch", flush=True)
