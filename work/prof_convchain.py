"""Fused conv-chain kernel: standalone S-stack timing + in-model v1 matrix."""

import dataclasses
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/work")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from bench_lib import chained_time
from piv_liteflownet_tpu.models.factory import piv_liteflownet
from piv_liteflownet_tpu.models.liteflownet import forward
from piv_liteflownet_tpu.ops.pallas_conv import conv_chain_pallas, conv_chain_xla

key = jax.random.PRNGKey(0)


def dep(fn):
    def g(a, *rest):
        eps = jnp.sum(a).astype(jnp.float32) * jnp.float32(1e-30)
        return fn(a, *[r + eps.astype(r.dtype) for r in rest])
    return g


# standalone: the v1 S stack at L1 shape (b2 1024^2), bf16
rng = np.random.default_rng(0)
b, h, w = 2, 1024, 1024
shapes = [(3, 130, 128), (3, 128, 64), (3, 64, 32), (7, 32, 2)]
parts = [jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32) * 0.3
                     ).astype(jnp.bfloat16) for c in (64, 64, 2)]
weights, biases = [], []
for k, cin, cout in shapes:
    weights.append(jnp.asarray(rng.standard_normal((k, k, cin, cout)).astype(np.float32)
                               / np.sqrt(k * k * cin)).astype(jnp.bfloat16))
    biases.append(jnp.asarray(rng.standard_normal(cout).astype(np.float32) * 0.1
                              ).astype(jnp.bfloat16))

for name, fn in (
    ("xla           ", lambda *ps: conv_chain_xla(list(ps), weights, biases)),
    ("2d t16x128    ", lambda *ps: conv_chain_pallas(list(ps), weights, biases,
                                                     tile_h=16, tile_w=128)),
    ("2d t32x256    ", lambda *ps: conv_chain_pallas(list(ps), weights, biases,
                                                     tile_h=32, tile_w=256)),
    ("2d t32x512    ", lambda *ps: conv_chain_pallas(list(ps), weights, biases,
                                                     tile_h=32, tile_w=512)),
    ("2d t48x256    ", lambda *ps: conv_chain_pallas(list(ps), weights, biases,
                                                     tile_h=48, tile_w=256)),
):
    try:
        t = chained_time(dep(fn), tuple(parts), n_lo=2, n_hi=6)
        print(f"S-stack 1024^2 b2 {name}: {t*1000/b:7.2f} ms/pair", flush=True)
    except Exception as e:
        print(f"S-stack 1024^2 b2 {name}: FAILED {type(e).__name__}: {str(e)[:250]}",
              flush=True)

g = np.asarray(conv_chain_xla([p[:1, :256, :256] for p in parts], weights, biases),
               np.float32)
p_ = np.asarray(conv_chain_pallas([p[:1, :256, :256] for p in parts], weights, biases,
                                  tile_h=16, tile_w=128), np.float32)
print(f"S-stack device parity: max|d|={np.abs(g-p_).max():.5f}", flush=True)

# in-model
SIZE, BATCH = 1024, 2
model = piv_liteflownet(version=1)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params)
img1 = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.bfloat16)
img2 = jax.random.uniform(jax.random.fold_in(key, 1), (BATCH, SIZE, SIZE, 3), jnp.bfloat16)

for label, kw in (
    ("conv=pallas          ", dict(conv_impl="pallas")),
    ("conv=pallas rgb=palls", dict(conv_impl="pallas", rgb_norm="pallas")),
    ("conv=pallas rgb=auto ", dict(conv_impl="pallas", rgb_norm="auto")),
):
    cfg = dataclasses.replace(model.cfg, **kw)

    def fn(a, b, cfg=cfg):
        return forward(params, a, b, cfg, train=False)

    try:
        t = chained_time(fn, (img1, img2), n_lo=2, n_hi=6)
        print(f"v1 {SIZE}^2 b{BATCH} {label}: {t*1000/BATCH:7.2f} ms/pair "
              f"= {BATCH/t:6.2f} pairs/s", flush=True)
    except Exception as e:
        print(f"v1 {SIZE}^2 b{BATCH} {label}: FAILED {type(e).__name__}: {str(e)[:250]}",
              flush=True)
