"""Standalone S/R conv-stack timing at level-1 shapes: quantify the gap
between in-model ablation cost (~20 ms/pair each) and MXU roofline (~5)."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/work")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from bench_lib import chained_time
from piv_liteflownet_tpu.models.factory import piv_liteflownet
from piv_liteflownet_tpu.models.liteflownet import _c, _cl, _cl_split
from piv_liteflownet_tpu.ops.nn import conv2d

B, H, W = 4, 1024, 1024
model = piv_liteflownet(version=1)
p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params)
key = jax.random.PRNGKey(0)

f1 = jax.random.normal(key, (B, H, W, 64), jnp.bfloat16)
f2w = jax.random.normal(jax.random.fold_in(key, 1), (B, H, W, 64), jnp.bfloat16)
flow = jax.random.normal(jax.random.fold_in(key, 2), (B, H, W, 2), jnp.bfloat16)
norm = jax.random.normal(jax.random.fold_in(key, 3), (B, H, W, 1), jnp.bfloat16)
feat = jax.random.normal(jax.random.fold_in(key, 4), (B, H, W, 128), jnp.bfloat16)


def s_stack(a, b_, c_):
    x = _cl_split(p, "NetE_S.0.conv_S.0", [a, b_, c_], 1, None)
    x = _cl(p, "NetE_S.0.conv_S.2", x, 1, 1, None)
    x = _cl(p, "NetE_S.0.conv_S.4", x, 1, 1, None)
    return _c(p, "NetE_S.0.conv_S.6", x, 1, 3, None)


def s_stack_concat(a, b_, c_):
    x = jnp.concatenate([a, b_, c_], axis=-1)
    w = p["NetE_S.0.conv_S.0.weight"]
    from piv_liteflownet_tpu.ops.nn import leaky_relu
    x = leaky_relu(conv2d(x, w, p["NetE_S.0.conv_S.0.bias"], 1, 1, None))
    x = _cl(p, "NetE_S.0.conv_S.2", x, 1, 1, None)
    x = _cl(p, "NetE_S.0.conv_S.4", x, 1, 1, None)
    return _c(p, "NetE_S.0.conv_S.6", x, 1, 3, None)


def r_stack(n, fl, ft):
    x = _cl_split(p, "NetE_R.0.conv_R.0", [n, fl, ft], 1, None)
    for ci in range(1, 6):
        x = _cl(p, f"NetE_R.0.conv_R.{2 * ci}", x, 1, 1, None)
    x = _c(p, "NetE_R.0.conv_dist_R.0", x, 1, (3, 0), None)
    return _c(p, "NetE_R.0.conv_dist_R.1", x, 1, (0, 3), None)


def conv128(a):  # reference point: one 3x3 128->128 conv
    return conv2d(a, jnp.zeros((3, 3, 128, 128), jnp.bfloat16), None, 1, 1, None)


for name, fn, args in [
    ("conv3x3 128->128", conv128, (feat,)),
    ("S stack (split)", s_stack, (f1, f2w, flow)),
    ("S stack (concat)", s_stack_concat, (f1, f2w, flow)),
    ("R stack (+dist)", r_stack, (norm, flow, feat)),
]:
    t = chained_time(fn, args)
    print(f"{name}: {t*1000:.2f} ms b{B} -> {t*1000/B:.2f} ms/pair", flush=True)
