"""Warp gather with the batch FOLDED INTO THE ROWS: one 2-D gather, no
batch dims at all.

The copy census (work/copy_census_v1.log) ranks the L1/L2 warp layout
copies first: the batched take_along_axis forces (a) an operand copy of the
packed [B,(H+1)(W+1),4C] array into a batch-minor layout and (b) a
[B*hs*ws, 4C] {0,1}->{1,0} copy of the gather output. A 2-D gather
(operand [B*(H+1)*(W+1), 4C], flat row indices with a per-batch base
offset) gives XLA no batch dimension to re-lay-out; both sides should stay
standard {1,0}.

The earlier 4-D probe (work/prof_gather2d.py) went the OTHER direction
(keep all spatial dims) and was neutral-to-worse; this is the untested
direction.

Usage: python -u work/prof_gatherfold.py [batch] [size] [chan] > log 2>&1
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/work")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench_lib import chained_time
from piv_liteflownet_tpu.ops.warp import backwarp, pack_img

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
CHAN = int(sys.argv[3]) if len(sys.argv) > 3 else 64

key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (BATCH, SIZE, SIZE, CHAN), jnp.bfloat16)
flow = (jax.random.normal(jax.random.fold_in(key, 1),
                          (BATCH, SIZE, SIZE, 2), jnp.bfloat16) * 3)


def gather_warp_fold(packed, h, w, flow, stride=1):
    """gather_warp with batch folded into the gather rows (2-D take)."""
    b = packed.shape[0]
    n = packed.shape[1]
    c = packed.shape[-1] // 4
    dtype = packed.dtype
    hs, ws = flow.shape[1], flow.shape[2]

    ix = lax.broadcasted_iota(jnp.float32, (hs, ws), 1) * stride
    iy = lax.broadcasted_iota(jnp.float32, (hs, ws), 0) * stride
    x = ix[None] + flow[..., 0].astype(jnp.float32)
    y = iy[None] + flow[..., 1].astype(jnp.float32)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(dtype)
    wy = (y - y0).astype(dtype)

    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)
    oob = (xi < -1) | (xi > w - 1) | (yi < -1) | (yi > h - 1)
    xc = jnp.clip(xi + 1, 0, w)
    yc = jnp.clip(yi + 1, 0, h)
    base = (jnp.arange(b, dtype=jnp.int32) * n)[:, None, None]
    flat_idx = (base + yc * (w + 1) + xc).reshape(b * hs * ws)
    vals = jnp.take_along_axis(
        packed.reshape(b * n, 4 * c), flat_idx[:, None], axis=0,
        mode="promise_in_bounds",
    ).reshape(b, hs, ws, 4, c)

    one = jnp.asarray(1, dtype)
    w00 = (one - wx) * (one - wy)
    w01 = wx * (one - wy)
    w10 = (one - wx) * wy
    w11 = wx * wy
    weights = jnp.stack([w00, w01, w10, w11], axis=-1)
    weights = jnp.where(oob[..., None], jnp.zeros((), dtype), weights)
    return jnp.einsum("bhwk,bhwkc->bhwc", weights, vals)


def warp_flat(img, flow):
    return backwarp(img, flow)


def warp_fold(img, flow):
    h, w = img.shape[1], img.shape[2]
    return gather_warp_fold(pack_img(img), h, w, flow)


imgs = img[:, :256, :256]
flows = flow[:, :256, :256]
a = jax.jit(warp_flat)(imgs, flows)
bq = jax.jit(warp_fold)(imgs, flows)
d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - bq.astype(jnp.float32))))
print(f"max|diff| flat vs fold: {d:.2e}", flush=True)
assert d == 0.0, "fold gather warp differs"

for name, fn in (("flat-gather", warp_flat), ("fold-gather", warp_fold)):
    t = chained_time(fn, (img, flow))
    print(f"warp {name:>12s} b={BATCH} {SIZE}^2 c{CHAN}: "
          f"{1e3 * t / BATCH:7.2f} ms/pair", flush=True)


# strided (the M-warp output-grid trick)
def warp_flat_s2(img, flow):
    return backwarp(img, flow[:, ::2, ::2], 2)


def warp_fold_s2(img, flow):
    h, w = img.shape[1], img.shape[2]
    return gather_warp_fold(pack_img(img), h, w, flow[:, ::2, ::2], stride=2)


a = jax.jit(warp_flat_s2)(imgs, flows)
bq = jax.jit(warp_fold_s2)(imgs, flows)
d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - bq.astype(jnp.float32))))
print(f"max|diff| strided: {d:.2e}", flush=True)
assert d == 0.0

for name, fn in (("flat-s2", warp_flat_s2), ("fold-s2", warp_fold_s2)):
    t = chained_time(fn, (img, flow))
    print(f"warp {name:>12s} b={BATCH} {SIZE}^2 c{CHAN}: "
          f"{1e3 * t / BATCH:7.2f} ms/pair", flush=True)
