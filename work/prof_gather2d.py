"""Warp gather without the operand flatten: 4-D lax.gather vs the shipped
flattened take_along_axis.

The r4g trace study found 20-23% of forward device time in layout copies;
the prime suspects are the packed warp arrays, whose [B,H+1,W+1,4C] ->
[B,(H+1)(W+1),4C] flatten breaks the TPU tiled layout and forces a
materializing copy before the gather. A 4-D gather with [B,hs,ws,2] spatial
indices needs no flatten on either side.

Usage: python -u work/prof_gather2d.py [batch] [size] [chan] > log 2>&1
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
from piv_liteflownet_tpu.ops.warp import backwarp, pack_img, gather_warp

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
CHAN = int(sys.argv[3]) if len(sys.argv) > 3 else 64

key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (BATCH, SIZE, SIZE, CHAN), jnp.bfloat16)
flow = (jax.random.normal(jax.random.fold_in(key, 1),
                          (BATCH, SIZE, SIZE, 2), jnp.bfloat16) * 3)


def pack_img_4d(img):
    """[B,H,W,C] -> [B,H+1,W+1,4C], same taps as pack_img, NO flatten."""
    b, h, w, c = img.shape
    hp, wp = h + 2, w + 2
    imgp = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jnp.concatenate(
        [
            imgp[:, : hp - 1, : wp - 1, :],
            imgp[:, : hp - 1, 1:, :],
            imgp[:, 1:, : wp - 1, :],
            imgp[:, 1:, 1:, :],
        ],
        axis=-1,
    )  # [B, h+1, w+1, 4C]


def gather_warp_4d(packed4, h, w, flow, stride=1):
    """gather_warp semantics from the unflattened packed array."""
    b = packed4.shape[0]
    c = packed4.shape[-1] // 4
    dtype = packed4.dtype
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

    idx = jnp.stack([yc, xc], axis=-1)  # [B, hs, ws, 2]
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(3,),
        collapsed_slice_dims=(1, 2),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    vals = lax.gather(
        packed4, idx, dnums, slice_sizes=(1, 1, 1, 4 * c),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )  # [B, hs, ws, 4C]
    vals = vals.reshape(b, hs, ws, 4, c)

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


def warp_4d(img, flow):
    h, w = img.shape[1], img.shape[2]
    return gather_warp_4d(pack_img_4d(img), h, w, flow)


# exactness first (small)
imgs = img[:, :256, :256]
flows = flow[:, :256, :256]
a = jax.jit(warp_flat)(imgs, flows)
bq = jax.jit(warp_4d)(imgs, flows)
d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - bq.astype(jnp.float32))))
print(f"max|diff| flat vs 4d: {d:.2e}", flush=True)
assert d == 0.0, "4d gather warp differs"

for name, fn in (("flat-gather", warp_flat), ("4d-gather", warp_4d)):
    t = chained_time(fn, (img, flow))
    print(f"warp {name:>12s} b={BATCH} {SIZE}^2 c{CHAN}: "
          f"{1e3 * t / BATCH:7.2f} ms/pair", flush=True)

# strided variant (the M-warp trick)
def warp_flat_s2(img, flow):
    return backwarp(img, flow[:, ::2, ::2], 2)

def warp_4d_s2(img, flow):
    h, w = img.shape[1], img.shape[2]
    return gather_warp_4d(pack_img_4d(img), h, w, flow[:, ::2, ::2], stride=2)

a = jax.jit(warp_flat_s2)(imgs, flows)
bq = jax.jit(warp_4d_s2)(imgs, flows)
d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - bq.astype(jnp.float32))))
print(f"max|diff| strided: {d:.2e}", flush=True)
assert d == 0.0

for name, fn in (("flat-s2", warp_flat_s2), ("4d-s2", warp_4d_s2)):
    t = chained_time(fn, (img, flow))
    print(f"warp {name:>12s} b={BATCH} {SIZE}^2 c{CHAN}: "
          f"{1e3 * t / BATCH:7.2f} ms/pair", flush=True)
