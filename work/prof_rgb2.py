"""Kernel A v2: parity+timing on properly smooth flows, and guard pass-rate
on REAL flows (demo pair + synthetic particle images through the model)."""

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
from piv_liteflownet_tpu.ops.pallas_rgb_warp import (
    rgb_norm_bounds_ok,
    rgb_warp_norm_gather,
    rgb_warp_norm_pallas,
)

key = jax.random.PRNGKey(0)


def dep(fn):
    def g(a, *rest):
        eps = jnp.sum(a).astype(jnp.float32) * jnp.float32(1e-30)
        return fn(a, *[r + eps.astype(r.dtype) for r in rest])
    return g


def smooth_flow(b, h, w, mag=4.0, cell=128):
    f = (jax.random.uniform(key, (b, max(2, h // cell), max(2, w // cell), 2),
                            jnp.float32) - 0.5) * 2 * mag
    return jax.image.resize(f, (b, h, w, 2), "linear")


# parity + timing
for size in (1024, 512):
    b = 2
    img1 = jax.random.uniform(key, (b, size, size, 3), jnp.bfloat16)
    img2 = jax.random.uniform(jax.random.fold_in(key, 1), (b, size, size, 3), jnp.bfloat16)
    flow = smooth_flow(b, size, size)
    ok = bool(rgb_norm_bounds_ok(flow))
    g = np.asarray(rgb_warp_norm_gather(img1, img2, flow), np.float32)
    p = np.asarray(rgb_warp_norm_pallas(img1, img2, flow), np.float32)
    print(f"{size}^2 smooth(cell128,mag4): bounds_ok={ok} max|d|={np.abs(g-p).max():.5f}",
          flush=True)
    for name, fn in (("gather", rgb_warp_norm_gather),
                     ("pallas", lambda a, c, f: rgb_warp_norm_pallas(a, c, f))):
        t = chained_time(dep(fn), (img1, img2, flow), n_lo=2, n_hi=10)
        print(f"  {name}: {t*1000/b:7.3f} ms/pair", flush=True)

# guard pass-rate on REAL flows: model output on demo pair + synthetic pairs
from PIL import Image

from piv_liteflownet_tpu.data.piv_gen import ParticleImageGen, FLOW_FIELDS

model = piv_liteflownet(version=1)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params)
cfg = model.cfg

d = "/root/reference/images/demo/"
im1 = np.asarray(Image.open(d + "DNS_turbulence_img1.tif").convert("RGB"), np.float32) / 255.0
im2 = np.asarray(Image.open(d + "DNS_turbulence_img2.tif").convert("RGB"), np.float32) / 255.0
flow_demo = jnp.asarray(
    forward(params, jnp.asarray(im1[None], jnp.bfloat16),
            jnp.asarray(im2[None], jnp.bfloat16), cfg, train=False)
).astype(jnp.float32)
for r in (2, 3, 4):
    print(f"demo-pair model flow: r={r} bounds_ok="
          f"{bool(rgb_norm_bounds_ok(flow_demo, r=r))} "
          f"max|u|={float(jnp.abs(flow_demo[...,0]).max()):.2f} "
          f"max|v|={float(jnp.abs(flow_demo[...,1]).max()):.2f}", flush=True)

# ground-truth demo flow (the real turbulence field)
from piv_liteflownet_tpu.utils.flow_io import read_flow

gt = jnp.asarray(read_flow(d + "DNS_turbulence_flow.flo"))[None]
for r in (2, 3, 4):
    print(f"demo-pair GT flow: r={r} bounds_ok={bool(rgb_norm_bounds_ok(gt, r=r))} "
          f"max|uv|={float(jnp.abs(gt).max()):.2f}", flush=True)

# synthetic 1024^2: model flows on particle images of each analytic field
gen = ParticleImageGen(image_size=(1024, 1024))
for name, fk in FLOW_FIELDS.items():
    f_true = fk(1024, 1024)
    i1, i2 = gen.generate_pair(jax.random.PRNGKey(3), f_true)
    fl = jnp.asarray(
        forward(params, jnp.asarray(i1[None], jnp.bfloat16),
                jnp.asarray(i2[None], jnp.bfloat16), cfg, train=False)
    ).astype(jnp.float32)
    oks = {r: bool(rgb_norm_bounds_ok(fl, r=r)) for r in (2, 3, 4)}
    ok_true = {r: bool(rgb_norm_bounds_ok(f_true[None], r=r)) for r in (2, 3, 4)}
    print(f"synthetic {name}: model-flow bounds {oks}; true-flow bounds {ok_true}",
          flush=True)
