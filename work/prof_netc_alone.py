"""Standalone NetC cost at b4 1024^2 and the space-to-batch variant.

The r4g netc_joint probes showed the joint trick loses in-model; the
remaining NetC question is whether its early full-res convs pay the
batch<8 MXU starvation penalty, and whether banding just NetC (halo 8
input rows covers conv1 7x7 + the conv2 chain receptive field) recovers
it standalone before trying it in-model.

Usage: python -u work/prof_netc_alone.py [batch] [size] > log 2>&1
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
from piv_liteflownet_tpu.models import liteflownet as L

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

model = piv_liteflownet(version=1)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params)
key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.bfloat16)


def netc_plain(x):
    return L._netc(params, x, None)


def netc_banded(x):
    # Band only through the stride-2 frontier: run conv1+conv2 chain on
    # k overlapping H-bands (halo 8 input rows = conv1 pad3 + conv2.0
    # needs 2*h2+1 l1 rows for h2=2 l2-halo rows of conv2.2+2.4), then
    # un-band and finish the strided tail plain. Exactness is asserted
    # below before timing.
    b, h, w, _ = x.shape
    k = max(1, 8 // b)
    halo = 8
    xb = L._space_to_batch(x, k, halo)
    l1b = L._cl(params, "NetC.conv1.0", xb, 1, 3, None)
    # stride-2 conv on bands: band rows align because halo(8) and band
    # height (h/k) are even
    l2b = L._cl(params, "NetC.conv2.0", l1b, 2, 1, None)
    l2b = L._cl(params, "NetC.conv2.2", l2b, 1, 1, None)
    l2b = L._cl(params, "NetC.conv2.4", l2b, 1, 1, None)
    l1 = L._batch_to_space(l1b, k, halo)
    l2 = L._batch_to_space(l2b, k, halo // 2)
    l3 = L._cl(params, "NetC.conv3.0", l2, 2, 1, None)
    l3 = L._cl(params, "NetC.conv3.2", l3, 1, 1, None)
    l4 = L._cl(params, "NetC.conv4.0", l3, 2, 1, None)
    l4 = L._cl(params, "NetC.conv4.2", l4, 1, 1, None)
    l5 = L._cl(params, "NetC.conv5.0", l4, 2, 1, None)
    l6 = L._cl(params, "NetC.conv6.0", l5, 2, 1, None)
    return [l1, l2, l3, l4, l5, l6]


# exactness check at a small size first (CPU-cheap shapes still go to TPU
# here; keep it tiny)
xs = jax.random.uniform(key, (BATCH, 128, 128, 3), jnp.bfloat16)
ref = jax.jit(netc_plain)(xs)
got = jax.jit(netc_banded)(xs)
for i, (r, g) in enumerate(zip(ref, got)):
    d = float(jnp.max(jnp.abs(r.astype(jnp.float32) - g.astype(jnp.float32))))
    print(f"level {i+1}: max|diff| = {d:.2e}", flush=True)
    # bf16 conv rounding differs ulp-level between band/plain tilings on
    # device (measured 4.88e-04 at level 2 = 2^-11, one bf16 ulp of ~0.06
    # activations); an indexing bug would be O(0.1) on random input.
    assert d <= 2e-3, f"banded NetC inexact at level {i+1}: {d}"

for name, fn in (("plain", netc_plain), ("banded", netc_banded)):
    t = chained_time(fn, (x,))
    print(f"netc {name:>7s} b={BATCH} {SIZE}^2: {1e3 * t / BATCH:7.2f} ms per batch-item (one image)",
          flush=True)
