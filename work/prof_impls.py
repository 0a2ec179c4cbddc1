"""Config sweep on device: warp_impl x corr_impl x conv_bands, in-model.

Usage: python -u work/prof_impls.py [version] [batch] [size] > log 2>&1
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

model = piv_liteflownet(version=VERSION)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params)

key = jax.random.PRNGKey(0)
img1 = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.bfloat16)
img2 = jax.random.uniform(jax.random.fold_in(key, 1), (BATCH, SIZE, SIZE, 3), jnp.bfloat16)

CONFIGS = [
    dict(),                                             # baseline (r3+netc_joint)
    dict(warp_impl="tent"),
    dict(warp_impl="tent!"),                            # unguarded (r4e): guard-cost attribution
    dict(warp_impl="tent!", netc_joint="off"),          # best-known combo probe

    dict(corr_impl="planar"),
    dict(warp_impl="tent", corr_impl="planar"),
    dict(conv_bands=True),
    dict(warp_impl="tent", corr_impl="planar", conv_bands=True),
    dict(netc_joint="off"),                             # scheduling probe (r4)
    dict(rgb_norm="gather"),                            # kernel value re-check (r4)
]

# cheap-guard battery (r4k: reshape-reduce tile stats replacing
# reduce_window+repeat in the guards + kernel prep): re-measure the default
# (guarded rgb kernel) and the guarded tent, whose r4g verdict "guard costs
# 3.7 ms vs 1.1 ms kernel win" was taken under the expensive guard.
if len(sys.argv) > 4 and sys.argv[4] == "guard":
    CONFIGS = [
        dict(),                          # default: rgb_norm=auto guard in path
        dict(warp_impl="tent"),          # guarded tent re-adjudication
        dict(warp_impl="tent!"),         # unguarded reference point
        dict(rgb_norm="gather"),         # no-kernel reference point
    ]

# parity NetC head (r4k: ops/nn.netc_head_parity — v2-only, see
# ModelConfig.netc_head)
if len(sys.argv) > 4 and sys.argv[4] == "head":
    CONFIGS = [
        dict(),
        dict(netc_head="parity"),
        dict(netc_head="parity", warp_impl="tent"),
    ]

# cout-padded flow heads (r4n: lastconv_impl="pad" — one MXU-aligned conv +
# slice instead of the 2-lane-output window the trace bills at ~2.4 ms/pair
# v2; unlike "shift" there is no nonstandard-layout intermediate)
if len(sys.argv) > 4 and sys.argv[4] == "pad":
    CONFIGS = [
        dict(),
        dict(lastconv_impl="pad"),
    ]

for over in CONFIGS:
    cfg = dataclasses.replace(model.cfg, **over)

    def fn(a, b, cfg=cfg):
        return forward(params, a, b, cfg, train=False)

    name = ",".join(f"{k}={v}" for k, v in over.items()) or "baseline"
    try:
        t = chained_time(fn, (img1, img2), n_lo=2, n_hi=6) * 1000 / BATCH
        print(f"v{VERSION} b={BATCH} {SIZE}^2 {name:<50s}: {t:7.1f} ms/pair "
              f"= {1000/t:6.2f} pairs/s", flush=True)
    except Exception as e:
        print(f"v{VERSION} b={BATCH} {SIZE}^2 {name:<50s}: FAILED "
              f"{type(e).__name__}: {e}", flush=True)
