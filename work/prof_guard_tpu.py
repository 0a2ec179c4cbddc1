"""TPU half of the guard study (VERDICT r3 #5): tier cost + in-model effect.

1. Standalone cost of each rgb-norm tent tier vs the gather at 1024^2 b4.
2. In-model v1 ms/pair on BENIGN vs STEEP synthetic inputs with the trained
   weights — the data-dependence of the 129 ms/pair headline, measured
   (benign flows hit tier 1; steep flows hit tier 2; r3's single-tier kernel
   would have silently fallen back to the 10.2 ms gather on both, see
   work/guard_resid.log).

Usage: python work/prof_guard_tpu.py [batch=4] [size=1024]
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/work")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

from bench_lib import chained_time
from piv_liteflownet_tpu.data.piv_gen import ParticleImageGen, sine_flow, vortex_flow
from piv_liteflownet_tpu.models.factory import piv_liteflownet
from piv_liteflownet_tpu.models.liteflownet import forward
from piv_liteflownet_tpu.ops.pallas_rgb_warp import (
    RGB_NORM_TIERS,
    rgb_warp_norm_gather,
    rgb_warp_norm_pallas,
)
from piv_liteflownet_tpu.utils.checkpoint import load_params_npz


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.random((batch, size, size, 3), np.float32), jnp.bfloat16)
    img2 = jnp.asarray(rng.random((batch, size, size, 3), np.float32), jnp.bfloat16)
    flow = jnp.asarray(rng.uniform(-3, 3, (batch, size, size, 2)).astype(np.float32))

    # 1. standalone tier costs. The carry must thread through img2 AND flow,
    # or XLA hoists the loop-invariant warp out of the timing scan entirely
    # (the r4 battery measured t(n=6)==t(n=2) that way).
    def dep(fn):
        def g(a, b):
            eps = (jnp.sum(a).astype(jnp.float32) * jnp.float32(1e-30))
            return fn(a, b + eps.astype(b.dtype), flow + eps)
        return g

    t = chained_time(dep(rgb_warp_norm_gather), (img1, img2))
    print(f"gather           : {1e3 * t / batch:7.2f} ms/pair", flush=True)
    for r, lim in RGB_NORM_TIERS:
        t = chained_time(
            dep(lambda a, b, f, r=r, lim=lim: rgb_warp_norm_pallas(a, b, f, r, lim)),
            (img1, img2))
        print(f"tent r={r:2d} lim={lim:2d}: {1e3 * t / batch:7.2f} ms/pair", flush=True)

    # 2. in-model data dependence with trained weights
    model = piv_liteflownet(version=1)
    try:
        params = load_params_npz("/root/repo/work/synth_run/params_final.npz")
    except FileNotFoundError:
        params = model.params
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    cfg = model.cfg

    gen = ParticleImageGen(image_size=(size, size))
    key = jax.random.PRNGKey(3)

    def pairs_for(field):
        ks = jax.random.split(key, batch)
        ims = [gen.generate_pair(k, field) for k in ks]
        a = jnp.stack([i1 for i1, _ in ims]).astype(jnp.bfloat16)
        b = jnp.stack([i2 for _, i2 in ims]).astype(jnp.bfloat16)
        return a, b

    fn = lambda a, b: forward(params, a, b, cfg, train=False)
    for name, field in (
        ("noise(r3-bench)", None),
        ("benign_vortex", vortex_flow(size, size, strength=3.0)),
        ("steep_sine_hf", sine_flow(size, size, amp=6.0, freq=8.0)),
        ("extreme(gather)", sine_flow(size, size, amp=16.0, freq=12.0)),
    ):
        a, b = (img1, img2) if field is None else pairs_for(field)
        t = chained_time(fn, (a, b))
        print(f"v1 in-model [{name:16s}]: {1e3 * t / batch:7.1f} ms/pair "
              f"({batch / t:.2f} pairs/s)", flush=True)


if __name__ == "__main__":
    main()
