"""Locate the compiled-vs-gather mismatch structure of the rgb-norm kernel."""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from piv_liteflownet_tpu.ops.pallas_rgb_warp import (
    rgb_norm_bounds_ok,
    rgb_warp_norm_gather,
    rgb_warp_norm_pallas,
)

key = jax.random.PRNGKey(0)


def smooth_flow(b, h, w, mag=3.0):
    f = (jax.random.uniform(key, (b, h // 16, w // 16, 2), jnp.float32) - 0.5) * 2 * mag
    f = jax.image.resize(f, (b, h, w, 2), "linear")
    return f


for size, dtype, fl in (
    (512, jnp.float32, "smooth"),
    (512, jnp.bfloat16, "smooth"),
    (256, jnp.float32, "zero"),
    (256, jnp.float32, "consty4"),
    (256, jnp.float32, "constx4"),
):
    b = 1
    img1 = jax.random.uniform(key, (b, size, size, 3), dtype)
    img2 = jax.random.uniform(jax.random.fold_in(key, 1), (b, size, size, 3), dtype)
    if fl == "smooth":
        flow = smooth_flow(b, size, size)
    elif fl == "zero":
        flow = jnp.zeros((b, size, size, 2))
    elif fl == "consty4":
        flow = jnp.concatenate([jnp.zeros((b, size, size, 1)),
                                jnp.full((b, size, size, 1), 4.3)], -1)
    else:
        flow = jnp.concatenate([jnp.full((b, size, size, 1), 4.3),
                                jnp.zeros((b, size, size, 1))], -1)
    ok = bool(rgb_norm_bounds_ok(flow))
    g = np.asarray(rgb_warp_norm_gather(img1, img2, flow), np.float32)[..., 0]
    p = np.asarray(rgb_warp_norm_pallas(img1, img2, flow), np.float32)[..., 0]
    d = np.abs(g - p)
    bad_rows = np.where(d.max(axis=(0, 2)) > 0.05)[0]
    bad_cols = np.where(d.max(axis=(0, 1)) > 0.05)[0]
    print(f"{size} {np.dtype(dtype).name} {fl}: bounds_ok={ok} max|d|={d.max():.4f} "
          f"mean|d|={d.mean():.5f}", flush=True)
    print(f"  bad rows ({len(bad_rows)}): {bad_rows[:24].tolist()}"
          f"{'...' if len(bad_rows) > 24 else ''}", flush=True)
    print(f"  bad cols ({len(bad_cols)}): {bad_cols[:24].tolist()}"
          f"{'...' if len(bad_cols) > 24 else ''}", flush=True)
