"""Benchmark: 1024x1024 PIV image-pairs/sec/chip (north star: >=200, BASELINE.json).

Measures the flagship PIV-LiteFlowNet-en (v1, lowest_level=1) end-to-end
inference step — the same jitted pipeline ``run.py`` uses — on the real chip.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from piv_liteflownet_tpu.models.factory import piv_liteflownet  # noqa: E402
from piv_liteflownet_tpu.models.liteflownet import forward  # noqa: E402

BASELINE_PAIRS_PER_SEC = 200.0
SIZE = 1024


def bench_once(batch: int, iters: int, dtype=jnp.float32, precision=None):
    import dataclasses

    model = piv_liteflownet(version=1)
    params = jax.tree.map(lambda x: x.astype(dtype), model.params)
    # default warp path; the window/pallas warps are opt-in (they measure
    # faster standalone but slower in the fused model — see BASELINE.md)
    cfg = model.cfg

    @jax.jit
    def fn(p, a, b):
        return forward(p, a, b, cfg, train=False, precision=precision)

    key = jax.random.PRNGKey(0)
    img1 = jax.random.uniform(key, (batch, SIZE, SIZE, 3), dtype)
    img2 = jax.random.uniform(jax.random.fold_in(key, 1), (batch, SIZE, SIZE, 3), dtype)

    out = fn(params, img1, img2)
    jax.block_until_ready(out)  # compile + warmup

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, img1, img2)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    # fast path: bf16 activations/params (MXU-native); f32 fallback on failure
    for batch, iters, dtype in ((8, 8, jnp.bfloat16), (4, 8, jnp.bfloat16), (2, 8, jnp.float32), (1, 4, jnp.float32)):
        try:
            pairs_per_sec = bench_once(batch, iters, dtype)
            break
        except Exception as e:  # OOM or compile failure: shrink
            print(f"bench config b={batch} {dtype.__name__} failed: {e}", file=sys.stderr)
    else:
        print(json.dumps({"metric": "1024^2 PIV pairs/sec/chip", "value": 0.0,
                          "unit": "pairs/s", "vs_baseline": 0.0}))
        return

    print(json.dumps({
        "metric": "1024^2 PIV pairs/sec/chip",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
