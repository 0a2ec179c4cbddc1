"""Benchmark: 1024x1024 PIV image-pairs/sec/chip (north star: >=200, BASELINE.json).

Measures the flagship PIV-LiteFlowNet-en (v1, lowest_level=1) end-to-end
inference forward — the same jitted pipeline ``run.py`` uses — on the real
chip, plus the v2 backbone (quarter-res decode) and the 256^2/512^2
resolution-scaling figures as extras so progress on every size is
machine-tracked round over round.

Timing method: chained executable + full-sum scalar readback
(piv_liteflownet_tpu/utils/benchmark.py) — ``block_until_ready`` is
unreliable through the axon tunnel and sliced readbacks get DCE'd.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from piv_liteflownet_tpu.models.factory import piv_liteflownet  # noqa: E402
from piv_liteflownet_tpu.models.liteflownet import forward  # noqa: E402
from piv_liteflownet_tpu.utils.benchmark import chained_time  # noqa: E402

BASELINE_PAIRS_PER_SEC = 200.0
SIZE = 1024


def bench_version(version: int, batch: int, dtype=jnp.bfloat16, size: int = SIZE) -> float:
    model = piv_liteflownet(version=version)
    params = jax.tree.map(lambda x: x.astype(dtype), model.params)
    cfg = model.cfg

    def fn(a, b):
        return forward(params, a, b, cfg, train=False)

    key = jax.random.PRNGKey(0)
    img1 = jax.random.uniform(key, (batch, size, size, 3), dtype)
    img2 = jax.random.uniform(jax.random.fold_in(key, 1), (batch, size, size, 3), dtype)
    t = chained_time(fn, (img1, img2))
    return batch / t


def main():
    result = 0.0
    v1_ok = False
    # batch sweep finding (BASELINE.md): with the fused rgb-norm kernel the
    # HBM squeeze eased and b=4 became the best per-pair v1 config
    # (r3: 129.0 ms/pair vs 132.3 at b2, 137.2 at b8).
    for batch, dtype in ((4, jnp.bfloat16), (2, jnp.bfloat16), (1, jnp.bfloat16),
                         (1, jnp.float32)):
        try:
            result = bench_version(1, batch, dtype)
            v1_ok = True
            break
        except Exception as e:  # OOM or compile failure: shrink
            print(f"bench v1 b={batch} {dtype.__name__} failed: {e}", file=sys.stderr)

    extras = {"method": "chained-scan+scalar-readback", "batch": batch}
    if not v1_ok:
        extras["v1_failed"] = True
    # Secondary figures: v2 backbone (the north-star path) + resolution table.
    for name, version, b, size in (
        ("v2_pairs_per_sec", 2, 4, 1024),
        ("v1_512", 1, 8, 512),
        ("v2_512", 2, 8, 512),
        ("v1_256", 1, 16, 256),
        ("v2_256", 2, 16, 256),
    ):
        try:
            extras[name] = round(bench_version(version, b, size=size), 3)
        except Exception as e:
            print(f"bench {name} failed: {e}", file=sys.stderr)

    # The 200 pairs/s north star is a v2-backbone x N-chips plan (BASELINE.md):
    # inference DP has zero cross-chip communication (params replicated, batch
    # sharded — parallel/, run.py --num_devices), so aggregate throughput is
    # linear in chips up to the input pipeline. Projection from the measured
    # single-chip v2 figure; only 1 real chip is reachable in this harness.
    if "v2_pairs_per_sec" in extras:
        extras["v2_x8_projected_linear_dp"] = round(extras["v2_pairs_per_sec"] * 8, 1)

    print(json.dumps({
        "metric": "1024^2 PIV pairs/sec/chip",
        "value": round(result, 3),
        "unit": "pairs/s",
        "vs_baseline": round(result / BASELINE_PAIRS_PER_SEC, 4),
        **extras,
    }))


if __name__ == "__main__":
    main()
