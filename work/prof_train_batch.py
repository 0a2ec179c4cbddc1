"""Train-step batch scaling at 256^2 bf16 (r4k build, cheap guards).

The multistep probe killed the dispatch-overhead theory (scan-16 == loop at
160 ms/step), so the remaining amortization lever is batch size: small
256^2 frames underfill the chip at b8. Measure samples/s for b8..b64.

Usage: python -u work/prof_train_batch.py > work/train_batch.log 2>&1
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from piv_liteflownet_tpu.data.transforms import Photometric, Pipeline
from piv_liteflownet_tpu.models.factory import piv_liteflownet
from piv_liteflownet_tpu.parallel.train_step import TrainState, make_train_step
from piv_liteflownet_tpu.training.loss import piv_loss
from piv_liteflownet_tpu.training.optim import make_optimizer

SIZE = 256
model = piv_liteflownet(version=1)
cfg = model.cfg
tx, _ = make_optimizer(model.params, cfg.lowest_level)
pipe = Pipeline(
    crop_size=(SIZE, SIZE), translate=16, scale_range=(0.95, 1.45),
    hflip=True, vflip=True,
    photometric=Photometric((0.0, 0.04), (-0.8, 0.4), 0.2, (0.5, 2.0), (0.7, 1.5)),
)
step = make_train_step(cfg, piv_loss(version=1), tx,
                       pipeline=pipe, compute_dtype=jnp.bfloat16)

key = jax.random.PRNGKey(0)
H = W = int(SIZE * 1.5)

for BATCH in (8, 16, 32, 64):
    N = max(8, 256 // BATCH)
    try:
        img1 = jax.random.uniform(key, (BATCH, H, W, 3), jnp.float32)
        img2 = jax.random.uniform(jax.random.fold_in(key, 1), (BATCH, H, W, 3),
                                  jnp.float32)
        target = jax.random.normal(jax.random.fold_in(key, 2),
                                   (BATCH, H, W, 2), jnp.float32) * 2
        p0 = jax.tree.map(jnp.array, model.params)
        state = TrainState(p0, tx.init(p0), jnp.zeros((), jnp.int32))
        for i in range(3):
            state, m = step(state, img1, img2, target, jax.random.PRNGKey(i))
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(N):
            state, m = step(state, img1, img2, target, jax.random.PRNGKey(100 + i))
        float(m["loss"])
        dt = (time.perf_counter() - t0) / N
        print(f"train bf16 b={BATCH:<3d}: {dt*1000:7.1f} ms/step = "
              f"{BATCH/dt:6.1f} samples/s", flush=True)
    except Exception as e:
        print(f"train bf16 b={BATCH:<3d}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
