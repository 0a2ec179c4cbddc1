"""Train-step cost attribution at the reference config (256², b8, bf16):
ablate forward components (their backward disappears with them) to see
where the ~25 ms/sample goes — the r3 wall analysis covered eval only.

Usage: python -u work/prof_train_ablate.py > work/train_ablate.log 2>&1
"""

import dataclasses
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

SIZE, BATCH, N = 256, 8, 30
model = piv_liteflownet(version=1)
tx, _ = make_optimizer(model.params, model.cfg.lowest_level)
pipe = Pipeline(
    crop_size=(SIZE, SIZE), translate=16, scale_range=(0.95, 1.45),
    hflip=True, vflip=True,
    photometric=Photometric((0.0, 0.04), (-0.8, 0.4), 0.2, (0.5, 2.0), (0.7, 1.5)),
)

key = jax.random.PRNGKey(0)
H = W = int(SIZE * 1.5)
img1 = jax.random.uniform(key, (BATCH, H, W, 3), jnp.float32)
img2 = jax.random.uniform(jax.random.fold_in(key, 1), (BATCH, H, W, 3), jnp.float32)
target = jax.random.normal(jax.random.fold_in(key, 2), (BATCH, H, W, 2), jnp.float32) * 2

CASES = [
    ("full          ", ()),
    ("no aug        ", None),        # pipeline=None: aug cost incl. its sched
    ("ablate warp   ", ("warp", "warpS")),
    ("ablate corr   ", ("corr",)),
    ("ablate S      ", ("S",)),
    ("ablate R      ", ("R",)),
    ("ablate warp+S ", ("warp", "warpS", "S")),
]

CASES.append(("full rbg-rng  ", ()))  # aug RNG cost: threefry vs fast rbg keys

for label, abl in CASES:
    cfg = dataclasses.replace(model.cfg, ablate=abl or ())
    pipe_obj = pipe if abl is not None else None
    rng_impl = "rbg" if "rbg" in label else "threefry2x32"
    jax.config.update("jax_default_prng_impl", rng_impl)
    try:
        step = make_train_step(cfg, piv_loss(version=1), tx,
                               pipeline=pipe_obj, compute_dtype=jnp.bfloat16)
        p0 = jax.tree.map(jnp.array, model.params)
        state = TrainState(p0, tx.init(p0), jnp.zeros((), jnp.int32))
        k = jax.random.PRNGKey(7)
        if pipe_obj is None:
            a = img1[:, :SIZE, :SIZE]; b = img2[:, :SIZE, :SIZE]
            t = target[:, :SIZE, :SIZE]
        else:
            a, b, t = img1, img2, target
        state, m = step(state, a, b, t, k)  # compile + warm
        state, m = step(state, a, b, t, jax.random.fold_in(k, 1))
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(N):
            state, m = step(state, a, b, t, jax.random.fold_in(k, 2 + i))
        float(m["loss"])
        dt = (time.perf_counter() - t0) / N
        print(f"{label}: {1e3 * dt:7.1f} ms/step = "
              f"{BATCH / dt:6.1f} samples/s", flush=True)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
