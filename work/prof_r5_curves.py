"""Loss-curve equivalence: bf16 train with the tent-transpose warp VJP
(ry from PIV_TVJP_RY) vs the XLA-scatter VJP, identical init/keys, 60 steps.

The kernel's image-gradient differs from the scatter's only by bf16
rounding paths (the kernel keeps tap weights in f32 — strictly more
accurate; tests/test_pallas_ondevice.py), so the curves should track within
bf16 training noise. This is the VERDICT-r4 #1 "loss-curve equivalence
check re-run" for the promoted backward kernel.

Usage: PIV_TVJP_RY=2 python work/prof_r5_curves.py
"""

import dataclasses
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from piv_liteflownet_tpu.data.transforms import Photometric, Pipeline
from piv_liteflownet_tpu.models.factory import piv_liteflownet
from piv_liteflownet_tpu.parallel.train_step import TrainState, make_train_step
from piv_liteflownet_tpu.training.loss import piv_loss
from piv_liteflownet_tpu.training.optim import make_optimizer

SIZE, BATCH = 256, 8
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

curves = {}
for name in ("gather", "tent"):
    cfg = dataclasses.replace(model.cfg, warp_vjp=name)
    step = make_train_step(cfg, piv_loss(version=1), tx, pipeline=pipe,
                           compute_dtype=jnp.bfloat16)
    p0 = jax.tree.map(jnp.array, model.params)
    state = TrainState(p0, tx.init(p0), jnp.zeros((), jnp.int32))
    losses = []
    for i in range(60):
        state, m = step(state, img1, img2, target, jax.random.PRNGKey(1000 + i))
        if i % 10 == 9:
            losses.append(float(m["loss"]))
    curves[name] = np.asarray(losses)
    print(f"curve {name}: {[round(x, 4) for x in losses]}", flush=True)

rel = np.abs(curves["tent"] - curves["gather"]) / np.abs(curves["gather"])
print(f"tent-vs-gather bf16 loss curve max rel dev: {rel.max()*100:.3f}%",
      flush=True)
