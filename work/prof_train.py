"""Training-step throughput: f32 vs bf16-compute vs remat (reference config
256^2 crop, batch 8, Adam 4-group; r2 baseline 233.9 ms/step = 34.2 samples/s).

Timing: warm 3 steps, then wall-time N pipelined steps ending in a loss
readback (the 30 ms/dispatch tunnel overhead overlaps 100+ ms steps).
"""

import os
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
cfg = model.cfg
if os.environ.get("PIV_WARP_VJP") or os.environ.get("PIV_NETC_JOINT"):
    # r5 A/Bs: tent-transpose warp VJP; joint 2B-batch NetC in the GRAD
    # program (halves the count of NetC's strided wgrads)
    import dataclasses

    cfg = dataclasses.replace(
        cfg,
        warp_vjp=os.environ.get("PIV_WARP_VJP", cfg.warp_vjp),
        netc_joint=os.environ.get("PIV_NETC_JOINT", cfg.netc_joint),
    )
tx, _ = make_optimizer(model.params, cfg.lowest_level)
pipe = Pipeline(
    crop_size=(SIZE, SIZE), translate=16, scale_range=(0.95, 1.45),
    hflip=True, vflip=True,
    photometric=Photometric((0.0, 0.04), (-0.8, 0.4), 0.2, (0.5, 2.0), (0.7, 1.5)),
    resample=os.environ.get("PIV_AUG_RESAMPLE", "auto"),
)

key = jax.random.PRNGKey(0)
H = W = int(SIZE * 1.5)  # pre-crop frames like the PIVData loader feeds
img1 = jax.random.uniform(key, (BATCH, H, W, 3), jnp.float32)
img2 = jax.random.uniform(jax.random.fold_in(key, 1), (BATCH, H, W, 3), jnp.float32)
target = jax.random.normal(jax.random.fold_in(key, 2), (BATCH, H, W, 2), jnp.float32) * 2

ONLY = [a for a in sys.argv[1:] if a in ("f32", "bf16", "bf16+remat",
                                         "f32+remat", "curves")]
for label, kw in (
    ("f32            ", {}),
    ("bf16           ", dict(compute_dtype=jnp.bfloat16)),
    ("bf16+remat     ", dict(compute_dtype=jnp.bfloat16, remat=True)),
    ("f32+remat      ", dict(remat=True)),
):
    if ONLY and label.strip() not in ONLY:
        continue
    try:
        step = make_train_step(cfg, piv_loss(version=1), tx, pipeline=pipe, **kw)
        # fresh copies: the step donates its state, deleting the fed buffers
        p0 = jax.tree.map(jnp.array, model.params)
        state = TrainState(p0, tx.init(p0), jnp.zeros((), jnp.int32))
        for i in range(3):
            state, m = step(state, img1, img2, target, jax.random.PRNGKey(i))
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(N):
            state, m = step(state, img1, img2, target, jax.random.PRNGKey(100 + i))
        lv = float(m["loss"])
        dt = (time.perf_counter() - t0) / N
        print(f"train {label}: {dt*1000:7.1f} ms/step = {BATCH/dt:6.1f} samples/s "
              f"(loss {lv:.4f})", flush=True)
    except Exception as e:
        print(f"train {label}: FAILED {type(e).__name__}: {str(e)[:250]}", flush=True)

# loss-curve equivalence: 60 steps f32 vs bf16 from the same init/keys
if ONLY and "curves" not in ONLY:
    sys.exit(0)
import numpy as np

curves = {}
for label, kw in (("f32", {}), ("bf16", dict(compute_dtype=jnp.bfloat16))):
    step = make_train_step(cfg, piv_loss(version=1), tx, pipeline=pipe, **kw)
    p0 = jax.tree.map(jnp.array, model.params)
    state = TrainState(p0, tx.init(p0), jnp.zeros((), jnp.int32))
    losses = []
    for i in range(60):
        state, m = step(state, img1, img2, target, jax.random.PRNGKey(1000 + i))
        if i % 10 == 9:
            losses.append(float(m["loss"]))
    curves[label] = np.asarray(losses)
    print(f"curve {label}: {[round(x,4) for x in losses]}", flush=True)
rel = np.abs(curves["bf16"] - curves["f32"]) / np.abs(curves["f32"])
print(f"bf16-vs-f32 loss curve max rel dev: {rel.max()*100:.2f}%", flush=True)
