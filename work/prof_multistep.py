"""Multi-step training dispatch probe.

The r4h trace (work/trace_train.log) shows the device executes the full
train step (256^2 b8 bf16, aug in-jit) in ~55 ms, while the blocking loop
measures 159 ms/step — ~100 ms/step is tunnel dispatch overhead that the
async dispatch queue does NOT hide through the axon relay. If true, a
k-step lax.scan per dispatch (stacked data) amortizes it to ~overhead/k.

Cases:
  loop      — today's per-step dispatch (reproduces the 159 ms figure)
  loop-key  — same but keys precomputed (isolates the fold_in dispatches)
  scan-k    — ONE dispatch running k steps over stacked [k,B,...] data

Usage: python -u work/prof_multistep.py > work/multistep.log 2>&1
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

SIZE, BATCH, N = 256, 8, 32
model = piv_liteflownet(version=1)
tx, _ = make_optimizer(model.params, model.cfg.lowest_level)
pipe = Pipeline(
    crop_size=(SIZE, SIZE), translate=16, scale_range=(0.95, 1.45),
    hflip=True, vflip=True,
    photometric=Photometric((0.0, 0.04), (-0.8, 0.4), 0.2, (0.5, 2.0), (0.7, 1.5)),
)
step = make_train_step(model.cfg, piv_loss(version=1), tx,
                       pipeline=pipe, compute_dtype=jnp.bfloat16)

key = jax.random.PRNGKey(0)
H = W = int(SIZE * 1.5)
img1 = jax.random.uniform(key, (BATCH, H, W, 3), jnp.float32)
img2 = jax.random.uniform(jax.random.fold_in(key, 1), (BATCH, H, W, 3), jnp.float32)
target = jax.random.normal(jax.random.fold_in(key, 2), (BATCH, H, W, 2), jnp.float32) * 2


def fresh_state():
    p0 = jax.tree.map(jnp.array, model.params)
    return TrainState(p0, tx.init(p0), jnp.zeros((), jnp.int32))


# --- case 1: today's loop -------------------------------------------------
state = fresh_state()
k = jax.random.PRNGKey(7)
state, m = step(state, img1, img2, target, k)
state, m = step(state, img1, img2, target, jax.random.fold_in(k, 1))
float(m["loss"])
t0 = time.perf_counter()
for i in range(N):
    state, m = step(state, img1, img2, target, jax.random.fold_in(k, 2 + i))
float(m["loss"])
dt = (time.perf_counter() - t0) / N
print(f"loop       : {1e3*dt:7.1f} ms/step = {BATCH/dt:6.1f} samples/s", flush=True)

# --- case 2: precomputed keys --------------------------------------------
state = fresh_state()
keys = list(jax.random.split(jax.random.PRNGKey(9), N + 2))
state, m = step(state, img1, img2, target, keys[0])
state, m = step(state, img1, img2, target, keys[1])
float(m["loss"])
t0 = time.perf_counter()
for i in range(N):
    state, m = step(state, img1, img2, target, keys[2 + i])
float(m["loss"])
dt = (time.perf_counter() - t0) / N
print(f"loop-key   : {1e3*dt:7.1f} ms/step = {BATCH/dt:6.1f} samples/s", flush=True)

# --- case 3: k-step scan per dispatch -------------------------------------
for K in (4, 8, 16):
    def multi(state, batches, keys):
        def body(s, xkey):
            (a, b, t), kk = xkey
            s, mm = step(s, a, b, t, kk)  # nested jit inlines under the scan trace
            return s, mm["loss"]
        return jax.lax.scan(body, state, (batches, keys))

    multi_j = jax.jit(multi, donate_argnums=(0,))

    bat = (jnp.broadcast_to(img1, (K, *img1.shape)),
           jnp.broadcast_to(img2, (K, *img2.shape)),
           jnp.broadcast_to(target, (K, *target.shape)))
    kk = jax.random.split(jax.random.PRNGKey(11), K)
    state = fresh_state()
    state, losses = multi_j(state, bat, kk)
    state, losses = multi_j(state, bat, kk)
    float(losses[-1])
    reps = max(1, N // K)
    t0 = time.perf_counter()
    for _ in range(reps):
        state, losses = multi_j(state, bat, kk)
    float(losses[-1])
    dt = (time.perf_counter() - t0) / (reps * K)
    print(f"scan-{K:<2d}    : {1e3*dt:7.1f} ms/step = {BATCH/dt:6.1f} samples/s",
          flush=True)
