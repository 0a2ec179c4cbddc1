"""Train-step throughput under per-compile XLA compiler options.

The r5 wall table says the 55.7 ms conv weight-grad wall is a
scheduling/dependency gap (4-5x the wgrad kernels' busy sum), and the r5
adjudication showed no kernel reformulation recovers it. Compiler
scheduling flags were swept on the INFERENCE programs in r4 (lhs neutral
on v2, negative on v1) but never on the GRAD program, whose dependency
graph is where the gap lives. XLA_FLAGS cannot carry xla_tpu_* names on
this rig (local jaxlib aborts; work/r4_runner.log:89) — the validated
route is jit(...).lower().compile(compiler_options=...) which IS
forwarded to the axon remote compiler (work/copts_validate.log).

Usage: python -u work/prof_r5_train_copts.py <name>
  name in COPTS below; env knobs (PIV_WARP_VJP, PIV_TVJP_RY,
  PIV_RESIZE_HALF) ride the package's trace-time flags as usual.
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

COPTS = {
    "baseline": None,
    "lhs": {"xla_tpu_enable_latency_hiding_scheduler": True},
    "rwb_off": {"xla_tpu_rwb_fusion": False},
    "vmem96M": {"xla_tpu_scoped_vmem_limit_kib": 98304},
    "mbl_opt": {"xla_tpu_enable_memory_bound_loop_optimizer": True},
    "lhs_vmem96M": {"xla_tpu_enable_latency_hiding_scheduler": True,
                    "xla_tpu_scoped_vmem_limit_kib": 98304},
}

NAME = sys.argv[1] if len(sys.argv) > 1 else "lhs"
SIZE, BATCH, N = 256, 8, 30

model = piv_liteflownet(version=1)
import dataclasses

# pin the VJP route explicitly (default "gather" = the r4/r5 control even
# after the package default flipped to "tent")
cfg = dataclasses.replace(model.cfg,
                          warp_vjp=os.environ.get("PIV_WARP_VJP", "gather"))
tx, _ = make_optimizer(model.params, cfg.lowest_level)
pipe = Pipeline(
    crop_size=(SIZE, SIZE), translate=16, scale_range=(0.95, 1.45),
    hflip=True, vflip=True,
    photometric=Photometric((0.0, 0.04), (-0.8, 0.4), 0.2, (0.5, 2.0), (0.7, 1.5)),
)
step = make_train_step(cfg, piv_loss(version=1), tx, pipeline=pipe,
                       compute_dtype=jnp.bfloat16)

key = jax.random.PRNGKey(0)
H = W = int(SIZE * 1.5)
img1 = jax.random.uniform(key, (BATCH, H, W, 3), jnp.float32)
img2 = jax.random.uniform(jax.random.fold_in(key, 1), (BATCH, H, W, 3), jnp.float32)
target = jax.random.normal(jax.random.fold_in(key, 2), (BATCH, H, W, 2), jnp.float32) * 2

p0 = jax.tree.map(jnp.array, model.params)
state = TrainState(p0, tx.init(p0), jnp.zeros((), jnp.int32))

t0 = time.time()
lowered = step.lower(state, img1, img2, target, key)
compiled = lowered.compile(compiler_options=COPTS[NAME])
print(f"compile {NAME}: {time.time() - t0:.1f} s", flush=True)

for i in range(3):
    state, m = compiled(state, img1, img2, target, jax.random.PRNGKey(i))
float(m["loss"])
t0 = time.time()
for i in range(N):
    state, m = compiled(state, img1, img2, target, jax.random.PRNGKey(100 + i))
float(m["loss"])
dt = (time.time() - t0) / N
print(f"copts {NAME:<14s}: {dt * 1000:7.1f} ms/step = "
      f"{BATCH / dt:6.2f} samples/s  (loss {float(m['loss']):.4f})", flush=True)
