"""Device-timeline profile of the TRAINING step (256^2 b8 bf16, aug in-jit).

The r4 ablation bounds warp fwd+bwd at ~44 ms/step; the timeline shows how
much of that is the backward scatter-adds of the warp gathers (the round-5
Pallas-scatter candidate) vs the forward gathers.

Usage: python -u work/prof_trace_train.py > log 2>&1
"""

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from piv_liteflownet_tpu.data.transforms import Photometric, Pipeline
from piv_liteflownet_tpu.models.factory import piv_liteflownet
from piv_liteflownet_tpu.parallel.train_step import TrainState, make_train_step
from piv_liteflownet_tpu.training.loss import piv_loss
from piv_liteflownet_tpu.training.optim import make_optimizer

SIZE, BATCH, NEXEC = 256, 8, 3
OUTDIR = "/root/repo/work/trace_train_256_b8"

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
target = jax.random.normal(jax.random.fold_in(key, 2), (BATCH, H, W, 2), jnp.float32)
state = TrainState(jax.tree.map(jnp.array, model.params),
                   tx.init(model.params), jnp.zeros((), jnp.int32))

state, m = step(state, img1, img2, target, jax.random.PRNGKey(7))
print("warm loss:", float(m["loss"]), flush=True)

with jax.profiler.trace(OUTDIR):
    for i in range(NEXEC):
        state, m = step(state, img1, img2, target, jax.random.fold_in(key, i))
        float(m["loss"])

traces = sorted(glob.glob(os.path.join(OUTDIR, "plugins/profile/*/*.trace.json.gz")))
with gzip.open(traces[-1]) as f:
    t = json.load(f)

dev_pids = {e["pid"] for e in t["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "TPU" in e["args"].get("name", "")}
ev = [e for e in t["traceEvents"]
      if e.get("ph") == "X" and e.get("pid") in dev_pids]
ops = [e for e in ev if not e["name"].startswith("jit_")]
top = [e for e in ev if e["name"].startswith("jit_")]
span = sum(e["dur"] for e in top) / max(1, len(top))
busy = sum(e["dur"] for e in ops) / max(1, NEXEC)
print(f"per-exec span {span/1e3:.2f} ms, op-busy {busy/1e3:.2f} ms", flush=True)

agg, cnt = collections.Counter(), collections.Counter()
for e in ops:
    agg[e["name"]] += e["dur"]
    cnt[e["name"]] += 1

scat = sum(d for n, d in agg.items() if "scatter" in n)
gath = sum(d for n, d in agg.items() if "gather" in n or "dynamic" in n)
print(f"scatter total {scat/1e3/NEXEC:.2f} ms/step, "
      f"gather/dynamic total {gath/1e3/NEXEC:.2f} ms/step", flush=True)

print("\n-- top 45 ops --", flush=True)
for name, d in agg.most_common(45):
    print(f"  {d/1e3/NEXEC:8.3f} ms  x{cnt[name]//NEXEC:<4d} {name[:90]}",
          flush=True)
