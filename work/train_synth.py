"""Train PIV-LiteFlowNet-en v1 from scratch on streaming synthetic PIV data.

The capability proof VERDICT r2 asked for: the reference's pretrained
`.paramOnly` weights demonstrate that its training stack produces a model
that measures flow (reference ``run.py:217-226``); ours must demonstrate the
same end-to-end. Data streams from the on-device particle generator
(``data/piv_gen.py``) — random smooth low-frequency flow fields + analytic
vortex/shear/sine fields — so no host I/O touches the hot loop.

Success gate: held-out val EPE <= 0.3 px mean at 256^2 (VERDICT r2 item 3).
Writes work/synth_run/metrics.jsonl and a final params npz.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from piv_liteflownet_tpu.data.piv_gen import (
    ParticleImageGen, shear_flow, sine_flow, vortex_flow,
)
from piv_liteflownet_tpu.models.factory import piv_liteflownet
from piv_liteflownet_tpu.models.liteflownet import forward
from piv_liteflownet_tpu.parallel.train_step import TrainState, make_train_step
from piv_liteflownet_tpu.training.loss import EPE, piv_loss
from piv_liteflownet_tpu.training.optim import make_optimizer

SIZE = 256
VERSION = int(os.environ.get("SYNTH_VERSION", "1"))
BATCH = int(os.environ.get("SYNTH_BATCH", "8"))
MAX_STEPS = int(os.environ.get("SYNTH_STEPS", "12000"))
VAL_EVERY = 200
TARGET_EPE = 0.3
OUT = "/root/repo/work/synth_run" + ("" if int(os.environ.get("SYNTH_VERSION", "1")) == 1 else "_v2")
os.makedirs(OUT, exist_ok=True)

model = piv_liteflownet(version=VERSION)
cfg = model.cfg
gen = ParticleImageGen(image_size=(SIZE, SIZE))


def random_flow(key):
    """Random smooth flow: uniform drift + low-frequency bumps + a random
    blend of the analytic fields (each scaled randomly)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    drift = jax.random.uniform(k1, (1, 1, 2), minval=-2.5, maxval=2.5)
    bumps = jax.random.normal(k2, (SIZE // 32, SIZE // 32, 2)) * \
        jax.random.uniform(k3, (), minval=0.2, maxval=1.2)
    bumps = jax.image.resize(bumps, (SIZE, SIZE, 2), "linear")
    w = jax.random.dirichlet(k4, jnp.ones(3) * 0.5)
    analytic = (
        w[0] * vortex_flow(SIZE, SIZE, strength=2.0)
        + w[1] * shear_flow(SIZE, SIZE, strength=2.5)
        + w[2] * sine_flow(SIZE, SIZE, amp=1.5)
    )
    return drift + bumps + analytic


@jax.jit
def make_batch(key):
    kf, kg = jax.random.split(key)
    flows = jax.vmap(random_flow)(jax.random.split(kf, BATCH))
    img1, img2 = gen.generate_batch(kg, flows)
    return img1, img2, flows


# weight_decay MUST be 0 for from-scratch training: piv_loss level weights
# (0.001..0.01) put the median loss-grad norm at ~2.5e-7 vs the L2 decay
# term 4e-4*|w| ~ 2.5e-4 — decay swamps the signal 1000:1 and Adam's
# direction becomes pure shrinkage (measured: 8400 frozen steps, val EPE
# 2.317 flat). The reference only ever fine-tunes from pretrained weights,
# where staying near the init is the point of the decay.
tx, _ = make_optimizer(model.params, cfg.lowest_level, optimizer="Adam",
                       lr=float(os.environ.get("SYNTH_LR", "1e-4")),
                       low_lr=6e-5, weight_decay=0.0)
if VERSION == 1:
    loss_obj = piv_loss(version=1)
else:
    # The reference's v2 training path is latently broken: its v2 forward
    # emits 6 training outputs (5 levels + the full-res upsample, reference
    # src/models.py:705-714) but piv_loss(version=2) carries 5 weights and
    # MultiScale asserts len equality (src/loss.py:126). Train with the
    # 6-weight extension (upsampled output weighted like the finest level).
    from piv_liteflownet_tpu.training.loss import MultiScale

    loss_obj = MultiScale(div_scale=1 / 5, startScale=2,
                          l_weight=(0.001, 0.001, 0.001, 0.001, 0.01, 0.01))
step_fn = make_train_step(cfg, loss_obj, tx)
state = TrainState(model.params, tx.init(model.params), jnp.zeros((), jnp.int32))


@jax.jit
def val_epe(params, img1, img2, flows):
    out = forward(params, img1, img2, cfg, train=False)
    if out.shape[1] != img1.shape[1]:
        # v2 eval flow is on the half-res grid with values already in
        # input-pixel units (estimate() does the same resize, inference.py)
        from piv_liteflownet_tpu.ops.resize import resize_bilinear

        out = resize_bilinear(out, img1.shape[1], img1.shape[2])
    return EPE(out, flows, mean=True)


# fixed held-out set: 4 batches from a disjoint key range
val_sets = [make_batch(jax.random.PRNGKey(900000 + i)) for i in range(4)]
val_sets = [tuple(np.asarray(t) for t in s) for s in val_sets]  # freeze

metrics_path = os.path.join(OUT, "metrics.jsonl")
ckpt_path = os.path.join(OUT, "ckpt.npz")
start_step = 0
if os.environ.get("SYNTH_RESUME") and not os.path.exists(ckpt_path) \
        and os.path.exists(os.path.join(OUT, "params_final.npz")):
    # params-only fallback (runs from before periodic ckpts): fresh Adam state
    loaded = np.load(os.path.join(OUT, "params_final.npz"))
    params = {k: jnp.asarray(loaded[k]) for k in loaded.files}
    state = TrainState(params, tx.init(params),
                       jnp.asarray(int(os.environ.get("SYNTH_START", "12000"))))
    start_step = int(state.step)
    print(f"resumed params-only at step {start_step}", flush=True)
elif os.environ.get("SYNTH_RESUME") and os.path.exists(ckpt_path):
    import pickle

    with open(ckpt_path, "rb") as fh:
        saved = pickle.load(fh)
    state = TrainState(
        jax.tree.map(jnp.asarray, saved["params"]),
        jax.tree.map(jnp.asarray, saved["opt_state"]),
        jnp.asarray(saved["step"]),
    )
    start_step = int(saved["step"])
    print(f"resumed from {ckpt_path} at step {start_step}", flush=True)
mode = "a" if start_step else "w"
mf = open(metrics_path, mode, buffering=1)


def save_ckpt(state):
    import pickle

    tmp = ckpt_path + ".tmp"
    with open(tmp, "wb") as fh:
        pickle.dump({
            "params": jax.tree.map(np.asarray, state.params),
            "opt_state": jax.tree.map(np.asarray, state.opt_state),
            "step": int(state.step),
        }, fh)
    os.replace(tmp, ckpt_path)


key = jax.random.PRNGKey(int(os.environ.get("SYNTH_SEED", "7")) + start_step)
t0 = time.time()
best = 1e9
for step in range(start_step + 1, start_step + MAX_STEPS + 1):
    key, kb, ks = jax.random.split(key, 3)
    img1, img2, flows = make_batch(kb)
    state, m = step_fn(state, img1, img2, flows, ks)
    if step % VAL_EVERY == 0 or step == 1:
        loss = float(m["loss"])
        epes = [float(val_epe(state.params, *s)) for s in val_sets]
        epe = sum(epes) / len(epes)
        best = min(best, epe)
        rec = {"step": step, "train_loss": loss, "val_epe_px": round(epe, 4),
               "elapsed_s": round(time.time() - t0, 1)}
        mf.write(json.dumps(rec) + "\n")
        print(rec, flush=True)
        if step % 2000 == 0:
            save_ckpt(state)
        if loss != loss:
            print("NaN loss - aborting", flush=True)
            break
        if epe <= TARGET_EPE:
            print(f"TARGET REACHED: val EPE {epe:.4f} <= {TARGET_EPE} "
                  f"at step {step} ({time.time()-t0:.0f}s)", flush=True)
            break

np.savez(os.path.join(OUT, "params_final.npz"),
         **{k: np.asarray(v) for k, v in state.params.items()})
print(f"done: best val EPE {best:.4f} px, saved {OUT}/params_final.npz", flush=True)
