"""Round-5 train-step WALL attribution: which backward component actually
holds the step's critical path?

The r4o lesson (BASELINE.md): the HLO-attributed bill is device BUSY time,
not critical path — optax's 8.7 ms of busy kernels cost 0 wall. Before
building any backward kernel (warp-VJP tent-transpose, wgrad conv layouts),
measure each candidate's WALL contribution by removing exactly that gradient
subgraph with a custom_vjp that returns zeros, leaving everything else (incl.
the optimizer and the rest of the backward) intact.

Configs (256^2 b8 bf16, aug on — the r4 headline config, 150.8 ms/step):
  base        : unmodified step
  fwdloss     : forward+loss only (no grad/optimizer) — the forward wall
  scatter0    : warp img-grad (the packed-array scatter-add) zeroed,
                flow-grad kept real -> upper bound of a perfect scatter kernel
  warpgrad0   : warp img+flow grads zeroed
  wgrad0      : conv2d weight-grads zeroed (data-grads kept) -> upper bound
                of a perfect wgrad-conv schedule
  biasonly0   : conv2d weight+bias grads zeroed (data-grads kept)

Interpretation: (base - scatter0) is the scatter's wall share; if it's small
while the bill says 21 ms busy, the scatter is latency-hidden and the kernel
is dead on arrival (skip to wgrad). Same logic for wgrad0.
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

import piv_liteflownet_tpu.models.liteflownet as lfn
import piv_liteflownet_tpu.ops.warp as warpmod
from piv_liteflownet_tpu.data.transforms import Photometric, Pipeline
from piv_liteflownet_tpu.models.factory import piv_liteflownet
from piv_liteflownet_tpu.parallel.train_step import TrainState, make_train_step
from piv_liteflownet_tpu.training.loss import piv_loss
from piv_liteflownet_tpu.training.optim import make_optimizer

SIZE, BATCH, N = 256, 8, 30

ORIG_GATHER = warpmod.gather_warp
ORIG_BANDED = warpmod.gather_warp_banded
ORIG_CONV = lfn.conv2d


def patched_gather(zero_flow: bool):
    """gather_warp with the packed-operand grad (the scatter-add) zeroed."""

    @functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 4))
    def gw(packed, h, w, flow, stride=1):
        return ORIG_GATHER(packed, h, w, flow, stride)

    def fwd(packed, h, w, flow, stride):
        return gw(packed, h, w, flow, stride), (packed, flow)

    def bwd(h, w, stride, res, g):
        packed, flow = res
        if zero_flow:
            return jnp.zeros_like(packed), jnp.zeros_like(flow)
        _, pull = jax.vjp(lambda f: ORIG_GATHER(packed, h, w, f, stride), flow)
        (gflow,) = pull(g)
        return jnp.zeros_like(packed), gflow

    gw.defvjp(fwd, bwd)
    return gw


def patched_banded(zero_flow: bool):
    @functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 4, 5, 6))
    def gwb(packed, h, w, flow, starts, bh2, stride=1):
        return ORIG_BANDED(packed, h, w, flow, starts, bh2, stride)

    def fwd(packed, h, w, flow, starts, bh2, stride):
        return gwb(packed, h, w, flow, starts, bh2, stride), (packed, flow)

    def bwd(h, w, starts, bh2, stride, res, g):
        packed, flow = res
        if zero_flow:
            return jnp.zeros_like(packed), jnp.zeros_like(flow)
        _, pull = jax.vjp(
            lambda f: ORIG_BANDED(packed, h, w, f, starts, bh2, stride), flow)
        (gflow,) = pull(g)
        return jnp.zeros_like(packed), gflow

    gwb.defvjp(fwd, bwd)
    return gwb


def patched_conv(zero_w: bool, zero_x: bool = False):
    @functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
    def cv(x, w, b, stride=1, padding=0, precision=None):
        return ORIG_CONV(x, w, b, stride, padding, precision)

    def fwd(x, w, b, stride, padding, precision):
        return cv(x, w, b, stride, padding, precision), (x, w, b)

    def bwd(stride, padding, precision, res, g):
        x, w, b = res
        gx = jnp.zeros_like(x)
        gw_ = jnp.zeros_like(w)
        if not zero_x:
            _, pull = jax.vjp(
                lambda xx: ORIG_CONV(xx, w, b, stride, padding, precision), x)
            (gx,) = pull(g)
        if not zero_w:
            _, pull = jax.vjp(
                lambda ww: ORIG_CONV(x, ww, b, stride, padding, precision), w)
            (gw_,) = pull(g)
        gb = None if b is None else jnp.zeros_like(b)
        return gx, gw_, gb

    cv.defvjp(fwd, bwd)
    return cv


def set_patch(mode: str):
    # restore
    warpmod.gather_warp = ORIG_GATHER
    warpmod.gather_warp_banded = ORIG_BANDED
    lfn.gather_warp = ORIG_GATHER
    lfn.conv2d = ORIG_CONV
    if mode == "scatter0":
        g = patched_gather(zero_flow=False)
        warpmod.gather_warp = g
        lfn.gather_warp = g
        warpmod.gather_warp_banded = patched_banded(zero_flow=False)
    elif mode == "warpgrad0":
        g = patched_gather(zero_flow=True)
        warpmod.gather_warp = g
        lfn.gather_warp = g
        warpmod.gather_warp_banded = patched_banded(zero_flow=True)
    elif mode == "wgrad0":
        lfn.conv2d = patched_conv(zero_w=True)
    elif mode == "biasonly0":
        lfn.conv2d = patched_conv(zero_w=True)  # bias grads zeroed inside too


def main():
    model = piv_liteflownet(version=1)
    cfg = model.cfg
    tx, _ = make_optimizer(model.params, cfg.lowest_level)
    pipe = Pipeline(
        crop_size=(SIZE, SIZE), translate=16, scale_range=(0.95, 1.45),
        hflip=True, vflip=True,
        photometric=Photometric((0.0, 0.04), (-0.8, 0.4), 0.2, (0.5, 2.0),
                                (0.7, 1.5)),
    )
    key = jax.random.PRNGKey(0)
    H = W = int(SIZE * 1.5)
    img1 = jax.random.uniform(key, (BATCH, H, W, 3), jnp.float32)
    img2 = jax.random.uniform(jax.random.fold_in(key, 1), (BATCH, H, W, 3),
                              jnp.float32)
    target = jax.random.normal(jax.random.fold_in(key, 2), (BATCH, H, W, 2),
                               jnp.float32) * 2

    modes = sys.argv[1:] or ["base", "fwdloss", "scatter0", "warpgrad0",
                             "wgrad0"]
    for mode in modes:
        set_patch(mode if mode != "fwdloss" else "base")
        try:
            if mode == "fwdloss":
                from piv_liteflownet_tpu.data.transforms import apply_pipeline
                from piv_liteflownet_tpu.models.liteflownet import forward

                loss_obj = piv_loss(version=1)

                @jax.jit
                def fstep(params, i1, i2, tgt, k):
                    i1, i2, tgt = apply_pipeline(k, i1, i2, tgt, pipe)
                    p = jax.tree.map(lambda q: q.astype(jnp.bfloat16), params)
                    out = forward(p, i1.astype(jnp.bfloat16),
                                  i2.astype(jnp.bfloat16), cfg, True, None)
                    out = jax.tree.map(lambda o: o.astype(jnp.float32), out)
                    lv, ev = loss_obj(out, tgt)
                    return lv, ev

                for i in range(3):
                    lv, _ = fstep(model.params, img1, img2, target,
                                  jax.random.PRNGKey(i))
                float(lv)
                t0 = time.perf_counter()
                for i in range(N):
                    lv, _ = fstep(model.params, img1, img2, target,
                                  jax.random.PRNGKey(100 + i))
                float(lv)
                dt = (time.perf_counter() - t0) / N
            else:
                step = make_train_step(cfg, piv_loss(version=1), tx,
                                       pipeline=pipe,
                                       compute_dtype=jnp.bfloat16)
                p0 = jax.tree.map(jnp.array, model.params)
                state = TrainState(p0, tx.init(p0), jnp.zeros((), jnp.int32))
                for i in range(3):
                    state, m = step(state, img1, img2, target,
                                    jax.random.PRNGKey(i))
                float(m["loss"])
                t0 = time.perf_counter()
                for i in range(N):
                    state, m = step(state, img1, img2, target,
                                    jax.random.PRNGKey(100 + i))
                float(m["loss"])
                dt = (time.perf_counter() - t0) / N
            print(f"wall {mode:10s}: {dt*1000:7.1f} ms/step = "
                  f"{BATCH/dt:6.1f} samples/s", flush=True)
        except Exception as e:
            print(f"wall {mode:10s}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    set_patch("base")


if __name__ == "__main__":
    main()
