"""The jitted training step: forward + multiscale loss + grads + optimizer.

One XLA program per step (the reference's per-batch ``backward()`` /
``optimizer.step()`` pair plus DataParallel scatter/gather, reference
``trainer.py:128-140``, collapses into a single SPMD computation). Sharding:
batch over the mesh ``data`` axis, params/opt-state replicated; XLA emits the
gradient all-reduce over ICI.

Optionally runs the fused device-side augmentation pipeline *inside* the same
program, so raw decoded frames stream host->device once and everything else
stays on chip.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from piv_liteflownet_tpu.data.transforms import Pipeline, apply_pipeline
from piv_liteflownet_tpu.models.liteflownet import ModelConfig, forward

Params = Dict[str, jax.Array]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Params
    opt_state: Any
    step: jax.Array


def make_train_step(
    cfg: ModelConfig,
    loss_obj,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    pipeline: Optional[Pipeline] = None,
    precision=None,
    remat: bool = False,
    compute_dtype=None,
    donate_inputs: bool = False,
) -> Callable:
    """Build ``step(state, img1, img2, target, key) -> (state, metrics)``.

    img1/img2: [B, H, W, 3]; target: [B, H, W, 2] raw (un-divided) flow.
    With ``pipeline``, augmentation+crop run on device first. With ``mesh``,
    the step is jitted with batch sharded over the mesh's first axis and the
    state replicated.

    ``compute_dtype=jnp.bfloat16`` runs the forward/backward in bf16 while
    the master params, the loss pyramid, and the optimizer state stay f32
    (mixed precision): params/inputs are cast at the forward boundary, so
    autodiff returns f32 gradients into the f32 optimizer.
    """

    fwd = forward
    if remat:
        fwd = jax.checkpoint(forward, static_argnums=(3, 4, 5))

    def loss_fn(params, img1, img2, target):
        if compute_dtype is not None:
            params = jax.tree.map(lambda p: p.astype(compute_dtype), params)
            img1 = img1.astype(compute_dtype)
            img2 = img2.astype(compute_dtype)
        out = fwd(params, img1, img2, cfg, True, precision)
        if compute_dtype is not None:
            # loss pyramid in f32: bf16 norm/EPE accumulation over 256^2
            # pixels loses ~3 decimal digits
            out = jax.tree.map(lambda o: o.astype(jnp.float32), out)
        lossvalue, epevalue = loss_obj(out, target)
        # per-level losses (LevelLoss returns lists, reference
        # src/loss.py:151-190) train on their sum; the reference trainer
        # crashes on .backward() of a list, so the summed objective is the
        # working equivalent of its intent
        if isinstance(lossvalue, (tuple, list)):
            lossvalue = sum(lossvalue)
        if isinstance(epevalue, (tuple, list)):
            epevalue = sum(epevalue)
        return lossvalue, epevalue

    def step(state: TrainState, img1, img2, target, key):
        if pipeline is not None:
            img1, img2, target = apply_pipeline(key, img1, img2, target, pipeline)
        (lossvalue, epevalue), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, img1, img2, target
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": lossvalue, "epe": epevalue}
        return TrainState(params, opt_state, state.step + 1), metrics

    # ``donate_inputs`` additionally donates the image/target buffers: the
    # trainer's prefetch pipeline device_puts each batch exactly once, so
    # their HBM (3x [B,H,W,3] + [B,H,W,2]) is free for step intermediates.
    # Off by default — callers that replay a batch (tests, microbenches)
    # would hit donated-buffer errors.
    donate = (0, 1, 2, 3) if donate_inputs else (0,)
    if mesh is None:
        return jax.jit(step, donate_argnums=donate)

    axis = mesh.axis_names[0]
    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P(axis))
    return jax.jit(
        step,
        in_shardings=(repl, batched, batched, batched, repl),
        out_shardings=(repl, repl),
        donate_argnums=donate,
    )


def make_eval_step(cfg: ModelConfig, loss_obj, mesh: Optional[Mesh] = None, precision=None):
    """Validation step: eval-mode forward + loss (reference validation branch,
    ``trainer.py:110-154``). Returns (loss, epe)."""

    def step(params, img1, img2, target):
        # eval-mode forward returns the final SCALEFACTOR[1]-scaled flow; the
        # loss takes its non-list branch (reference src/loss.py:144-148)
        out = forward(params, img1, img2, cfg, train=False, precision=precision)
        try:
            lossvalue, epevalue = loss_obj(out, target)
        except ValueError:
            # losses without an eval branch (LevelLoss raises on non-list
            # output, reference src/loss.py:173-174): score the final flow
            # against the startScale-pooled target like MultiScale eval
            from piv_liteflownet_tpu.training.loss import EPE, avg_pool

            target_ = avg_pool(
                getattr(loss_obj, "div_scale", 1.0) * target,
                getattr(loss_obj, "startScale", 1),
            )
            epevalue = EPE(out, target_)
            lossvalue = epevalue
        if isinstance(lossvalue, (tuple, list)):
            lossvalue = sum(lossvalue)
        if isinstance(epevalue, (tuple, list)):
            epevalue = sum(epevalue)
        return {"loss": lossvalue, "epe": epevalue}

    if mesh is None:
        return jax.jit(step)
    axis = mesh.axis_names[0]
    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P(axis))
    return jax.jit(step, in_shardings=(repl, batched, batched, batched), out_shardings=repl)
