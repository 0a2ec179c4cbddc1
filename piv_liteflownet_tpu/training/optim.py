"""Optimizer with the reference's 4-way param groups + MultiStepLR, in optax.

The reference builds 4 torch param groups (reference ``trainer.py:400-419``):

1. ``.weight`` tensors of NetE_{M,S,R} modules whose pyramid level < 4
   -> lr 6e-5, weight_decay
2. all other ``.weight`` -> default lr, weight_decay
3. ``.bias`` of NetE level<4 -> lr 6e-5, bias_decay
4. all other ``.bias`` -> default lr, bias_decay

Decay is torch-style L2 (grad += wd * param before the moment update), not
AdamW. ``MultiStepLR`` multiplies every group's base lr by gamma at each
milestone epoch.

Implemented as ``optax.multi_transform`` over key labels with
``inject_hyperparams`` so the per-epoch scheduler can rewrite ``lr`` on device
without rebuilding state.
"""

from __future__ import annotations

import bisect
import os
from typing import Dict, Sequence

import jax
import optax


def flat_opt_mode() -> str:
    """The PIV_FLAT_OPT probe knob ("0" per-leaf default / "1" full flatten /
    "2" moments-only). optax.flatten changes the opt-state pytree structure,
    so checkpoints are only restorable under the same mode — trainer records
    this value in checkpoint metadata and verifies it on --resume."""
    return os.environ.get("PIV_FLAT_OPT", "0")


def param_group_labels(params: Dict[str, jax.Array], lowest_level: int) -> Dict[str, str]:
    """Label each flat param key with its reference param group."""
    def_id = {i for i, level in enumerate(range(lowest_level, 7)) if level < 4}
    labels = {}
    for name in params:
        parts = name.split(".")
        is_bias = parts[-1] == "bias"
        in_low = parts[0].startswith("NetE") and len(parts) > 1 and int(parts[1]) in def_id
        labels[name] = ("b" if is_bias else "w") + ("_lo" if in_low else "_hi")
    return labels


# ---------------------------------------------------------------------------
# Optimizer registry (reflective CLI surface)
#
# The reference exposes EVERY ``torch.optim`` class by name with
# auto-generated ``--optimizer_<param>`` flags (reference ``trainer.py:60-66``,
# ``src/utils.py:55-111``). The TPU equivalent: a registry of optax-backed
# factories whose python signatures carry the torch parameter names/defaults —
# ``utils.config.add_arguments_for_module`` reflects them into flags. Each
# factory returns the *gradient direction* transform (pre-lr); the 4-group
# wrapper below adds torch-style L2 decay (grad += wd*p), the negative lr
# scale, and ``inject_hyperparams`` so schedulers can rewrite lr on device.
# ---------------------------------------------------------------------------

def _torch_Adam(betas=(0.9, 0.999), eps=1e-8, amsgrad=False):
    if amsgrad:
        if not hasattr(optax, "scale_by_amsgrad"):
            raise ValueError(
                "optimizer_amsgrad=True needs optax.scale_by_amsgrad, which "
                "this optax version lacks; use amsgrad=False"
            )
        return optax.scale_by_amsgrad(b1=betas[0], b2=betas[1], eps=eps), False
    return optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps), False


def _torch_AdamW(betas=(0.9, 0.999), eps=1e-8, amsgrad=False):
    inner, _ = _torch_Adam(betas, eps, amsgrad)
    return inner, True  # decoupled decay


def _torch_SGD(momentum=0.0, dampening=0.0, nesterov=False):
    if dampening:
        # optax.trace has no dampening; refuse rather than silently change
        # the update rule (torch's default is 0.0).
        raise ValueError("SGD dampening != 0 is not supported by the optax backend")
    return optax.trace(decay=momentum, nesterov=nesterov), False


def _torch_RMSprop(alpha=0.99, eps=1e-8, momentum=0.0, centered=False):
    inner = optax.scale_by_rms(decay=alpha, eps=eps) if not centered else \
        optax.scale_by_stddev(decay=alpha, eps=eps)
    if momentum:
        inner = optax.chain(inner, optax.trace(decay=momentum))
    return inner, False


def _torch_Adagrad(eps=1e-10):
    return optax.scale_by_rss(initial_accumulator_value=0.0, eps=eps), False


def _torch_Adadelta(rho=0.9, eps=1e-6):
    return optax.scale_by_adadelta(rho=rho, eps=eps), False


def _torch_Adamax(betas=(0.9, 0.999), eps=1e-8):
    return optax.scale_by_adamax(b1=betas[0], b2=betas[1], eps=eps), False


def _torch_NAdam(betas=(0.9, 0.999), eps=1e-8):
    return optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps, nesterov=True), False


def _torch_RAdam(betas=(0.9, 0.999), eps=1e-8):
    return optax.scale_by_radam(b1=betas[0], b2=betas[1], eps=eps), False


def _extra_Lion(betas=(0.9, 0.99)):
    return optax.scale_by_lion(b1=betas[0], b2=betas[1]), True


def _extra_Lamb(betas=(0.9, 0.999), eps=1e-6):
    return optax.chain(
        optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
        optax.scale_by_trust_ratio(),
    ), True


def _extra_Yogi(betas=(0.9, 0.999), eps=1e-3):
    return optax.scale_by_yogi(b1=betas[0], b2=betas[1], eps=eps), False


def _extra_Novograd(betas=(0.9, 0.25), eps=1e-8):
    return optax.scale_by_novograd(b1=betas[0], b2=betas[1], eps=eps), False


#: name -> factory(**kw) returning (direction_transform, decoupled_wd).
#: torch.optim-parity names first, TPU-era extras after.
OPTIMIZERS = {
    "Adam": _torch_Adam,
    "AdamW": _torch_AdamW,
    "SGD": _torch_SGD,
    "RMSprop": _torch_RMSprop,
    "Adagrad": _torch_Adagrad,
    "Adadelta": _torch_Adadelta,
    "Adamax": _torch_Adamax,
    "NAdam": _torch_NAdam,
    "RAdam": _torch_RAdam,
    "Lion": _extra_Lion,
    "Lamb": _extra_Lamb,
    "Yogi": _extra_Yogi,
    "Novograd": _extra_Novograd,
}
# prune factories whose optax primitive is missing in this optax version
OPTIMIZERS = {
    k: v for k, v in OPTIMIZERS.items()
    if all(hasattr(optax, a) for a in {
        "Adam": ["scale_by_adam"], "AdamW": ["scale_by_adam"],
        "SGD": ["trace"], "RMSprop": ["scale_by_rms", "scale_by_stddev"],
        "Adagrad": ["scale_by_rss"], "Adadelta": ["scale_by_adadelta"],
        "Adamax": ["scale_by_adamax"], "NAdam": ["scale_by_adam"],
        "RAdam": ["scale_by_radam"], "Lion": ["scale_by_lion"],
        "Lamb": ["scale_by_trust_ratio"], "Yogi": ["scale_by_yogi"],
        "Novograd": ["scale_by_novograd"],
    }[k])
}


def _group(optimizer: str, lr: float, wd: float, **kw):
    try:
        factory = next(f for n, f in OPTIMIZERS.items()
                       if n.lower() == optimizer.lower())
    except StopIteration:
        raise ValueError(
            f"unknown optimizer {optimizer!r}; available: {sorted(OPTIMIZERS)}"
        ) from None
    import inspect

    accepted = set(inspect.signature(factory).parameters)
    kw = {k: (tuple(v) if isinstance(v, list) else v)
          for k, v in kw.items() if k in accepted and v is not None}

    def make(lr):
        inner, decoupled = factory(**kw)
        # PIV_FLAT_OPT=2: flatten ONLY the moment math — weight decay (which
        # reads params) stays per-leaf, so params never enter the raveled
        # domain (probe for the flatten layout regression, see below).
        if flat_opt_mode() == "2":
            inner = optax.flatten(inner)
        if decoupled:
            # AdamW-style: update = -lr * (direction + wd * p)
            return optax.chain(
                inner,
                optax.add_decayed_weights(wd) if wd else optax.identity(),
                optax.scale(-lr),
            )
        # torch-style L2: grad += wd * p BEFORE the moment update
        return optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            inner,
            optax.scale(-lr),
        )

    # optax.flatten (opt-in, PIV_FLAT_OPT=1): run the group's moment/update
    # math on ONE raveled vector instead of ~100 per-leaf ops x 4 pipeline
    # stages. The train-step device bill attributes ~8.7 ms/step to optax's
    # per-leaf kernels at 256^2 b8 (work/train_bill.log), and flattening
    # removes exactly that (bill2: 0.07 ms) with bit-identical updates — BUT
    # in-model it REGRESSES the step 151 -> 203 ms/step: the params
    # reconstructed by reshape-from-flat feed XLA's layout assignment back
    # into every conv, and nn.py conv time grows 72.7 -> 116.4 ms/step
    # (work/train_bill2.log vs train_bill.log; A/B work/train_noflat.log vs
    # train_flat.log). Default therefore stays per-leaf; the knob and the
    # record stay for round 5 (a layout-pinning fix would recover the 8.7).
    tx = optax.inject_hyperparams(lambda lr: make(lr))(lr=lr)
    if flat_opt_mode() == "1":
        tx = optax.flatten(tx)
    return tx


def make_optimizer(
    params: Dict[str, jax.Array],
    lowest_level: int,
    optimizer: str = "Adam",
    lr: float = 1e-3,
    low_lr: float = 6e-5,
    weight_decay: float = 4e-4,
    bias_decay: float = 0.0,
    **kw,
):
    """Build the 4-group optimizer. Returns (tx, labels)."""
    labels = param_group_labels(params, lowest_level)
    tx = optax.multi_transform(
        {
            "w_lo": _group(optimizer, low_lr, weight_decay, **kw),
            "w_hi": _group(optimizer, lr, weight_decay, **kw),
            "b_lo": _group(optimizer, low_lr, bias_decay, **kw),
            "b_hi": _group(optimizer, lr, bias_decay, **kw),
        },
        labels,
    )
    return tx, labels


def multistep_lr(base_lr: float, epoch: int, milestones: Sequence[int], gamma: float = 0.1) -> float:
    """torch ``MultiStepLR``: base_lr * gamma^(#milestones <= epoch).

    Negative milestones are kept (the reference's default ``[-1]`` means the
    gamma applies from the first epoch, reference ``trainer.py:73``).
    """
    return base_lr * (gamma ** bisect.bisect_right(sorted(milestones), epoch))


# ---------------------------------------------------------------------------
# LR-scheduler registry (reflective CLI surface)
#
# The reference exposes every ``torch.optim.lr_scheduler`` class by name with
# auto ``--lr_scheduler_<param>`` flags (reference ``trainer.py:68-73``).
# Schedulers here are pure functions epoch -> lr (stateless — resume needs no
# scheduler state dict, unlike reference ``trainer.py:434-435``); factories
# carry the torch parameter names for flag reflection.
# ---------------------------------------------------------------------------

def _sched_MultiStepLR(base_lr, epoch, milestones=(-1,), gamma=0.1):
    return multistep_lr(base_lr, epoch, list(milestones), gamma)


def _sched_StepLR(base_lr, epoch, step_size=30, gamma=0.1):
    return base_lr * (gamma ** (epoch // step_size))


def _sched_ExponentialLR(base_lr, epoch, gamma=0.95):
    return base_lr * (gamma ** epoch)


def _sched_CosineAnnealingLR(base_lr, epoch, T_max=50, eta_min=0.0):
    import math

    return eta_min + (base_lr - eta_min) * (1 + math.cos(math.pi * epoch / T_max)) / 2


def _sched_ConstantLR(base_lr, epoch):
    del epoch
    return base_lr


SCHEDULERS = {
    "MultiStepLR": _sched_MultiStepLR,
    "StepLR": _sched_StepLR,
    "ExponentialLR": _sched_ExponentialLR,
    "CosineAnnealingLR": _sched_CosineAnnealingLR,
    "ConstantLR": _sched_ConstantLR,
    "None": _sched_ConstantLR,
}


def schedule_lr(name: str, base_lr: float, epoch: int, **kw) -> float:
    """Evaluate scheduler ``name`` at ``epoch`` with its reflected kwargs
    (unknown kwargs from the union flag surface are dropped)."""
    import inspect

    fn = SCHEDULERS[name]
    accepted = set(inspect.signature(fn).parameters) - {"base_lr", "epoch"}
    kw = {k: v for k, v in kw.items() if k in accepted and v is not None}
    return fn(base_lr, epoch, **kw)


def set_group_lrs(opt_state, lrs: Dict[str, float]):
    """Rewrite the injected ``lr`` hyperparam of each group's state."""
    inner = dict(opt_state.inner_states)
    for label, lr in lrs.items():
        st = inner[label]
        hp = dict(st.inner_state.hyperparams)
        hp["lr"] = lr
        inner[label] = st._replace(inner_state=st.inner_state._replace(hyperparams=hp))
    return opt_state._replace(inner_states=inner)
