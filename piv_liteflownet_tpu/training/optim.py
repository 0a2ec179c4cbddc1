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
from typing import Dict, Sequence

import jax
import optax


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


def _group(optimizer: str, lr: float, wd: float, **kw):
    def make(lr):
        if optimizer.lower() == "adam":
            inner = optax.scale_by_adam(
                b1=kw.get("b1", 0.9), b2=kw.get("b2", 0.999), eps=kw.get("eps", 1e-8)
            )
        elif optimizer.lower() == "sgd":
            inner = optax.trace(decay=kw.get("momentum", 0.0), nesterov=kw.get("nesterov", False))
        elif optimizer.lower() == "adamw":
            # decoupled decay handled by optax.adamw semantics
            return optax.inject_hyperparams(
                lambda lr: optax.adamw(lr, weight_decay=wd)
            )(lr=lr)
        else:
            raise ValueError(f"unknown optimizer {optimizer!r} (Adam/SGD/AdamW)")
        return optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            inner,
            optax.scale(-lr),
        )

    return optax.inject_hyperparams(lambda lr: make(lr))(lr=lr)


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


def set_group_lrs(opt_state, lrs: Dict[str, float]):
    """Rewrite the injected ``lr`` hyperparam of each group's state."""
    inner = dict(opt_state.inner_states)
    for label, lr in lrs.items():
        st = inner[label]
        hp = dict(st.inner_state.hyperparams)
        hp["lr"] = lr
        inner[label] = st._replace(inner_state=st.inner_state._replace(hyperparams=hp))
    return opt_state._replace(inner_states=inner)
