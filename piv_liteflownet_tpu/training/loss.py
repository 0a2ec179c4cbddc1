"""Multiscale training losses (parity with reference ``src/loss.py``).

All functions operate on NHWC flows ([B, H, W, 2]) and are pure/jittable.
Model training output is a list over pyramid levels (coarsest first), each a
list of [M, S, R] flows (reference ``src/models.py:365-367``), optionally plus
LiteFlowNet2's final upsampled flow (reference ``:709-713``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from piv_liteflownet_tpu.ops.resize import avg_pool


def EPE(input_flow: jax.Array, target_flow: jax.Array, mean: bool = True) -> jax.Array:
    """End-point error: mean (or sum/batch) of the L2 norm over flow channels
    (reference ``src/loss.py:12-21``)."""
    epe_map = jnp.linalg.norm(target_flow - input_flow, axis=-1)
    if mean:
        return jnp.mean(epe_map)
    return jnp.sum(epe_map) / epe_map.shape[0]


def _l1(output, target, mean=True):
    loss_map = jnp.abs(output - target)
    return jnp.mean(loss_map) if mean else jnp.sum(loss_map) / loss_map.shape[0]


def _l2(output, target, mean=True):
    loss_map = jnp.linalg.norm(output - target, axis=-1)
    return jnp.mean(loss_map) if mean else jnp.sum(loss_map) / loss_map.shape[0]


@dataclasses.dataclass(frozen=True)
class L1Loss:
    """reference ``src/loss.py:58-69``"""

    mul_scale: float = 1.0
    loss_labels = ("L1", "EPE")

    def __call__(self, output, target):
        return [self.mul_scale * _l1(output, target), self.mul_scale * EPE(output, target)]


@dataclasses.dataclass(frozen=True)
class L2Loss:
    """reference ``src/loss.py:72-83``"""

    mul_scale: float = 1.0
    loss_labels = ("L2", "EPE")

    def __call__(self, output, target):
        return [self.mul_scale * _l2(output, target), self.mul_scale * EPE(output, target)]


@dataclasses.dataclass(frozen=True)
class MultiScale:
    """Pyramid-weighted multiscale loss (reference ``src/loss.py:86-148``).

    ``output`` (training) is the model's per-level list; entry i is compared
    against the target average-pooled by ``startScale * 2**(numScales-1-i)``
    (entries beyond numScales use the raw target — LiteFlowNet2's full-res
    extra output). Target is pre-scaled by ``div_scale``.
    """

    div_scale: float = 0.05
    startScale: int = 2
    use_mean: bool = True
    l_weight: Tuple[float, ...] = (0.32, 0.08, 0.02, 0.01, 0.005)
    norm: str = "L1"

    @property
    def numScales(self) -> int:
        return 7 - self.startScale

    def _norm_fn(self, output, target):
        if self.norm == "L1":
            return _l1(output, target, self.use_mean)
        if self.norm == "L2":
            return _l2(output, target, self.use_mean)
        raise ValueError(f'Unknown "norm" ({self.norm})! Choose between L1 or L2 only!')

    def __call__(self, output, target):
        if isinstance(output, (tuple, list)):  # training mode
            assert len(self.l_weight) == len(output), (
                f"{len(self.l_weight)} loss weights vs {len(output)} pyramid outputs"
            )
            target = self.div_scale * target
            lossvalue = 0.0
            epevalue = 0.0
            for i, out_level in enumerate(output):
                if i < self.numScales:
                    k = self.startScale * (2 ** (self.numScales - 1 - i))
                    target_ = avg_pool(target, k)
                else:
                    target_ = target
                flows = out_level if isinstance(out_level, (tuple, list)) else [out_level]
                for f in flows:
                    epevalue += self.l_weight[i] * EPE(f, target_, mean=self.use_mean)
                    lossvalue += self.l_weight[i] * self._norm_fn(f, target_)
            return [lossvalue, epevalue]
        # eval mode: compare the single flow against the finest pooled target
        target_ = avg_pool(target, self.startScale)
        return [self._norm_fn(output, target_), EPE(output, target_, mean=self.use_mean)]


@dataclasses.dataclass(frozen=True)
class LevelLoss:
    """Per-level diagnostic loss using each level's final (R) flow
    (reference ``src/loss.py:151-190``)."""

    div_scale: float = 0.05
    startScale: int = 2
    n_level: int = 5
    norm: str = "L1"

    def __call__(self, output, target):
        if not isinstance(output, (tuple, list)):
            raise ValueError('The "output" type must be a list/tuple to perform per level evaluation!')
        assert self.n_level == len(output)
        target = self.div_scale * target
        norm_fn = _l1 if self.norm == "L1" else _l2
        lossvalue, epevalue = [], []
        for i, out_level in enumerate(output):
            k = self.startScale * (2 ** (self.n_level - 1 - i))
            target_ = avg_pool(target, k)
            f = out_level[-1] if isinstance(out_level, (tuple, list)) else out_level
            epevalue.append(EPE(f, target_))
            lossvalue.append(norm_fn(f, target_))
        return [lossvalue, epevalue]


def hui_loss(level_eval: bool = False, mul_scale: float = 20, norm: str = "L1"):
    """reference ``src/loss.py:194-199``"""
    if level_eval:
        return LevelLoss(div_scale=1 / mul_scale, norm=norm)
    return MultiScale(div_scale=1 / mul_scale, norm=norm)


def piv_loss(level_eval: bool = False, mul_scale: float = 5, norm: str = "L1", version: int = 1):
    """reference ``src/loss.py:202-217`` (weights from Cai 2019).

    Parity note: ``version=2`` carries the reference's 5 weights, but the v2
    TRAINING forward (theirs and ours) emits 6 outputs — 5 levels plus the
    full-res upsample (reference ``src/models.py:705-714``) — so the length
    assert fires on both implementations; the reference's v2 training path
    was never exercisable as shipped. For actual v2 training pass a 6-weight
    ``MultiScale`` (see ``work/train_synth.py``).
    """
    if version == 1:
        loss_weight = (0.001, 0.001, 0.001, 0.001, 0.001, 0.01)
    elif version == 2:
        loss_weight = (0.001, 0.001, 0.001, 0.001, 0.01)
    else:
        raise ValueError(f'Unknown "version" ({version})! Choose between 1 or 2 only!')
    if level_eval:
        return LevelLoss(div_scale=1 / mul_scale, startScale=version, n_level=6, norm=norm)
    return MultiScale(div_scale=1 / mul_scale, startScale=version, l_weight=loss_weight, norm=norm)
