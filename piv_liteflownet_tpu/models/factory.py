"""Model factories mirroring reference ``src/models.py:719-766``."""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict

import jax
import jax.numpy as jnp

from piv_liteflownet_tpu.models.liteflownet import ModelConfig, forward, init_params

HUI_MEAN = (0.411618, 0.434631, 0.454253, 0.410782, 0.433645, 0.452793)  # Hui 2018
PIV_MEAN_V1 = (0.173935, 0.180594, 0.192608, 0.172978, 0.179518, 0.191300)  # Cai 2019
PIV_MEAN_V2 = (0.194286, 0.190633, 0.191766, 0.194220, 0.190595, 0.191701)  # Silitonga 2020


@dataclasses.dataclass
class Model:
    """A config + params bundle with jitted apply functions."""

    cfg: ModelConfig
    params: Dict[str, jax.Array]

    def __post_init__(self):
        self._eval_fn = jax.jit(
            functools.partial(forward, cfg=self.cfg, train=False, precision=jax.lax.Precision.HIGHEST)
        )
        self._train_fn = jax.jit(
            functools.partial(forward, cfg=self.cfg, train=True, precision=jax.lax.Precision.HIGHEST)
        )

    def __call__(self, img1: jax.Array, img2: jax.Array, train: bool = False):
        fn = self._train_fn if train else self._eval_fn
        return fn(self.params, img1, img2)


def _build(cfg: ModelConfig, params=None, seed: int = 0) -> Model:
    if params is None:
        params = init_params(cfg, jax.random.PRNGKey(seed))
    elif not isinstance(params, dict) or not all(
        isinstance(v, (jax.Array, jnp.ndarray)) or hasattr(v, "shape") for v in params.values()
    ):
        raise ValueError("params must be a flat dict of arrays (use models.convert to load .paramOnly)")
    else:
        from piv_liteflownet_tpu.models.convert import validate_params

        validate_params(cfg, params)
    return Model(cfg=cfg, params=params)


def model_config_registry():
    """Name -> ModelConfig factory, signatures reflected into the trainer's
    ``--model_*`` flags (reference trainer.py:57-58 over src/models.py)."""

    def LiteFlowNet(starting_scale=10.0, lowest_level=1,
                    rgb_mean=list(PIV_MEAN_V1)):
        return ModelConfig(version=1, starting_scale=starting_scale,
                           lowest_level=lowest_level, rgb_mean=tuple(rgb_mean))

    def LiteFlowNet2(starting_scale=10.0, lowest_level=2,
                     rgb_mean=list(PIV_MEAN_V2)):
        return ModelConfig(version=2, starting_scale=starting_scale,
                           lowest_level=lowest_level, rgb_mean=tuple(rgb_mean))

    return {"LiteFlowNet": LiteFlowNet, "LiteFlowNet2": LiteFlowNet2}


def hui_liteflownet(params=None, version: int = 1, seed: int = 0) -> Model:
    """Original LiteFlowNet (Hui 2018) / LiteFlowNet2 (Hui 2020).

    Mirrors reference ``src/models.py:719-740``.
    """
    if version == 1:
        cfg = ModelConfig(version=1, starting_scale=40, lowest_level=2, rgb_mean=HUI_MEAN)
    elif version == 2:
        cfg = ModelConfig(version=2, starting_scale=40, lowest_level=3, rgb_mean=HUI_MEAN)
    else:
        raise ValueError(
            f"Wrong input of model version (input = {version})! Choose between version 1 or 2 only!"
        )
    return _build(cfg, params, seed)


def piv_liteflownet(params=None, version: int = 1, seed: int = 0) -> Model:
    """PIV-LiteFlowNet-en (Cai 2019) / PIV-LiteFlowNet2-en (Silitonga 2020).

    Mirrors reference ``src/models.py:743-766``.
    """
    if version == 1:
        cfg = ModelConfig(version=1, starting_scale=10, lowest_level=1, rgb_mean=PIV_MEAN_V1)
    elif version == 2:
        cfg = ModelConfig(version=2, starting_scale=10, lowest_level=2, rgb_mean=PIV_MEAN_V2)
    else:
        raise ValueError(
            f"Wrong input of model version (input = {version})! Choose between version 1 or 2 only!"
        )
    return _build(cfg, params, seed)
