"""Weight conversion: torch ``.paramOnly`` state dicts -> JAX param pytrees.

The reference ships weights as pure state dicts (``run.py:217-226``), produced
from Caffe exports by positional key renaming (reference ``convert.py:23-43``).
Our param dict uses the *same key names*, so conversion is purely a layout
transpose per tensor:

- ``Conv2d.weight``  OIHW -> HWIO
- grouped ``ConvTranspose2d.weight`` (depthwise: 2-group 2ch upConv_M,
  49-group 49ch upCorr_M, reference ``src/models.py:144-152``)
  (C, 1, kH, kW) -> spatial flip -> (kH, kW, 1, C)
  (pre-flipped so ``depthwise_deconv4x2`` is a plain dilated conv at runtime)
- biases unchanged.

Also provides the Caffe positional-rename equivalent (``rename_caffe_keys``)
so Caffe exports can be ingested directly, preserving the reference's
weight-layout contract.
"""

from __future__ import annotations

from typing import Dict, List, Mapping

import numpy as np
import jax.numpy as jnp

from piv_liteflownet_tpu.models.liteflownet import ModelConfig, param_shapes


def expected_keys(cfg: ModelConfig) -> List[str]:
    keys = []
    for spec in param_shapes(cfg):
        keys.append(spec["name"] + ".weight")
        if spec["bias"]:
            keys.append(spec["name"] + ".bias")
    return keys


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):  # torch tensor without importing torch
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def from_torch_state_dict(cfg: ModelConfig, state_dict: Mapping[str, object]) -> Dict[str, jnp.ndarray]:
    """Convert a torch state dict (tensor or ndarray values) to JAX params."""
    spec_by_name = {s["name"]: s for s in param_shapes(cfg)}
    params: Dict[str, jnp.ndarray] = {}
    missing = []
    for name, spec in spec_by_name.items():
        wkey = name + ".weight"
        if wkey not in state_dict:
            missing.append(wkey)
            continue
        w = _to_numpy(state_dict[wkey])
        if spec["transpose_groups"] is not None:
            # (C_in, C_out/groups, kH, kW) depthwise -> flip -> (kH, kW, 1, C)
            assert w.shape == (spec["cin"], spec["cout"] // spec["transpose_groups"], spec["kh"], spec["kw"]), (
                name, w.shape)
            w = w[:, :, ::-1, ::-1]
            w = np.transpose(w, (2, 3, 1, 0))
        else:
            assert w.shape == (spec["cout"], spec["cin"], spec["kh"], spec["kw"]), (name, w.shape)
            w = np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO
        params[wkey] = jnp.asarray(np.ascontiguousarray(w))
        if spec["bias"]:
            bkey = name + ".bias"
            if bkey not in state_dict:
                missing.append(bkey)
                continue
            params[bkey] = jnp.asarray(_to_numpy(state_dict[bkey]))
    if missing:
        raise KeyError(f"state dict is missing {len(missing)} keys, e.g. {missing[:5]}")
    return params


def to_torch_state_dict(cfg: ModelConfig, params: Mapping[str, jnp.ndarray]) -> Dict[str, np.ndarray]:
    """Inverse conversion (for checkpoint interop / round-trip tests)."""
    spec_by_name = {s["name"]: s for s in param_shapes(cfg)}
    out: Dict[str, np.ndarray] = {}
    for name, spec in spec_by_name.items():
        w = np.asarray(params[name + ".weight"], np.float32)
        if spec["transpose_groups"] is not None:
            w = np.transpose(w, (3, 2, 0, 1))[:, :, ::-1, ::-1]
        else:
            w = np.transpose(w, (3, 2, 0, 1))  # HWIO -> OIHW
        out[name + ".weight"] = np.ascontiguousarray(w)
        if spec["bias"]:
            out[name + ".bias"] = np.asarray(params[name + ".bias"], np.float32)
    return out


def load_param_only(cfg: ModelConfig, path: str) -> Dict[str, jnp.ndarray]:
    """Load a ``.paramOnly`` torch checkpoint file (requires torch)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return from_torch_state_dict(cfg, state)


def rename_caffe_keys(cfg: ModelConfig, caffe_dict: Mapping[str, object]) -> Dict[str, object]:
    """Positional rename of Caffe-export keys onto our key order.

    Equivalent of reference ``convert.py:23-43``: filters non-weight/bias
    entries and zips the remaining values onto the state-dict key order.
    """
    filtered = [
        (k, v) for k, v in caffe_dict.items()
        if k.endswith("weight") or k.endswith("bias") or ".weight" in k or ".bias" in k
    ]
    targets = expected_keys(cfg)
    if len(filtered) != len(targets):
        raise ValueError(
            f"Caffe dict has {len(filtered)} tensors but model expects {len(targets)}"
        )
    return {t: v for t, (_, v) in zip(targets, filtered)}


def validate_params(cfg: ModelConfig, params: Mapping[str, jnp.ndarray]) -> None:
    """Check key set + shapes against the model spec; raise on mismatch."""
    exp = set(expected_keys(cfg))
    got = set(params.keys())
    if exp != got:
        miss, extra = sorted(exp - got)[:5], sorted(got - exp)[:5]
        raise ValueError(f"param key mismatch; missing={miss} extra={extra}")
    for spec in param_shapes(cfg):
        w = params[spec["name"] + ".weight"]
        if spec["transpose_groups"] is not None:
            want = (spec["kh"], spec["kw"], spec["cin"] // spec["transpose_groups"], spec["cout"])
        else:
            want = (spec["kh"], spec["kw"], spec["cin"], spec["cout"])
        if tuple(w.shape) != want:
            raise ValueError(f"{spec['name']}.weight shape {w.shape} != {want}")
