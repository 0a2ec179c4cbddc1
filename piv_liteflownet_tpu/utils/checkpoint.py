"""Checkpoint / resume via orbax (reference contract: ``src/utils.py:199-207``
+ ``trainer.py:160-174``).

State = {params, opt_state, epoch, best_epe, step} plus a metadata dict
(arch/optimizer names, experiment key). Naming contract preserved:
``<prefix>_checkpoint`` every validation, copied to ``<prefix>_model_best`` on
improvement, plus periodic ``backup_<epoch>`` (orbax directories instead of
``.pth.tar`` files).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ckpt(path: str):
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer(), ocp


def save_checkpoint(
    state: Dict[str, Any],
    is_best: bool,
    path: str,
    prefix: str,
    filename: Optional[str] = None,
    metadata: Optional[Dict[str, Any]] = None,
) -> str:
    """Save ``state`` under ``<path>/<prefix>_checkpoint`` (or ``filename``);
    copy to ``<prefix>_model_best`` when ``is_best``."""
    import orbax.checkpoint as ocp

    os.makedirs(path, exist_ok=True)
    name = filename if filename is not None else f"{prefix}_checkpoint"
    target = os.path.abspath(os.path.join(path, name))
    if os.path.exists(target):
        shutil.rmtree(target)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(target, state)
    if metadata is not None:
        with open(target + ".meta.json", "w") as f:
            json.dump(metadata, f, indent=2, default=str)
    if is_best:
        best = os.path.abspath(os.path.join(path, f"{prefix}_model_best"))
        if os.path.exists(best):
            shutil.rmtree(best)
        shutil.copytree(target, best)
        if metadata is not None:
            shutil.copy(target + ".meta.json", best + ".meta.json")
    return target


def restore_checkpoint(path: str, abstract_state: Dict[str, Any]) -> Dict[str, Any]:
    """Restore a checkpoint saved by ``save_checkpoint``.

    ``abstract_state`` is a matching pytree of arrays (e.g. a freshly built
    state) used as the structure/dtype template.
    """
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), abstract_state)


def load_metadata(path: str) -> Optional[Dict[str, Any]]:
    meta = os.path.abspath(path) + ".meta.json"
    if os.path.isfile(meta):
        with open(meta) as f:
            return json.load(f)
    return None


def save_params_npz(params: Dict[str, jax.Array], path: str) -> None:
    """Portable flat-params export (.npz with torch-style key names)."""
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_params_npz(path: str) -> Dict[str, Any]:
    import jax.numpy as jnp

    return {k: jnp.asarray(v) for k, v in np.load(path).items()}
