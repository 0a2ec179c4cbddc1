#!/usr/bin/env python
"""Weight converter CLI (reference ``convert.py`` equivalent).

Modes:
- ``--mode caffe``: positionally rename a Caffe-export param dict onto the
  model's state-dict key order (reference ``convert.py:23-43`` contract) and
  save as JAX ``.npz``.
- ``--mode torch``: convert a ``.paramOnly`` torch state dict to JAX ``.npz``
  (layout transposes in ``piv_liteflownet_tpu.models.convert``).
- ``--mode jax2torch``: export JAX ``.npz`` params back to a torch-layout
  state dict (round-trip check included, like reference ``convert.py:70-71``).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="LiteFlowNet weight converter")
    parser.add_argument("--mode", choices=["caffe", "torch", "jax2torch"], default="torch")
    parser.add_argument("--input", "-i", required=True, help="input weight file")
    parser.add_argument("--output", "-o", required=True, help="output file (.npz or .paramOnly)")
    parser.add_argument("--model", "-m", choices=["hui", "piv"], default="piv")
    parser.add_argument("--version", "-v", type=int, choices=[1, 2], default=1)
    args = parser.parse_args(argv)

    from piv_liteflownet_tpu.models import convert as C
    from piv_liteflownet_tpu.models.factory import hui_liteflownet, piv_liteflownet

    factory = hui_liteflownet if args.model == "hui" else piv_liteflownet
    cfg = factory(version=args.version).cfg

    if args.mode == "caffe":
        import torch

        raw = torch.load(args.input, map_location="cpu", weights_only=False)
        renamed = C.rename_caffe_keys(cfg, raw)
        params = C.from_torch_state_dict(cfg, renamed)
    elif args.mode == "torch":
        params = C.load_param_only(cfg, args.input)
    else:  # jax2torch
        import jax.numpy as jnp

        params = {k: jnp.asarray(v) for k, v in np.load(args.input).items()}
        sd = C.to_torch_state_dict(cfg, params)
        back = C.from_torch_state_dict(cfg, sd)  # round-trip check
        for k in params:
            assert np.allclose(np.asarray(params[k]), np.asarray(back[k])), k
        import torch

        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, args.output)
        print(f"wrote torch state dict: {args.output} ({len(sd)} tensors)")
        return

    C.validate_params(cfg, params)
    np.savez(args.output, **{k: np.asarray(v) for k, v in params.items()})
    print(f"wrote {args.output} ({len(params)} tensors)")


if __name__ == "__main__":
    main()
