#!/usr/bin/env python
"""Accuracy evaluation CLI: EPE of predicted flows vs ground-truth ``.flo``.

The reference evaluates only inside the trainer (``LevelLoss``/comet,
reference ``trainer.py:110-154``) or by manual comparison against the demo
fixture. This CLI makes the parity gate a one-liner:

    python evaluate.py --input DIR [--flow_root DIR] --model piv --version 1 \
        [--params W] [--save OUT] [--viz]

``DIR`` holds ``*_img1/_img2`` pairs with ``<base>_flow.flo`` ground truth
(the ``InferenceEval`` contract, reference ``src/datasets.py:491-564``).
Prints per-pair and aggregate EPE/AEE as JSON.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_parser():
    parser = argparse.ArgumentParser(description="EPE evaluation for TPU LiteFlowNet")
    parser.add_argument("--input", "-i", required=True, help="image-pair directory")
    parser.add_argument("--flow_root", default=None, help="ground-truth .flo dir (default: input)")
    parser.add_argument("--model", "-m", choices=["hui", "piv"], default="piv")
    parser.add_argument("--version", "-v", type=int, choices=[1, 2], default=1)
    parser.add_argument("--params", type=str, default=None, help=".paramOnly / .npz weights")
    parser.add_argument("--save", "-s", default=None, help="write predicted .flo files here")
    parser.add_argument("--viz", action="store_true", help="also write flow-color PNGs")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--batch_size", "-b", type=int, default=8,
                        help="pairs per device step (same-shape pairs are "
                             "grouped so each distinct shape compiles once)")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    import jax.numpy as jnp

    from piv_liteflownet_tpu.data.datasets import InferenceEval
    from piv_liteflownet_tpu.inference import estimate
    from piv_liteflownet_tpu.models.factory import Model, hui_liteflownet, piv_liteflownet
    from piv_liteflownet_tpu.utils.flow_io import flowname_modifier, write_flow

    factory = hui_liteflownet if args.model == "hui" else piv_liteflownet
    params = None
    if args.params:
        if args.params.endswith(".npz"):
            from piv_liteflownet_tpu.utils.checkpoint import load_params_npz

            params = load_params_npz(args.params)
        else:
            from piv_liteflownet_tpu.models.convert import load_param_only

            params = load_param_only(factory(version=args.version).cfg, args.params)
    model = factory(params, version=args.version)
    if args.bf16:
        model = Model(cfg=model.cfg,
                      params=jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params))

    ds = InferenceEval(args.input, flow_root=args.flow_root)
    if args.save:
        os.makedirs(args.save, exist_ok=True)

    # Same-shape pairs are batched: one compile + one device step per chunk
    # instead of one estimate() (and one executable per odd size) per pair —
    # the "1000-image directory" contract run.py already honors. Buffers are
    # bounded at batch_size entries per distinct shape.
    results = [None] * len(ds)
    buffers: dict = {}

    def flush(chunk):
        im1s = np.stack([c[1] for c in chunk])
        im2s = np.stack([c[2] for c in chunk])
        preds = np.asarray(estimate(model, im1s, im2s), np.float32)
        for (idx, _, _, gt, name), pred in zip(chunk, preds):
            epe_map = np.linalg.norm(pred - gt, axis=-1)
            results[idx] = {
                "pair": os.path.basename(name),
                "epe_mean": float(epe_map.mean()),
                "epe_max": float(epe_map.max()),
            }
            if args.save:
                out_name = flowname_modifier(name, args.save, pair=True)
                write_flow(pred, out_name)
                if args.viz:
                    from PIL import Image

                    from piv_liteflownet_tpu.utils.flow_viz import motion_to_color

                    Image.fromarray(motion_to_color(pred)[..., ::-1]).save(
                        out_name.replace(".flo", ".png"))

    for idx in range(len(ds)):
        (im1, im2), gt, name = ds[idx]
        buf = buffers.setdefault(im1.shape, [])
        buf.append((idx, im1, im2, gt, name))
        if len(buf) >= args.batch_size:
            flush(buf)
            buf.clear()
    for buf in buffers.values():
        if buf:
            flush(buf)
    for rec in results:
        print(json.dumps(rec))

    agg = {
        "pairs": len(results),
        "aee": float(np.mean([r["epe_mean"] for r in results])) if results else None,
        "worst_pair_epe": float(max((r["epe_mean"] for r in results), default=0.0)),
    }
    print(json.dumps({"aggregate": agg}))
    return agg


if __name__ == "__main__":
    main()
