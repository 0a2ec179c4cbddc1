#!/usr/bin/env python
"""Batch inference CLI — flag/output-layout parity with reference ``run.py``.

Flags (reference ``run.py:24-42``): --start/-s, --num_images/-n, --is_pair/-p,
--brightness/-b, --contrast/-c, --model/-m {hui,piv}, --version/-v {1,2},
--input/-i (multi), --output/-o, plus TPU-era additions --params (explicit
weight path: .paramOnly torch state dict or .npz), --batch_size and --cpu.

Output layout per input dir (reference ``run.py:237-266``):
``<output>/<netname>/<dirbase>[-<start>_<n>]/flow[/left|right]`` with an
``args.txt`` metadata dump next to ``flow/``.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Inference script for TPU LiteFlowNet")
    parser.add_argument("--start", "-s", type=int, default=0, help="Input image starting index.")
    parser.add_argument("--num_images", "-n", type=int, default=-1,
                        help="Number of image(s) to process from the directory.")
    parser.add_argument("--is_pair", "-p", action="store_true",
                        help="To check if the input image format is in pair.")
    parser.add_argument("--brightness", "-b", default=None, type=float, nargs="+",
                        help="Brightness factor(s) applied to all input images (optional).")
    parser.add_argument("--contrast", "-c", default=None, type=float, nargs="+",
                        help="Contrast factor(s) applied to all input images (optional).")
    parser.add_argument("--model", "-m", type=str, choices=["hui", "piv"], required=True,
                        help="Select which model to solve the problem!")
    parser.add_argument("--version", "-v", type=int, choices=[1, 2], default=1,
                        help="LiteFlowNet backbone version (1 or 2).")
    parser.add_argument("--input", "-i", default=["./images/demo"], type=str, nargs="+",
                        help="Input images directory(ies).")
    parser.add_argument("--output", "-o", default="./results", type=str, help="Main output directory.")
    parser.add_argument("--params", type=str, default=None,
                        help="Weight file (.paramOnly torch state dict or .npz). "
                             "Defaults to models/pretrain_torch/<name>.paramOnly if present.")
    parser.add_argument("--batch_size", type=int, default=2,
                        help="Image pairs per device step (2 measured best per-pair for the full v1 pipeline @1024^2; see BASELINE.md).")
    parser.add_argument("--cpu", action="store_true", help="Force the CPU backend.")
    parser.add_argument("--num_devices", "-d", type=int, default=1,
                        help="Shard each batch over the first N devices (data-parallel "
                             "inference; params replicated). Aggregate batch per step = "
                             "batch_size * N.")
    parser.add_argument("--bf16", action="store_true",
                        help="Run params/activations in bfloat16 (fast path; "
                             "sub-0.1%% flow deltas vs float32).")
    parser.add_argument("--warp_impl", type=str, default=None,
                        choices=["gather", "tent"],
                        help="Feature-warp implementation override "
                             "(ModelConfig.warp_impl; default: model's).")
    parser.add_argument("--corr_impl", type=str, default=None,
                        choices=["xla", "planar"],
                        help="Correlation implementation override "
                             "(ModelConfig.corr_impl; default: model's).")
    parser.add_argument("--conv_bands", action="store_true",
                        help="Enable space-to-batch conv banding "
                             "(ModelConfig.conv_bands).")
    parser.add_argument("--native_io", action="store_true",
                        help="Use the C++ pthread batch loader (libpivio) for "
                             "image ingest — PNM/PNG/TIFF pair datasets; other "
                             "formats fall back to the Python loader.")
    parser.add_argument("--spatial", type=int, default=1,
                        help="Shard each frame's HEIGHT over the first N devices "
                             "(for images larger than one chip's HBM; per-device "
                             "peak ~H/N, halo exchanges over ICI). Mutually "
                             "exclusive with --num_devices > 1.")
    return parser


def load_weights(args, cfg):
    """Resolve + load weights; returns (params-or-None, netname)."""
    from piv_liteflownet_tpu.models import convert

    default_names = {"hui": "Hui-LiteFlowNet", "piv": "PIV-LiteFlowNet-en"}
    path = args.params
    if path is None:
        cand = os.path.join("models", "pretrain_torch", default_names[args.model] + ".paramOnly")
        path = cand if os.path.isfile(cand) else None
    if path is None:
        return None, default_names[args.model]
    netname = os.path.splitext(os.path.basename(path))[0]
    if path.endswith(".npz"):
        import jax.numpy as jnp

        params = {k: jnp.asarray(v) for k, v in np.load(path).items()}
    else:
        params = convert.load_param_only(cfg, path)
    return params, netname


def image_mod(imgpath: str, brightness_factor: float = 1.0, contrast_factor: float = 1.0):
    """PIL brightness/contrast adjustment matching torchvision TF.adjust_*
    (reference ``run.py:86-94``)."""
    from PIL import Image, ImageEnhance

    img = Image.open(imgpath).convert("RGB")
    img = ImageEnhance.Brightness(img).enhance(brightness_factor)
    img = ImageEnhance.Contrast(img).enhance(contrast_factor)
    return img


def main_dl(model, inputdir, savedir, is_pair=False, start_id=0, num_images=-1,
            batch_size=1, mesh=None, native_io=False, spatial_mesh=None):
    """DataLoader-path inference (reference ``run.py:137-168``), batched."""
    from piv_liteflownet_tpu.data.datasets import Run
    from piv_liteflownet_tpu.data.loader import BatchLoader, native_loader_for
    from piv_liteflownet_tpu.inference import estimate
    from piv_liteflownet_tpu.utils.flow_io import flowname_modifier, write_flow

    os.makedirs(savedir, exist_ok=True)
    if inputdir.endswith(".pivseq"):
        # packed raw container (decode-free ingest; data/pivseq.py) — same
        # pairing rules applied to the stored original names
        from piv_liteflownet_tpu.data.pivseq import PivseqRun

        ds = PivseqRun(inputdir, is_pair=is_pair, n_images=num_images,
                       start_at=start_id)
    else:
        ds = Run(root=inputdir, is_pair=is_pair, n_images=num_images,
                 start_at=start_id)
    print(f"Processing {len(ds)} pairs of images...")
    if mesh is not None:
        batch_size *= int(mesh.shape.get("data", 1))
    loader = None
    if native_io:
        loader = native_loader_for(ds, batch_size)
        print("native I/O: " + ("enabled (libpivio pthread loader)" if loader
                                else "unavailable for this dataset "
                                     "(needs PGM/PPM pairs) — Python loader"))
    if loader is None:
        loader = BatchLoader(ds, batch_size=batch_size)
    if mesh is not None:
        # multi-chip DP: device_put each batch with the data-axis sharding on
        # a background thread (PrefetchLoader), so the host->device scatter of
        # batch k overlaps the sharded forward of batch k-1. Short final
        # batches are padded here (device_put needs B % n == 0); estimate()
        # sees an already-sharded full batch and the extra rows are never
        # written (names is unpadded).
        from jax.sharding import NamedSharding, PartitionSpec

        from piv_liteflownet_tpu.data.loader import PrefetchLoader

        n = int(mesh.shape.get("data", 1))

        def _padded(it):
            for (im1, im2), names in it:
                pad = (-im1.shape[0]) % n
                if pad:
                    im1 = np.concatenate([im1, np.repeat(im1[-1:], pad, 0)])
                    im2 = np.concatenate([im2, np.repeat(im2[-1:], pad, 0)])
                yield (im1, im2), names

        loader = PrefetchLoader(_padded(loader), prefetch=2,
                                sharding=NamedSharding(mesh, PartitionSpec("data")))
    # keep 2 device batches in flight: decode/dispatch overlaps drain+write
    from collections import deque

    inflight: deque = deque()
    for (im1, im2), names in loader:
        inflight.append((estimate(model, im1, im2, tensor=True, mesh=mesh,
                          spatial_mesh=spatial_mesh), names))
        if len(inflight) > 2:
            flows, batch_names = inflight.popleft()
            flows = np.asarray(flows)
            for i, name in enumerate(batch_names):
                write_flow(flows[i], flowname_modifier(name, savedir, pair=False))
    while inflight:
        flows, batch_names = inflight.popleft()
        flows = np.asarray(flows)
        for i, name in enumerate(batch_names):
            write_flow(flows[i], flowname_modifier(name, savedir, pair=False))
    print(f"Finish processing all images from {inputdir} path!")


def main_mod(model, inputdir, savedir, start_id=0, num_images=-1, mod_factors=((1, 1),)):
    """Brightness/contrast factor-grid path (reference ``run.py:97-134``)."""
    from glob import glob

    from piv_liteflownet_tpu.inference import Inference
    from piv_liteflownet_tpu.utils.flow_io import flowname_modifier, write_flow

    exts = ("jpg", "jpeg", "png", "bmp", "tif", "ppm")
    imnames = []
    for ext in exts:
        imnames += sorted(glob(os.path.join(inputdir, f"*.{ext}")))
    imnames = imnames[start_id:] if num_images < 0 else imnames[start_id : start_id + num_images]
    os.makedirs(savedir, exist_ok=True)

    prev = None
    for curr in imnames:
        if prev is not None:
            for brightness, contrast in mod_factors:
                im1 = image_mod(prev, brightness, contrast)
                im2 = image_mod(curr, brightness, contrast)
                flow = Inference.parser(model, im1, im2)
                modname = f"{str(int(brightness * 100)).zfill(3)}_{str(int(contrast * 100)).zfill(3)}"
                imgname, imgext = prev.rsplit("_", 1)
                out_name = flowname_modifier(imgname + "_" + modname + "_" + imgext, savedir, pair=False)
                write_flow(flow, out_name)
        prev = curr
    print(f"Finish processing all images from {inputdir} path!")


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

    from piv_liteflownet_tpu.models.factory import hui_liteflownet, piv_liteflownet
    from piv_liteflownet_tpu.utils.timer import TimerBlock, log_arguments, set_proc_title

    set_proc_title(f"piv_liteflownet_tpu.run {args.model}-v{args.version}")
    with TimerBlock("Parsing Arguments") as block:
        log_arguments(block, args, build_parser())

    with TimerBlock(f"Building '{args.model}' model with backbone version = {args.version}") as block:
        factory = hui_liteflownet if args.model == "hui" else piv_liteflownet
        cfg = factory(version=args.version).cfg
        weights, netname = load_weights(args, cfg)
        if weights is None:
            block.log("WARNING: no weight file found/given — using random initialization")
        model = factory(weights, version=args.version)
        overrides = {k: getattr(args, k) for k in ("warp_impl", "corr_impl")
                     if getattr(args, k) is not None}
        if args.conv_bands:
            overrides["conv_bands"] = True
        if overrides:
            import dataclasses

            from piv_liteflownet_tpu.models.factory import Model

            model = Model(cfg=dataclasses.replace(model.cfg, **overrides),
                          params=model.params)
            block.log(f"config overrides: {overrides}")
        if args.bf16:
            import jax.numpy as jnp

            from piv_liteflownet_tpu.models.factory import Model

            model = Model(
                cfg=model.cfg,
                params=jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params),
            )
            block.log("bfloat16 fast path enabled")
        mesh = None
        spatial_mesh = None
        if args.spatial > 1:
            assert args.num_devices <= 1, "--spatial and --num_devices are mutually exclusive"
            from piv_liteflownet_tpu.parallel.mesh import make_mesh

            n = min(args.spatial, len(jax.devices()))
            if n > 1:
                spatial_mesh = make_mesh(n, axes=("spatial",))
                block.log(f"Spatially-sharded inference (H split over {n} devices)")
        if args.num_devices > 1:
            from piv_liteflownet_tpu.parallel.mesh import make_mesh

            n = min(args.num_devices, len(jax.devices()))
            if n < args.num_devices:
                block.log(f"WARNING: only {n} devices available "
                          f"(requested {args.num_devices})")
            if n > 1:
                mesh = make_mesh(n)
                block.log(f"Data-parallel inference over {n} devices")
        block.log(f"Running on {jax.default_backend()} ({jax.devices()[0].device_kind})")

    for i, imdir in enumerate(args.input):
        print(f"---------- Processing images from directory #{str(i).zfill(2)}: '{imdir}'")
        with TimerBlock(f"Setting up output directory #{str(i).zfill(2)}") as block:
            is_all_flow = (args.start == 0) and (args.num_images < 0)
            num_images = "end" if args.num_images < 0 else args.num_images
            checkname = os.path.basename(os.path.normpath(imdir))
            if checkname.lower() in ("left", "right"):  # stereoscopic layout
                extradir = checkname.lower()
                bname = os.path.basename(os.path.dirname(os.path.normpath(imdir)))
            else:
                extradir = None
                bname = checkname
            outsubdir = bname if is_all_flow else f"{bname}-{args.start}_{num_images}"
            savedir = os.path.join(args.output, netname, outsubdir)
            flodir = os.path.join(savedir, "flow") if extradir is None else os.path.join(savedir, "flow", extradir)
            os.makedirs(savedir, exist_ok=True)
            block.log(f"Initializing save directory #{str(i).zfill(2)}: {savedir}")
            argsname = "args.txt" if extradir is None else f"args_{extradir}.txt"
            log_file = os.path.join(savedir, argsname)
            with open(log_file, "w") as f:
                for argument, value in sorted(vars(args).items()):
                    f.write(f"{argument}: {value}\n")

        if args.brightness is None and args.contrast is None:
            main_dl(model, imdir, flodir, is_pair=args.is_pair, start_id=args.start,
                    num_images=args.num_images, batch_size=args.batch_size, mesh=mesh,
                    native_io=args.native_io, spatial_mesh=spatial_mesh)
        else:
            brightness = (1.0,) if args.brightness is None else tuple(args.brightness)
            contrast = (1.0,) if args.contrast is None else tuple(args.contrast)
            mod_factors = tuple((b, c) for b in brightness for c in contrast)
            main_mod(model, imdir, flodir, start_id=args.start,
                     num_images=args.num_images, mod_factors=mod_factors)


if __name__ == "__main__":
    main()
