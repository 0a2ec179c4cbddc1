#!/usr/bin/env python
"""Stereo-PIV runtime CLI — flag parity with reference ``stereo_run.py``.

Pipeline: per-camera 2D flow inference (manual: left/right directories; or
direct: paired ``InferenceRun(use_stereo=True)`` batches), rational-quadratic
dewarp of each camera's flow (``nl_trans`` with the calibration coefficients),
optional physical scaling (``calib * fps``), then Willert-1997 2D3C
reconstruction written as 3-band ``.flo``.
"""

from __future__ import annotations

import argparse
import json
import os
from glob import glob
from typing import List, Optional

import numpy as np


def build_parser():
    parser = argparse.ArgumentParser(description="Stereoscopic PIV image processing")
    parser.add_argument("--coeff", "-c", type=str, required=True, help="mapping coefficient json file path.")
    parser.add_argument("--root", "-r", default=None, type=str, help="root directory for series of images")
    parser.add_argument("--save", "-s", default="./work", type=str, help="directory for saving")
    parser.add_argument("--theta", default=[45.0, 45.0], type=float, nargs="+", help="object plane angle")
    parser.add_argument("--alpha", default=[0.0, 0.0], type=float, nargs="+",
                        help="scheimpflug criterion, image plane angle")
    parser.add_argument("--window-size", "-ws", default=[1.0, 1.0], type=float, nargs="+",
                        help="Window size in the real length")
    parser.add_argument("--fps", default=1, type=int, help="camera frame rate (FPS).")
    parser.add_argument("--calib", default=None, type=float, help="real length calibration in meters (m).")
    parser.add_argument("--model", default=None, type=str, help="weight file (.paramOnly / .npz)")
    parser.add_argument("--model-version", default=1, type=int, choices=[1, 2])
    parser.add_argument("--inference-mode", default="manual", type=str, choices=["manual", "direct"])
    parser.add_argument("--batch_size", type=int, default=1)
    return parser


def read_coeff(path: str) -> dict:
    assert os.path.isfile(path)
    with open(path) as fp:
        return json.load(fp)


def _angles(args):
    """Degrees -> radians; the left camera gets negative angles
    (reference ``stereo_run.py:110-117``)."""
    beta, theta = [], []
    for i in range(2):
        sign = (-1) ** (i + 1)
        alpha_deg = args.alpha[0] if len(args.alpha) == 1 else args.alpha[i]
        theta_deg = args.theta[0] if len(args.theta) == 1 else args.theta[i]
        beta.append(sign * np.deg2rad(alpha_deg))
        theta.append(sign * np.deg2rad(theta_deg))
    return theta, beta


def _stereo_cal(flow: np.ndarray, A, fps: float, calibrate: Optional[float] = None) -> np.ndarray:
    """Dewarp a flow field through the rational mapping + physical scaling
    (reference ``stereo_run.py:153-163``)."""
    from piv_liteflownet_tpu.stereo.dewarp import nl_trans

    u, v = nl_trans(flow[:, :, 0], flow[:, :, 1], A)
    flow_stereo = np.dstack([u, v]).astype(np.float32)
    if calibrate:
        flow_stereo = flow_stereo * calibrate * fps
    return flow_stereo


def flo_process(args):
    """Pair per-camera ``*-L_out.flo`` / ``*-R_out.flo`` files, reconstruct,
    write ``stereo/<base>-S_out.flo`` (reference ``stereo_run.py:105-150``)."""
    from piv_liteflownet_tpu.stereo.vel3d import willert
    from piv_liteflownet_tpu.utils.flow_io import read_flow, write_flow

    coeffdict = read_coeff(args.coeff)
    naming = ["left", "right"]
    theta, beta = _angles(args)
    calib = None
    if "calib" in coeffdict and args.calib:
        calib = args.calib / coeffdict["calib"]

    assert os.path.isdir(args.save)
    left_flos = sorted(glob(os.path.join(args.save, naming[0], "*.flo")))
    right_dir = os.path.join(args.save, naming[1])
    for left_flo in left_flos:
        flobase = os.path.basename(left_flo).rsplit("-", 1)[0]
        right_flo = os.path.join(right_dir, flobase + "-R_out.flo")
        assert os.path.isfile(left_flo) and os.path.isfile(right_flo), (left_flo, right_flo)
        flow_cal = [
            _stereo_cal(read_flow(f), coeffdict[naming[i].capitalize()], args.fps, calib)
            for i, f in enumerate([left_flo, right_flo])
        ]
        stereo_flow = willert(flow_cal, theta, beta)
        flosave = os.path.join(args.save, "stereo", f"{flobase}-S_out.flo")
        os.makedirs(os.path.dirname(flosave), exist_ok=True)
        write_flow(stereo_flow.astype(np.float32), flosave)
        print(f"wrote {flosave}")


def _load_model(args):
    from piv_liteflownet_tpu.models.convert import load_param_only
    from piv_liteflownet_tpu.models.factory import piv_liteflownet
    from piv_liteflownet_tpu.utils.checkpoint import load_params_npz

    params = None
    if args.model and os.path.isfile(args.model):
        if args.model.endswith(".npz"):
            params = load_params_npz(args.model)
        else:
            params = load_param_only(piv_liteflownet(version=args.model_version).cfg, args.model)
    return piv_liteflownet(params, version=args.model_version)


def manual_process(args):
    """Per-camera directory inference then reconstruction
    (reference ``stereo_run.py:91-103``)."""
    from piv_liteflownet_tpu.data.datasets import Run
    from piv_liteflownet_tpu.data.loader import BatchLoader
    from piv_liteflownet_tpu.inference import estimate
    from piv_liteflownet_tpu.utils.flow_io import flowname_modifier, write_flow

    model = _load_model(args)
    for cam in ("left", "right"):
        camdir = os.path.join(args.root, cam)
        outdir = os.path.join(args.save, cam)
        os.makedirs(outdir, exist_ok=True)
        ds = Run(root=camdir, is_pair=True)
        for (im1, im2), names in BatchLoader(ds, batch_size=args.batch_size):
            flows = np.asarray(estimate(model, im1, im2, tensor=True))
            for i, name in enumerate(names):
                write_flow(flows[i], flowname_modifier(name, outdir, pair=True))
    flo_process(args)


def direct_process(args):
    """Both camera views per batch via ``InferenceRun(use_stereo=True)``,
    reconstruction inline (reference ``stereo_run.py:60-89``)."""
    from piv_liteflownet_tpu.data.datasets import InferenceRun
    from piv_liteflownet_tpu.inference import estimate
    from piv_liteflownet_tpu.stereo.vel3d import willert
    from piv_liteflownet_tpu.utils.flow_io import write_flow

    model = _load_model(args)
    coeffdict = read_coeff(args.coeff)
    theta, beta = _angles(args)
    calib = None
    if "calib" in coeffdict and args.calib:
        calib = args.calib / coeffdict["calib"]

    ds = InferenceRun(root=args.root, pair=True, use_stereo=True)
    outdir = os.path.join(args.save, "stereo")
    os.makedirs(outdir, exist_ok=True)
    for idx in range(len(ds)):
        (l1, l2, r1, r2), (lname, _) = ds[idx]
        flow_l = estimate(model, l1, l2)
        flow_r = estimate(model, r1, r2)
        flow_cal = [
            _stereo_cal(np.asarray(f), coeffdict[n], args.fps, calib)
            for f, n in ((flow_l, "Left"), (flow_r, "Right"))
        ]
        stereo_flow = willert(flow_cal, theta, beta)
        flobase = os.path.splitext(os.path.basename(lname))[0].rsplit("-", 1)[0]
        flosave = os.path.join(outdir, f"{flobase}-S_out.flo")
        write_flow(stereo_flow.astype(np.float32), flosave)
        print(f"wrote {flosave}")


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.inference_mode == "manual":
        if args.root:
            manual_process(args)
        else:  # reconstruct from pre-computed per-camera .flo files only
            flo_process(args)
    else:
        direct_process(args)


if __name__ == "__main__":
    main()
