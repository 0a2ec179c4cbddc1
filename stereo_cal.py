#!/usr/bin/env python
"""Stereo calibration CLI — contract parity with reference ``stereo_cal.py``.

Per camera (``<name>-L`` / ``<name>-R`` images under ``--root``):
1. build a cross template and template-match the calibration plate,
2. extract cross centers as local maxima,
3. pick 4 reference points (interactive matplotlib ginput by default, or
   ``--clicks x1 y1 x2 y2 x3 y3 x4 y4`` for scripted runs),
4. regularize the detected grid (``grid_regularize``),
5. fit the 24 rational-quadratic mapping coefficients (``map_coeff``),
6. write ``<save>/<name>_coeff.json`` with {"Left": [...], "Right": [...]}
   consumed by ``stereo_run.py --coeff``.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_parser():
    parser = argparse.ArgumentParser(description="2D reconstruction method for Stereoscopic PIV calibration")
    parser.add_argument("--root", "-r", default="./imgs", type=str, help="root directory for the input images")
    parser.add_argument("--name", "-n", default="30-5_0", type=str, help="stereo image input names")
    parser.add_argument("--save", "-s", default="./work", type=str, help="directory for saving")
    parser.add_argument("--threshold", type=float, default=0.7, help="template-match threshold")
    parser.add_argument("--template", type=int, nargs=3, default=[5, 25, 25],
                        help="cross template (thickness, height, width)")
    parser.add_argument("--clicks", type=float, nargs=8, default=None,
                        help="non-interactive 4 reference points: x1 y1 ... x4 y4 (clockwise from TL)")
    parser.add_argument("--calib", type=float, default=None,
                        help="physical grid spacing in meters (stored in the json)")
    return parser


def read_image_names(root: str, name: str):
    """Find ``<name>-L.<ext>`` / ``<name>-R.<ext>`` (reference ``stereo_cal.py:27-52``)."""
    assert os.path.isdir(root)
    for ext in (".jpg", ".jpeg", ".png", ".bmp", ".tif", ".ppm"):
        pair = [os.path.join(root, f"{name}{idcam}{ext}") for idcam in ("-L", "-R")]
        if all(os.path.isfile(p) for p in pair):
            return pair
    raise FileNotFoundError(f"no {name}-L/-R image pair under {root}")


def calibrate_camera(img_path: str, args):
    """Detect crosses, regularize the grid, fit mapping coefficients."""
    from PIL import Image

    from piv_liteflownet_tpu.stereo.dewarp import grid_regularize, map_coeff
    from piv_liteflownet_tpu.stereo.matching import (
        find_local_max,
        gen_template,
        select_ref,
        select_ref_points,
        template_matching,
    )

    gray = np.asarray(Image.open(img_path).convert("L"))
    tc, hc, lc = args.template
    template = gen_template(TC=tc, HC=hc, LC=lc)
    corr = template_matching(gray, template, threshold=args.threshold)
    coords = find_local_max(corr)
    print(f"{os.path.basename(img_path)}: {len(coords)} cross points detected")

    if args.clicks is not None:
        clicks = [tuple(args.clicks[i : i + 2]) for i in range(0, 8, 2)]
        points_ref, selected, c_point = select_ref_points(coords, clicks)
    else:  # interactive
        import matplotlib.pyplot as plt

        plt.imshow(gray, cmap="gray")
        plt.scatter(coords[:, 0], coords[:, 1], s=4, c="r")
        print("Click the 4 reference points clockwise (TL, TR, BR, BL)...")
        points_ref, selected, c_point = select_ref(coords)
        plt.close()

    pt1 = selected[0]
    new_pts = grid_regularize(coords, c_point, pt1)
    A = map_coeff(coords, new_pts, pt1)
    return A, coords, new_pts, pt1


def main(argv=None):
    args = build_parser().parse_args(argv)
    imnames = read_image_names(args.root, args.name)
    coeffdict = {}
    for img_path, cam in zip(imnames, ("Left", "Right")):
        A, *_ = calibrate_camera(img_path, args)
        coeffdict[cam] = [float(x) for x in A]
    if args.calib is not None:
        coeffdict["calib"] = args.calib

    os.makedirs(args.save, exist_ok=True)
    out = os.path.join(args.save, f"{args.name}_coeff.json")
    with open(out, "w") as f:
        json.dump(coeffdict, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
