"""Stereo calibration geometry: rational-quadratic dewarping.

Capability parity with reference ``stereo/dewarp.py``:

- ``grid_regularize``: snap detected calibration-cross points onto the ideal
  regular grid anchored at the reference point (the reference's iterative
  column/row-walk ``Guess`` solver, ``stereo/dewarp.py:6-148``), implemented
  as an iterative nearest-grid-node assignment with spacing refinement.
- ``map_coeff``: fit the 24-coefficient rational quadratic mapping by the same
  two-stage Nelder-Mead bootstrap (12-coeff rational-linear warm start ->
  24-coeff rational-quadratic), reference ``stereo/dewarp.py:151-193``.
- ``nl_trans``: apply the rational quadratic mapping (``:255-271``).
- ``warp_image``: dewarp an image by nearest-neighbor index remap (``:196-252``),
  vectorized (no transpose dance), edge-filled like the reference.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def nl_trans(x: np.ndarray, y: np.ndarray, A: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Rational quadratic mapping with 24 coefficients."""
    A = np.asarray(A, np.float64)
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    x2, y2, xy = x * x, y * y, x * y
    new_x = (A[0] * x + A[1] * y + A[2] + A[3] * x2 + A[4] * y2 + A[5] * xy) / (
        A[6] * x + A[7] * y + A[8] + A[9] * x2 + A[10] * y2 + A[11] * xy
    )
    new_y = (A[12] * x + A[13] * y + A[14] + A[15] * x2 + A[16] * y2 + A[17] * xy) / (
        A[18] * x + A[19] * y + A[20] + A[21] * x2 + A[22] * y2 + A[23] * xy
    )
    return new_x, new_y


def grid_regularize(old_pts: np.ndarray, center_dist: Tuple[float, float], pt1: int,
                    n_iter: int = 3) -> np.ndarray:
    """Map detected cross centers to ideal grid nodes anchored at ``pt1``.

    Equivalent contract to the reference's ``Guess`` solver: each detected
    point gets the coordinates ``old[pt1] + (col*dx, row*dy)`` of its grid
    node. Column/row assignment is refined iteratively: assign by rounding,
    re-estimate the effective spacing from per-column/row centroids, reassign.
    """
    old = np.asarray(old_pts, np.float64)
    anchor = old[pt1]
    dx, dy = float(center_dist[0]), float(center_dist[1])

    col = np.round((old[:, 0] - anchor[0]) / dx)
    row = np.round((old[:, 1] - anchor[1]) / dy)
    for _ in range(n_iter):
        # refine spacing from centroids of assigned columns/rows
        for vals, idx, d in ((old[:, 0], col, "dx"), (old[:, 1], row, "dy")):
            uniq = np.unique(idx)
            if len(uniq) > 1:
                cent = np.array([vals[idx == u].mean() for u in uniq])
                fit = np.polyfit(uniq, cent, 1)
                if d == "dx":
                    dx = float(fit[0])
                else:
                    dy = float(fit[0])
        col = np.round((old[:, 0] - anchor[0]) / dx)
        row = np.round((old[:, 1] - anchor[1]) / dy)

    new = np.stack([anchor[0] + col * abs(dx) * np.sign(dx),
                    anchor[1] + row * abs(dy) * np.sign(dy)], axis=1)
    return new


def map_coeff(old_coord: np.ndarray, new_coord: np.ndarray, pt1: int) -> np.ndarray:
    """Fit the 24 mapping coefficients (two-stage Nelder-Mead)."""
    import scipy.optimize as so

    new_rel = np.asarray(new_coord, np.float64) - np.asarray(new_coord)[pt1]
    old_rel = np.asarray(old_coord, np.float64) - np.asarray(old_coord)[pt1]
    p, q = new_rel[:, 0], new_rel[:, 1]
    k1, k2 = old_rel[:, 0], old_rel[:, 1]

    def stage1(a):
        return np.sum(
            (k1 - (a[0] * p + a[1] * q + a[2]) / (a[3] * p + a[4] * q + a[5])) ** 2
            + (k2 - (a[6] * p + a[7] * q + a[8]) / (a[9] * p + a[10] * q + a[11])) ** 2
        )

    a = so.minimize(stage1, x0=np.array([1, 0, 0, 0, 0, 1, 0, 1, 0, 0, 0, 1], np.float64),
                    method="Nelder-Mead").x

    def stage2(A):
        x2, y2, xy = p * p, q * q, p * q
        num1 = A[0] * p + A[1] * q + A[2] + A[3] * x2 + A[4] * y2 + A[5] * xy
        den1 = A[6] * p + A[7] * q + A[8] + A[9] * x2 + A[10] * y2 + A[11] * xy
        num2 = A[12] * p + A[13] * q + A[14] + A[15] * x2 + A[16] * y2 + A[17] * xy
        den2 = A[18] * p + A[19] * q + A[20] + A[21] * x2 + A[22] * y2 + A[23] * xy
        return np.sum((k1 - num1 / den1) ** 2 + (k2 - num2 / den2) ** 2)

    x0 = np.array([a[0], a[1], a[2], 0, 0, 0, a[3], a[4], a[5], 0, 0, 0,
                   a[6], a[7], a[8], 0, 0, 0, a[9], a[10], a[11], 0, 0, 0], np.float64)
    return so.minimize(stage2, x0=x0, method="Nelder-Mead").x


def warp_image(gray_img: np.ndarray, old_pts: np.ndarray, pt1: int, A: np.ndarray) -> np.ndarray:
    """Dewarp an image via the fitted mapping (nearest-neighbor remap).

    Matches the reference ``warp`` contract (``stereo/dewarp.py:196-252``):
    source coordinates come from ``nl_trans`` relative to the anchor point,
    out-of-frame samples clamp to the far edge (the reference's fill).
    """
    img = np.asarray(gray_img)
    if img.max() <= 1.0:
        img = img * 255
    img = img.astype(np.uint8)
    h, w = img.shape[:2]
    anchor = np.asarray(old_pts, np.float64)[pt1]

    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    new_x, new_y = nl_trans(xs - anchor[0], ys - anchor[1], A)
    new_x = np.round(new_x + anchor[0])
    new_y = np.round(new_y + anchor[1])
    new_x = np.where((new_x < 0) | (new_x > w - 1), w - 1, new_x).astype(np.int64)
    new_y = np.where((new_y < 0) | (new_y > h - 1), h - 1, new_y).astype(np.int64)
    return img[new_y, new_x]
