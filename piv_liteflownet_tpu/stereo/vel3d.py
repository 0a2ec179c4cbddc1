"""Stereo 2D3C reconstruction (Willert 1997).

Parity with reference ``stereo/vel3d.py:4-24``: given per-camera planar flows
and the cameras' off-axis half-angles theta (x-z plane) / beta (y-z plane),
reconstruct the three-component velocity field. Index 0 = left camera,
1 = right camera.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def willert(flow: Sequence[np.ndarray], theta: Tuple[float, float], beta: Tuple[float, float]) -> np.ndarray:
    """Returns [H, W, 3] (U, V, W) from two [H, W, 2] camera flows."""
    u = [np.asarray(f)[:, :, 0] for f in flow]
    v = [np.asarray(f)[:, :, 1] for f in flow]
    t0, t1 = np.tan(theta[0]), np.tan(theta[1])
    b0, b1 = np.tan(beta[0]), np.tan(beta[1])

    u_3c = (u[1] * t0 - u[0] * t1) / (t0 - t1)
    v_3c = (v[0] + v[1]) / 2 + (u[1] - u[0]) * (b1 - b0) / (t0 - t1) / 2
    w_3c = (u[1] - u[0]) / (t0 - t1)
    return np.dstack([u_3c, v_3c, w_3c])
