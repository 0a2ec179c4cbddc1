"""Calibration-plate cross detection: template matching + local maxima.

Parity with reference ``stereo/matching.py``:
- ``gen_template``: synthetic cross template (``:7-29``),
- ``template_matching``: normalized cross-correlation on a zero-padded frame,
  thresholded + 2x2 box blur (``:32-56``),
- ``find_local_max``: connected-component centroids -> (x, y) (``:59-75``),
- ``select_ref``: interactive 4-point reference picking (``:78-115``) plus a
  non-interactive variant for scripted calibration.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def gen_template(TC: int = 5, HC: int = 25, LC: int = 25) -> np.ndarray:
    """Cross template image, uint8 grayscale. TC = cross thickness."""
    template = np.zeros((HC, LC))
    hc2, lc2 = int(np.ceil(HC / 2)), int(np.ceil(LC / 2))
    tc2 = int(np.floor(TC / 2))
    if TC % 2:  # odd thickness
        template[hc2 - tc2 - 1 : hc2 + tc2, :] = 1.0
        template[:, lc2 - tc2 - 1 : lc2 + tc2] = 1.0
    else:
        template[hc2 - tc2 - 1 : hc2 + tc2 - 1, :] = 1.0
        template[:, lc2 - tc2 - 1 : lc2 + tc2] = 1.0
    return (template * 255).astype(np.uint8)


def template_matching(gray_img: np.ndarray, template: np.ndarray, threshold: float = 0.0) -> np.ndarray:
    """Zero-pad, normalized-ccoeff template match, threshold, 2x2 blur."""
    import cv2

    pad = [int((template.shape[0] - 1) / 2), int((template.shape[1] - 1) / 2)]
    padded = np.zeros(
        (gray_img.shape[0] + 2 * pad[0], gray_img.shape[1] + 2 * pad[1]), np.uint8
    )
    padded[pad[0] : -pad[0], pad[1] : -pad[1]] = gray_img
    res = cv2.matchTemplate(padded, template, cv2.TM_CCOEFF_NORMED)
    res = res * (res > threshold)
    return cv2.blur(res, (2, 2))


def find_local_max(image: np.ndarray) -> np.ndarray:
    """Connected-component centroids of the thresholded correlation map,
    returned as [N, 2] (x, y)."""
    from scipy import ndimage

    lbl, n = ndimage.label(image)
    points = ndimage.center_of_mass(image, lbl, list(range(1, n + 1)))
    return np.fliplr(np.asarray(points, np.float64).reshape(-1, 2))


def select_ref_points(coords: np.ndarray, clicks: List[Tuple[float, float]]):
    """Snap 4 approximate (clicked) positions to the nearest detected points.

    Returns (points_ref [4,2], selected_indices, center_point) with the
    reference's center computation (``stereo/matching.py:107-112``).
    """
    coords = np.asarray(coords, np.float64)
    selected = []
    for click in clicks:
        d = np.linalg.norm(coords - np.asarray(click, np.float64), axis=1)
        selected.append(int(np.argmin(d)))
    points_ref = coords[selected]
    c_x = (abs(points_ref[1, 0] - points_ref[0, 0]) + abs(points_ref[3, 0] - points_ref[2, 0])) * 0.5
    c_y = (abs(points_ref[3, 1] - points_ref[0, 1]) + abs(points_ref[2, 1] - points_ref[1, 1])) * 0.5
    return points_ref, selected, [c_x, c_y]


def select_ref(coords: np.ndarray):
    """Interactive 4-point picking via matplotlib ginput (clockwise L-R-D-L),
    reference ``stereo/matching.py:78-115``. Requires a display."""
    import matplotlib.pyplot as plt

    clicks = []
    for i in range(4):
        pt = plt.ginput(1, timeout=-1, show_clicks=True)[0]
        print(f"\t{i + 1}. Clicked at {pt}")
        clicks.append(pt)
    points_ref, selected, c_point = select_ref_points(coords, clicks)
    for i in range(4):
        j = (i + 1) % 4
        plt.plot([points_ref[i, 0], points_ref[j, 0]], [points_ref[i, 1], points_ref[j, 1]], "r-")
        plt.plot(points_ref[i, 0], points_ref[i, 1], "yo")
    return points_ref, selected, c_point
