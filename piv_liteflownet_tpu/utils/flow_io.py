"""Middlebury ``.flo`` I/O and flow array utilities.

Byte contract (identical to reference ``src/utils_plot.py:26-158``):
``float32 tag 202021.25 | int32 width | int32 height | float32[h*w*bands]``
with 2 bands (u, v) or 3 bands (u, v, w) for stereo output.
"""

from __future__ import annotations

import io
import os
import re
from glob import glob
from typing import List, Tuple, Union

import numpy as np

TAG_STRING = "PIEH"
TAG_FLOAT = 202021.25
UNKNOWN_FLOW_THRESH = 1e9


def _crop(flow: np.ndarray, crop_window: Union[int, Tuple[int, int, int, int]] = 0):
    """Crop (top, bottom, left, right) margins; int applies to all sides."""
    if isinstance(crop_window, int):
        if crop_window == 0:
            return flow
        crop_window = (crop_window,) * 4
    t, b, l, r = crop_window
    h, w = flow.shape[:2]
    return flow[t : h - b if b else h, l : w - r if r else w]


def read_flow(
    filename,
    use_stereo: bool = False,
    crop_window: Union[int, Tuple[int, int, int, int]] = 0,
) -> np.ndarray:
    """Read a ``.flo`` file; returns float32 [H, W, 2] (or [H, W, 3] stereo)."""
    if not isinstance(filename, io.BufferedReader):
        if not isinstance(filename, str):
            raise AssertionError(f"Input [{filename}] is not a string")
        if not os.path.isfile(filename):
            raise AssertionError(f"Path [{filename}] does not exist")
        if filename.split(".")[-1] != "flo":
            raise AssertionError(
                f"File extension [flo] required, [{filename.split('.')[-1]}] given"
            )
        flo = open(filename, "rb")
    else:
        flo = filename

    tag = np.frombuffer(flo.read(4), np.float32, count=1)[0]
    if tag != np.float32(TAG_FLOAT):
        raise AssertionError(f"Wrong Tag [{tag}]")
    width = int(np.frombuffer(flo.read(4), np.int32, count=1)[0])
    if not (0 < width < 100000):
        raise AssertionError(f"Illegal width [{width}]")
    height = int(np.frombuffer(flo.read(4), np.int32, count=1)[0])
    if not (0 < height < 100000):
        raise AssertionError(f"Illegal height [{height}]")

    n_bands = 3 if use_stereo else 2
    size = n_bands * width * height
    data = np.frombuffer(flo.read(size * 4), np.float32, count=size)
    flow = data.reshape(height, width, n_bands).copy()
    flo.close()
    return _crop(flow, crop_window)


def write_flow(flow: np.ndarray, filename: str, norm: bool = False) -> None:
    """Write a ``.flo`` file (2- or 3-band)."""
    assert isinstance(filename, str), f"file is not str ({filename!r})"
    assert filename[-4:] == ".flo", f"file ending is not .flo ({filename[-4:]!r})"
    flow = np.asarray(flow)
    height, width, n_bands = flow.shape
    assert n_bands in (2, 3), f"Number of bands = {n_bands} != (2 or 3)"
    if norm:
        mag = np.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2).max()
        if mag > 0:
            flow = flow / mag
    with open(filename, "wb") as f:
        np.array([TAG_FLOAT], dtype=np.float32).tofile(f)
        np.array([width], dtype=np.int32).tofile(f)
        np.array([height], dtype=np.int32).tofile(f)
        flow.astype(np.float32).tofile(f)


def read_flow_collection(
    dirname: str,
    start_at: int = 0,
    num_images: int = -1,
    use_stereo: bool = False,
    crop_window: Union[int, Tuple[int, int, int, int]] = 0,
) -> Tuple[np.ndarray, List[str]]:
    """Load all ``.flo`` in a directory sorted by trailing frame index
    (reference ``src/utils_plot.py:76-117``)."""
    pattern = re.compile(r"\d+")
    files = []
    for f in os.listdir(dirname):
        if f.endswith(".flo"):
            match = pattern.findall(f)
            if match:
                files.append((int(match[-1]), os.path.join(dirname, f)))
    files.sort(key=lambda x: x[0])
    files = files[start_at:] if num_images < 0 else files[start_at : start_at + num_images]

    flos, flonames = [], []
    for _, filepath in files:
        flos.append(read_flow(filepath, use_stereo=use_stereo, crop_window=crop_window))
        flonames.append(filepath)
    return np.array(flos), flonames


def unknown_flow(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    return (
        (np.fabs(u) > UNKNOWN_FLOW_THRESH)
        | (np.fabs(v) > UNKNOWN_FLOW_THRESH)
        | np.isnan(u)
        | np.isnan(v)
    )


def flowname_modifier(indir: str, outdir: str, ext: str = "_out.flo", pair: bool = True) -> str:
    """``<base>_img1.png -> <outdir>/<base>_out.flo`` naming contract
    (reference ``src/utils_plot.py:310-318``)."""
    out_name = os.path.splitext(os.path.basename(indir))[0]
    if pair:
        out_name = str(out_name.rsplit("_", 1)[0]) + ext
    else:
        out_name += ext
    return os.path.join(outdir, out_name)


def resize_flow(flow: np.ndarray, des_width: int, des_height: int, method: str = "bilinear"):
    """Resize a flow field, rescaling u by the width ratio and v by the height
    ratio (reference ``src/utils_plot.py:321-351``). Dense flow only."""
    import cv2

    src_height, src_width = flow.shape[:2]
    if src_width == des_width and src_height == des_height:
        return flow
    ratio_height = float(des_height) / float(src_height)
    ratio_width = float(des_width) / float(src_width)
    interp = {"bilinear": cv2.INTER_LINEAR, "nearest": cv2.INTER_NEAREST}
    if method not in interp:
        raise ValueError("Invalid resize flow method!")
    flow = cv2.resize(flow, (des_width, des_height), interpolation=interp[method])
    flow[:, :, 0] *= ratio_width
    flow[:, :, 1] *= ratio_height
    return flow


def horizontal_flip_flow(flow: np.ndarray) -> np.ndarray:
    flow = np.copy(np.fliplr(flow))
    flow[:, :, 0] *= -1
    return flow


def vertical_flip_flow(flow: np.ndarray) -> np.ndarray:
    flow = np.copy(np.flipud(flow))
    flow[:, :, 1] *= -1
    return flow


def image_files_from_folder(folder: str, pair: bool = True, exts=("jpg", "jpeg", "png", "bmp", "tif", "ppm", "pgm")):
    """List images in a folder; when ``pair`` keep only ``*_img1.*`` files
    (reference ``src/utils_data.py`` contract used by inference)."""
    files = []
    for ext in exts:
        files += sorted(glob(os.path.join(folder, f"*.{ext}")))
    if pair:
        files = [f for f in files if os.path.splitext(f)[0].endswith("_img1")]
    return files
