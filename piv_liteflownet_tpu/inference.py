"""Inference engine: the ``estimate()`` contract + batched TPU pipeline.

Contract parity with reference ``inference.py:30-67``:
1. both frames are bilinearly resized (align_corners=False) to the next
   multiple of 32,
2. one eval-mode forward produces the final scaled flow,
3. the flow is resized back to the input size with u scaled by W_in/W_32 and
   v by H_in/H_32,
4. returns HWC float32 numpy (or the device array).

TPU-first differences: the resize -> forward -> resize-back -> rescale chain
is ONE jitted program (no host round-trips mid-pipeline), it is batched
(B image pairs per step instead of the reference's DataLoader(bs=1)), and
input dtype/layout is NHWC.
"""

from __future__ import annotations

import functools
import math
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from piv_liteflownet_tpu.models.factory import Model
from piv_liteflownet_tpu.models.liteflownet import forward
from piv_liteflownet_tpu.ops.resize import resize_bilinear
from piv_liteflownet_tpu.utils.flow_io import flowname_modifier, write_flow


def _adaptive_size(h: int, w: int, mult: int = 32) -> Tuple[int, int]:
    return int(math.ceil(h / mult) * mult), int(math.ceil(w / mult) * mult)


def _estimate_impl(params, img1, img2, cfg, out_h, out_w, precision):
    """resize-to-/32 -> forward -> resize-back -> rescale, fully fused."""
    in_h, in_w = img1.shape[1], img1.shape[2]
    ah, aw = _adaptive_size(in_h, in_w)
    x1 = resize_bilinear(img1, ah, aw, precision)
    x2 = resize_bilinear(img2, ah, aw, precision)
    flow = forward(params, x1, x2, cfg, train=False, precision=precision)
    flow = resize_bilinear(flow, out_h, out_w, precision)
    scale = jnp.asarray([in_w / aw, in_h / ah], flow.dtype)
    return flow * scale


_estimate_jit = functools.partial(
    jax.jit, static_argnames=("cfg", "out_h", "out_w", "precision")
)(_estimate_impl)


@functools.partial(
    jax.jit, static_argnames=("cfg", "out_h", "out_w", "precision", "mesh")
)
def _estimate_sharded(params, img1, img2, cfg, out_h, out_w, precision, mesh):
    """Data-parallel estimate over a ``data``-axis mesh: params replicated,
    batch sharded, each device running the full single-chip pipeline on its
    shard (``shard_map`` — no GSPMD partitioning of the Pallas kernels).

    This is the multi-device inference route to the >=200 pairs/s north star
    (BASELINE.md): the reference's only parallelism is the trainer-side
    ``nn.parallel.DataParallel`` (reference ``trainer.py:371-376``); its
    ``run.py`` is single-GPU.
    """
    from jax.sharding import PartitionSpec as P

    fn = functools.partial(
        _estimate_impl, cfg=cfg, out_h=out_h, out_w=out_w, precision=precision
    )
    return jax.shard_map(
        lambda p, a, b: fn(p, a, b),
        mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=P("data"),
    )(params, img1, img2)


def estimate(
    model: Model,
    img1,
    img2,
    tensor: bool = False,
    precision="auto",
    mesh=None,
    spatial_mesh=None,
):
    """Estimate flow for one pair or a batch of pairs.

    img1/img2: [H, W, 3] or [B, H, W, 3], float32 in [0, 1] (NHWC).
    Returns [H, W, 2] numpy (single pair, ``tensor=False``) or the
    [B, H, W, 2] device array (``tensor=True`` or batched input).

    precision="auto": HIGHEST for f32 params (reference parity), native
    single-pass MXU for bf16 params (the fast path — HIGHEST on bf16 would
    upcast every conv and multiply compile size/time).

    mesh: optional ``jax.sharding.Mesh`` with a ``data`` axis — the batch is
    sharded over it (padded by repeating the last pair when B is not a
    multiple of the axis size) and every device runs the full pipeline on
    its shard. Aggregate throughput scales with the axis size.

    spatial_mesh: optional ``Mesh`` with a ``spatial`` axis — each frame's
    HEIGHT is sharded over it (``parallel/spatial.py``) so images larger than
    one chip's HBM run with per-device peak ~H/N. The /32 adaptive resize is
    raised to the next multiple of 32*N when needed (frames already divisible
    keep the exact reference resize contract). Mutually exclusive with
    ``mesh``. The reference destructively center-crops such frames instead
    (reference ``src/datasets.py:307-315``).
    """
    # run in the params' dtype (bf16 fast path stays bf16 end to end)
    dtype = jnp.result_type(*(jax.tree.leaves(model.params)[:1] or [jnp.float32]))
    if precision == "auto":
        precision = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    img1 = jnp.asarray(img1, dtype)
    img2 = jnp.asarray(img2, dtype)
    single = img1.ndim == 3
    if single:
        img1, img2 = img1[None], img2[None]
    assert img1.shape == img2.shape, "both frames must have the same shape"
    in_h, in_w = img1.shape[1], img1.shape[2]
    ns = 1 if spatial_mesh is None else int(spatial_mesh.shape.get("spatial", 1))
    if ns > 1:
        assert mesh is None, "mesh and spatial_mesh are mutually exclusive"
        from piv_liteflownet_tpu.parallel.spatial import spatial_estimate

        ah, aw = _adaptive_size(in_h, in_w)
        ah = int(math.ceil(ah / (32 * ns)) * 32 * ns)  # even level-6 H shards
        if (in_h, in_w) != (ah, aw):
            img1 = resize_bilinear(img1, ah, aw, precision)
            img2 = resize_bilinear(img2, ah, aw, precision)
        flow = spatial_estimate(model, img1, img2, spatial_mesh)
        if (in_h, in_w) != (ah, aw):
            flow = resize_bilinear(flow, in_h, in_w, precision)
            flow = flow * jnp.asarray([in_w / aw, in_h / ah], flow.dtype)
        if tensor or not single:
            return flow
        return np.asarray(flow[0])
    n = 1 if mesh is None else int(mesh.shape.get("data", 1))
    if n > 1:
        b = img1.shape[0]
        pad = (-b) % n
        if pad:
            img1 = jnp.concatenate([img1, jnp.repeat(img1[-1:], pad, 0)], 0)
            img2 = jnp.concatenate([img2, jnp.repeat(img2[-1:], pad, 0)], 0)
        flow = _estimate_sharded(
            model.params, img1, img2, model.cfg, in_h, in_w, precision, mesh
        )[:b]
    else:
        flow = _estimate_jit(model.params, img1, img2, model.cfg, in_h, in_w, precision)
    if tensor or not single:
        return flow
    return np.asarray(flow[0])


class Inference:
    """Directory / sequence / video inference driver.

    Mirrors the reference ``Inference`` class surface (reference
    ``inference.py:70-213``): ``images_parsing``, ``dataloader_parsing``,
    ``video_parsing``, ``parser`` — backed by the batched pipeline above.
    """

    def __init__(self, model: Model, netname: Optional[str] = None,
                 output_dir: str = "./outputs", batch_size: int = 1):
        self.netname = (
            "test" if netname is None else os.path.splitext(os.path.basename(netname))[0]
        )
        self.default = os.path.join(output_dir, self.netname)
        self.model = model
        self.batch_size = batch_size

    # -- static single-pair parser (reference inference.py:202-213)
    @staticmethod
    def parser(model: Model, im1, im2):
        a1 = np.asarray(im1, np.float32)
        a2 = np.asarray(im2, np.float32)
        if a1.max() > 1.5:  # 8-bit image -> [0,1] (torchvision ToTensor contract)
            a1, a2 = a1 / 255.0, a2 / 255.0
        assert a1.shape == a2.shape
        return estimate(model, a1, a2)

    def images_parsing(self, imgdir: str, pair: bool = True, write: bool = True) -> List[str]:
        from PIL import Image

        from piv_liteflownet_tpu.utils.flow_io import image_files_from_folder

        if not os.path.isdir(imgdir):
            raise ValueError(f"Input directory is NOT found! At {imgdir}")
        outdir = os.path.join(self.default, os.path.basename(imgdir) + "_parse")
        os.makedirs(outdir, exist_ok=True)

        out_names = []
        if pair:
            for file1 in image_files_from_folder(imgdir, pair=True):
                fbase, fext = os.path.splitext(file1)
                file2 = fbase.rsplit("_", 1)[0] + "_img2" + fext
                if os.path.isfile(file2):
                    flow = self.parser(
                        self.model,
                        Image.open(file1).convert("RGB"),
                        Image.open(file2).convert("RGB"),
                    )
                    out_name = flowname_modifier(file1, outdir, pair=True)
                    if write:
                        write_flow(flow, out_name)
                    out_names.append(out_name)
        else:
            files = image_files_from_folder(imgdir, pair=False)
            for prev_f, curr_f in zip(files[:-1], files[1:]):
                flow = self.parser(
                    self.model,
                    Image.open(prev_f).convert("RGB"),
                    Image.open(curr_f).convert("RGB"),
                )
                out_name = flowname_modifier(prev_f, outdir, pair=False)
                if write:
                    write_flow(flow, out_name)
                out_names.append(out_name)
        return out_names

    def dataloader_parsing(self, dir: str, pair: bool = True, write: bool = True) -> List[str]:
        from piv_liteflownet_tpu.data.datasets import Run
        from piv_liteflownet_tpu.data.loader import BatchLoader

        if not os.path.isdir(dir):
            raise ValueError(f"Input directory is NOT found! At {dir}")
        outdir = os.path.join(self.default, os.path.basename(dir) + "_loader")
        os.makedirs(outdir, exist_ok=True)
        ds = Run(root=dir, is_pair=pair)
        out_names = []
        for (im1, im2), names in BatchLoader(ds, batch_size=self.batch_size):
            flows = np.asarray(estimate(self.model, im1, im2, tensor=True))
            for i, name in enumerate(names):
                out_name = flowname_modifier(name, outdir, pair=pair)
                if write:
                    write_flow(flows[i], out_name)
                out_names.append(out_name)
        return out_names

    def video_parsing(self, vidfile=0, write: bool = True) -> List[str]:
        """Frame-sequential flow on a video file (reference inference.py:81-128).

        Uses cv2.VideoCapture directly (no imutils dependency); webcam/stream
        input requires a display-less capture loop.
        """
        import cv2

        if isinstance(vidfile, str) and not os.path.isfile(vidfile):
            raise ValueError(f"Input video file is NOT found! At {vidfile}")
        window_name = (
            os.path.splitext(os.path.basename(vidfile))[0]
            if isinstance(vidfile, str) else "piv_stream"
        )
        cap = cv2.VideoCapture(vidfile)
        outdir = os.path.join(self.default, f"vid_{window_name}")
        os.makedirs(outdir, exist_ok=True)

        count = 0
        out_names = []
        prev = None
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            if prev is not None:
                count += 1
                flow = self.parser(self.model, prev, frame)
                out_name = os.path.join(outdir, f"{window_name}_{count:06d}_out.flo")
                if write:
                    write_flow(flow, out_name)
                out_names.append(out_name)
            prev = frame
        cap.release()
        return out_names
