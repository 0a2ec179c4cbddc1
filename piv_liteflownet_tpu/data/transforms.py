"""Device-side augmentation: the reference's transform pipeline, fused.

The reference augments on host with PIL/scipy and module-level ``random``
(reference ``src/flow_transforms.py``). TPU-first redesign: the default
pipeline Translate -> Scale -> HFlip -> VFlip -> RandomCrop (reference
``src/datasets.py:568-607``) is *one affine coordinate map* per sample, so we
compose it and execute a single bilinear gather per image (+ one for the flow)
at the static crop resolution — batched, keyed-PRNG, fully inside jit. No
dynamic shapes ever materialize.

Component semantics preserved:
- Translate(t%): img1/img2 shifted oppositely, flow += (tw, th)
  (reference ``src/flow_transforms.py:126-169``).
- Scale(s): images resized, flow resampled and u *= sw, v *= sh
  (reference ``:235-282``).
- H/V flip: mirror + negate u/v (reference ``:380-401``).
- Crop rand/center (reference ``:285-377``).
- Photometric: shared per-sample contrast/brightness/color/gamma/noise,
  ``clamp((im*(c+1)+b)*color)^(1/gamma) + noise``
  (reference ``:35-86``; the noise std is drawn per *call* here rather than
  once at construction, which is the evident intent of the original).
- GaussianBlur(radius, p=0.5) as a separable conv (reference ``:89-104``).
- Normalize(mean, std) (reference ``:405-435``).
- RandomRotate via the same gather machinery + flow rotation correction
  (reference ``:172-232``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Photometric:
    noise_std_range: Tuple[float, float] = (0.0, 0.0)
    contrast_range: Tuple[float, float] = (0.0, 0.0)
    brightness_sigma: float = 0.0
    color_range: Tuple[float, float] = (1.0, 1.0)
    gamma_range: Tuple[float, float] = (1.0, 1.0)


@dataclasses.dataclass(frozen=True)
class Pipeline:
    crop_size: Tuple[int, int] = (256, 256)
    crop_type: str = "rand"  # or "center"
    translate: int = 0  # percent of each dim, like reference RandomTranslate
    scale_range: Optional[Tuple[float, float]] = None
    rotate: float = 0.0  # max |angle| degrees
    rotate_diff: float = 0.0
    hflip: bool = False
    vflip: bool = False
    photometric: Optional[Photometric] = None
    # crop-with-padding (reference Crop(padding=...), src/flow_transforms.py:
    # 285-377): when the crop is larger than the (translated/scaled) frame,
    # the frame is centered and the border filled with this rgb value
    # ([0,1] floats here; the reference takes 0-255 ints); flow pads with 0.
    # None keeps the reference's behavior of refusing oversized crops (we
    # clamp-sample instead of raising).
    pad_fill: Optional[Tuple[float, float, float]] = None
    # RandomGaussianBlur(radius), applied to both frames of a sample with
    # probability blur_prob (reference src/flow_transforms.py:89-104; its
    # occurrence probability is fixed at 0.5). Runs on the cropped output.
    blur_radius: float = 0.0
    blur_prob: float = 0.5
    # Normalize(mean, std) as the final stage (reference :405-435)
    normalize_mean: Optional[Tuple[float, ...]] = None
    normalize_std: Optional[Tuple[float, ...]] = None
    # resample engine: "auto" uses the separable two-matmul path whenever the
    # geometry has no rotation (scale/translate/flip/crop factor into
    # per-axis 1-D maps, so bilinear = row-interp x col-interp on the MXU —
    # the train-step bill puts the fused aug gather at ~7.7 ms/step b8 256^2,
    # work/train_bill.log, vs ~0.1 ms of matmuls); "gather" forces the
    # packed-tap gather (rotation always uses it). Both are the same bilinear
    # taps/weights, equal up to f32 summation order.
    resample: str = "auto"

    def __post_init__(self):
        if self.resample not in ("auto", "gather"):
            raise ValueError(
                f"Pipeline.resample must be 'auto' or 'gather', got {self.resample!r}"
            )


def _bilinear_sample(img: jax.Array, x: jax.Array, y: jax.Array,
                     fill=None) -> jax.Array:
    """Gather img[y, x] bilinearly with edge clamping. img [H,W,C]; x,y [h,w].
    With ``fill``, out-of-frame samples return the fill vector instead of the
    clamped edge (crop-with-padding semantics)."""
    h, w = img.shape[0], img.shape[1]
    oob = None
    if fill is not None:
        oob = (x < -0.5) | (x > w - 0.5) | (y < -0.5) | (y > h - 0.5)
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    # TPU gathers are descriptor(row)-bound, so the four bilinear taps are
    # packed into 4C-wide rows (one bottom/right zero pad) and fetched with
    # ONE gather instead of four — the same trick as ops/warp.pack_img,
    # measured 3.4x there; the r4 train-step ablation put augmentation at
    # 49 ms/step (b8 256^2), most of it these gathers. The clip above
    # guarantees x0, y0 in range, and x == w-1 gives wx == 0 so the padded
    # (x0+1) tap never carries weight (same for y).
    c = img.shape[-1]
    imgp = jnp.pad(img, ((0, 1), (0, 1), (0, 0)))
    packed = jnp.concatenate(
        [imgp[:h, :w], imgp[:h, 1:], imgp[1:, :w], imgp[1:, 1:]], axis=-1
    ).reshape(h * w, 4 * c)
    taps = jnp.take(packed, (y0 * w + x0).reshape(-1), axis=0)
    taps = taps.reshape(*x.shape, 4, c)
    w00 = (1 - wx) * (1 - wy)
    w01 = wx * (1 - wy)
    w10 = (1 - wx) * wy
    w11 = wx * wy
    out = (
        taps[..., 0, :] * w00
        + taps[..., 1, :] * w01
        + taps[..., 2, :] * w10
        + taps[..., 3, :] * w11
    )
    if oob is not None:
        out = jnp.where(oob[..., None], jnp.asarray(fill, out.dtype), out)
    return out


def _interp_matrix(coord: jax.Array, size: int) -> jax.Array:
    """Dense 1-D bilinear-interpolation matrix M [n, size] for sample
    coordinates ``coord`` [n]: ``M @ v`` equals clamped bilinear sampling of a
    length-``size`` signal at ``coord``. Two nonzeros per row; built as
    one-hot compares so the resample runs as a matmul on the MXU instead of a
    descriptor-bound gather (see ``Pipeline.resample``)."""
    c = jnp.clip(coord, 0.0, size - 1.0)
    i0 = jnp.floor(c)
    frac = (c - i0)[:, None]
    i0 = i0.astype(jnp.int32)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, size), 1)
    # the frac==0 edge (i0 == size-1) keeps the second tap's weight at 0
    return ((idx == i0[:, None]) * (1.0 - frac)
            + (idx == jnp.minimum(i0 + 1, size - 1)[:, None]) * frac)


def _bilinear_sample_sep(img: jax.Array, x: jax.Array, y: jax.Array,
                         fill=None) -> jax.Array:
    """Separable counterpart of :func:`_bilinear_sample` for axis-aligned
    maps: ``x`` [wout] varies only along columns, ``y`` [hout] only along
    rows. Same taps and weights (equal up to f32 summation order)."""
    h, w = img.shape[0], img.shape[1]
    my = _interp_matrix(y, h)  # [hout, H]
    mx = _interp_matrix(x, w)  # [wout, W]
    tmp = jnp.einsum("ih,hwc->iwc", my, img, precision="highest")
    out = jnp.einsum("jw,iwc->ijc", mx, tmp, precision="highest")
    if fill is not None:
        oob = ((y < -0.5) | (y > h - 0.5))[:, None] | \
              ((x < -0.5) | (x > w - 0.5))[None, :]
        out = jnp.where(oob[..., None], jnp.asarray(fill, out.dtype), out)
    return out


def _sample_geometry(key, pipe: Pipeline, h: int, w: int):
    """Draw all geometric random factors for one sample."""
    ks = jax.random.split(key, 8)
    ch, cw = pipe.crop_size

    # translation in pixels (percent of dims, reference :148-150)
    if pipe.translate:
        tw = jnp.floor(
            jax.random.uniform(ks[0], (), minval=-pipe.translate, maxval=pipe.translate) * w / 100.0
        )
        th = jnp.floor(
            jax.random.uniform(ks[1], (), minval=-pipe.translate, maxval=pipe.translate) * h / 100.0
        )
    else:
        tw = th = jnp.zeros(())

    if pipe.scale_range is not None:
        s = jax.random.uniform(ks[2], (), minval=pipe.scale_range[0], maxval=pipe.scale_range[1])
    else:
        s = jnp.ones(())

    fh = jax.random.bernoulli(ks[3]) if pipe.hflip else jnp.array(False)
    fv = jax.random.bernoulli(ks[4]) if pipe.vflip else jnp.array(False)

    # post-scale valid extent: scaled translated image must contain the crop
    sw = (w - jnp.abs(tw)) * s
    sh = (h - jnp.abs(th)) * s
    max_ox = jnp.maximum(sw - cw, 0.0)
    max_oy = jnp.maximum(sh - ch, 0.0)
    if pipe.crop_type == "rand":
        ox = jax.random.uniform(ks[5], ()) * max_ox
        oy = jax.random.uniform(ks[6], ()) * max_oy
    else:
        ox, oy = max_ox / 2.0, max_oy / 2.0
    if pipe.pad_fill is not None:
        # oversized crop: center the frame in the fill border (reference
        # Crop(padding=...) pads half each side then has zero offset range)
        ox = ox + jnp.minimum(sw - cw, 0.0) / 2.0
        oy = oy + jnp.minimum(sh - ch, 0.0) / 2.0

    if pipe.rotate:
        ang = jax.random.uniform(ks[7], (), minval=-pipe.rotate, maxval=pipe.rotate)
    else:
        ang = jnp.zeros(())
    return dict(tw=tw, th=th, s=s, fh=fh, fv=fv, ox=ox, oy=oy, ang=ang)


def _augment_one(key, img1, img2, flow, pipe: Pipeline):
    """Apply the fused geometric + photometric pipeline to one sample."""
    h, w = img1.shape[0], img1.shape[1]
    ch, cw = pipe.crop_size
    kg, kp = jax.random.split(key)
    geo = _sample_geometry(kg, pipe, h, w)
    tw, th, s = geo["tw"], geo["th"], geo["s"]

    # output crop grid — 1-D per axis; the geometry is axis-separable unless
    # rotation is on, and the separable path feeds the two-matmul resampler
    sep = (not pipe.rotate) and pipe.resample != "gather"
    xo = jax.lax.iota(jnp.float32, cw)
    yo = jax.lax.iota(jnp.float32, ch)
    # flips mirror the output grid (flow components negated below)
    xo = jnp.where(geo["fh"], cw - 1.0 - xo, xo)
    yo = jnp.where(geo["fv"], ch - 1.0 - yo, yo)
    # crop offset, then inverse-scale (half-pixel convention), then rotation
    xs = (xo + geo["ox"] + 0.5) / s - 0.5
    ys = (yo + geo["oy"] + 0.5) / s - 0.5
    if not sep:
        xs = jnp.broadcast_to(xs[None, :], (ch, cw))
        ys = jnp.broadcast_to(ys[:, None], (ch, cw))
    if pipe.rotate:
        rad = geo["ang"] * math.pi / 180.0
        cx = (w - jnp.abs(tw)) / 2.0
        cy = (h - jnp.abs(th)) / 2.0
        ca, sa = jnp.cos(rad), jnp.sin(rad)
        xr = ca * (xs - cx) - sa * (ys - cy) + cx
        yr = sa * (xs - cx) + ca * (ys - cy) + cy
        xs, ys = xr, yr
    sample = _bilinear_sample_sep if sep else _bilinear_sample
    # translate offsets: img1 window starts at a=(max(0,tw),max(0,th)),
    # img2 at b=(max(0,-tw),max(0,-th))  (reference :158-162)
    ax = jnp.maximum(0.0, tw)
    ay = jnp.maximum(0.0, th)
    bx = jnp.maximum(0.0, -tw)
    by = jnp.maximum(0.0, -th)

    fill = pipe.pad_fill
    out2 = sample(img2, xs + bx, ys + by, fill=fill)

    new_flow = None
    if flow is None:
        out1 = sample(img1, xs + ax, ys + ay, fill=fill)
    else:
        # img1 and the flow share the exact same sample grid (xs+ax, ys+ay),
        # so they ride ONE combined gather (20-wide packed rows instead of
        # 12+8) — per-channel taps and weights are unchanged, so this is
        # exact; only the fill vector is per-channel (img fill + flow zeros).
        fill_c = None
        if fill is not None:
            fill_c = np.concatenate([
                np.broadcast_to(np.asarray(fill, np.float32), (img1.shape[-1],)),
                np.zeros((flow.shape[-1],), np.float32),
            ])
        comb = sample(
            jnp.concatenate([img1, flow.astype(img1.dtype)], axis=-1),
            xs + ax, ys + ay, fill=fill_c,
        )
        out1 = comb[..., : img1.shape[-1]]
        f = comb[..., img1.shape[-1]:]
        f = f + jnp.stack([tw, th])  # translate offset (reference :166-168)
        f = f * s  # scale rescales u, v (reference resize_flow contract)
        if pipe.rotate:
            ca, sa = jnp.cos(rad), jnp.sin(rad)
            u = ca * f[..., 0] + sa * f[..., 1]
            v = -sa * f[..., 0] + ca * f[..., 1]
            f = jnp.stack([u, v], -1)
        sign_u = jnp.where(geo["fh"], -1.0, 1.0)
        sign_v = jnp.where(geo["fv"], -1.0, 1.0)
        new_flow = f * jnp.stack([sign_u, sign_v])

    if pipe.photometric is not None:
        ph = pipe.photometric
        kk = jax.random.split(kp, 5)
        contrast = jax.random.uniform(kk[0], (), minval=ph.contrast_range[0], maxval=ph.contrast_range[1])
        gamma = jax.random.uniform(kk[1], (), minval=ph.gamma_range[0], maxval=ph.gamma_range[1])
        color = jax.random.uniform(kk[2], (3,), minval=ph.color_range[0], maxval=ph.color_range[1])
        brightness = jax.random.normal(kk[3], ()) * ph.brightness_sigma
        noise_std = jax.random.uniform(
            kk[4], (), minval=ph.noise_std_range[0], maxval=ph.noise_std_range[1]
        )
        knoise = jax.random.fold_in(kk[4], 1)

        def photo(im, sub):
            im = jnp.clip((im * (contrast + 1.0) + brightness) * color, 0.0, 1.0)
            im = jnp.power(im, 1.0 / gamma)
            return im + jax.random.normal(jax.random.fold_in(knoise, sub), im.shape) * noise_std

        out1 = photo(out1, 0)
        out2 = photo(out2, 1)

    if pipe.blur_radius > 0.0:
        kblur = jax.random.fold_in(kp, 7)
        do_blur = jax.random.bernoulli(kblur, pipe.blur_prob)
        b1 = gaussian_blur(out1[None], pipe.blur_radius)[0]
        b2 = gaussian_blur(out2[None], pipe.blur_radius)[0]
        out1 = jnp.where(do_blur, b1, out1)
        out2 = jnp.where(do_blur, b2, out2)

    if pipe.normalize_mean is not None:
        std = pipe.normalize_std if pipe.normalize_std is not None else (1.0,) * 3
        out1 = normalize(out1, pipe.normalize_mean, std)
        out2 = normalize(out2, pipe.normalize_mean, std)

    return out1, out2, new_flow


def apply_pipeline(key, img1, img2, flow, pipe: Pipeline):
    """Batched augmentation: img1/img2 [B,H,W,3], flow [B,H,W,2] or None.

    Returns cropped/augmented ([B,ch,cw,3], [B,ch,cw,3], [B,ch,cw,2]).
    Jit-compatible (use with a static ``pipe``).
    """
    b = img1.shape[0]
    keys = jax.random.split(key, b)
    if flow is None:
        fn = lambda k, a, c: _augment_one(k, a, c, None, pipe)[:2]
        return jax.vmap(fn)(keys, img1, img2)
    fn = lambda k, a, c, f: _augment_one(k, a, c, f, pipe)
    return jax.vmap(fn)(keys, img1, img2, flow)


def gaussian_blur(img: jax.Array, radius: float = 2.0) -> jax.Array:
    """PIL-style Gaussian blur (separable conv), NHWC batched."""
    sigma = radius
    r = max(1, int(2 * sigma))
    xs = np.arange(-r, r + 1, dtype=np.float32)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    k /= k.sum()
    kh = jnp.asarray(k).reshape(-1, 1, 1, 1)
    kw = jnp.asarray(k).reshape(1, -1, 1, 1)
    c = img.shape[-1]
    from jax import lax

    def dw(x, kern, pad_h, pad_w):
        return lax.conv_general_dilated(
            x, jnp.tile(kern, (1, 1, 1, c)), (1, 1),
            [(pad_h, pad_h), (pad_w, pad_w)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )

    return dw(dw(img, kh, r, 0), kw, 0, r)


def normalize(img: jax.Array, mean, std) -> jax.Array:
    """(im - mean) / std per channel (reference ``src/flow_transforms.py:405-435``)."""
    return (img - jnp.asarray(mean, img.dtype)) / jnp.asarray(std, img.dtype)
