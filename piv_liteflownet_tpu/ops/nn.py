"""Minimal NHWC conv primitives with torch-compatible numerics.

The reference model (reference ``src/models.py``) is built from
``torch.nn.Conv2d`` / ``ConvTranspose2d`` / ``LeakyReLU(0.1)``. Here the same
math is expressed TPU-first: NHWC layout, ``lax.conv_general_dilated`` on the
MXU, and explicit parameter pytrees (flat dicts keyed by torch-style names so
the weight converter is a pure layout transpose).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

# Dimension numbers for NHWC activations and HWIO kernels (TPU-native).
DIMNUMS = ("NHWC", "HWIO", "NHWC")


def leaky_relu(x: jax.Array, negative_slope: float = 0.1) -> jax.Array:
    """LeakyReLU matching ``torch.nn.LeakyReLU(negative_slope=0.1)``."""
    return jnp.where(x >= 0, x, x * negative_slope)


def _conv2d_xla(x, w, b, stride, padding, precision):
    pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=pad,
        dimension_numbers=DIMNUMS,
        precision=precision,
    )
    if b is not None:
        out = out + b
    return out


def wgrad_shift_gemm(x, g, kh, kw, stride, padding, out_dtype, precision=None):
    """Conv weight-grad as kh*kw shifted GEMMs (K = B*Ho*Wo, f32 accum).

    XLA's autodiff lowers the weight-grad as a convolution whose OUTPUT is
    the tiny [kh,kw,Cin,Cout] filter — the same small-output-window
    pathology measured on the cout=2 flow heads — and the r5 wall probe
    attributes 55.7 ms of the 151 ms train step to it (work/r5_wall.log).
    Here each filter tap is one (Cin x K)@(K x Cout) GEMM over the full
    batch*space contraction, which is plain MXU food. Equals the autodiff
    weight-grad up to f32 summation order.
    """
    b, h, w_in, cin = x.shape
    _, ho, wo, cout = g.shape
    xp = jnp.pad(x, ((0, 0), (padding[0], padding[0]),
                     (padding[1], padding[1]), (0, 0)))
    g2 = g.reshape(b * ho * wo, cout)
    taps = []
    for dy in range(kh):
        for dx in range(kw):
            sl = lax.slice(
                xp, (0, dy, dx, 0),
                (b, dy + (ho - 1) * stride[0] + 1,
                 dx + (wo - 1) * stride[1] + 1, cin),
                (1, stride[0], stride[1], 1),
            ).reshape(b * ho * wo, cin)
            taps.append(
                lax.dot_general(sl, g2, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=precision))
    return (jnp.stack(taps).reshape(kh, kw, cin, cout).astype(out_dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _conv2d_sw(x, w, b, stride, padding, precision):
    return _conv2d_xla(x, w, b, stride, padding, precision)


def _conv2d_sw_fwd(x, w, b, stride, padding, precision):
    return _conv2d_xla(x, w, b, stride, padding, precision), (x, w, b)


def _conv2d_sw_bwd(stride, padding, precision, res, g):
    x, w, b = res
    # data-grad: XLA's transposed conv (not the wall; r5_wall.log)
    _, pull = jax.vjp(
        lambda a: _conv2d_xla(a, w, None, stride, padding, precision), x)
    (gx,) = pull(g)
    gw = wgrad_shift_gemm(x, g, w.shape[0], w.shape[1], stride, padding,
                          w.dtype, precision)
    gb = None if b is None else jnp.sum(g, axis=(0, 1, 2)).astype(b.dtype)
    return gx, gw, gb


_conv2d_sw.defvjp(_conv2d_sw_fwd, _conv2d_sw_bwd)

#: conv weight-grad implementation ("xla" autodiff | "shift" GEMM-per-tap
#: everywhere | "stride2" GEMM-per-tap only for strided convs). Probe knob
#: (PIV_CONV_WGRAD) read at trace time; the A/B record lives in
#: work/r5_wgrad.log / BASELINE.md. The microbench splits by shape: XLA's
#: wgrad conv is FASTER at stride-1 (0.44-0.47 vs 1.7-2.1 ms on the big
#: 4 Mpx-contraction shapes) but pathological at stride 2 (NetC 32->64 s2:
#: 4.55 ms at 0.3 TF/s vs the shifted GEMM's 1.25 ms) — strided wgrad
#: becomes a dilated-rhs conv whose output is still the tiny filter.
#: "stride2" applies the reformulation only where it wins. Eval/inference
#: never differentiates convs, so this only affects training programs.
_CONV_WGRAD = os.environ.get("PIV_CONV_WGRAD", "xla")


def set_conv_wgrad(mode: str) -> str:
    """Set the conv weight-grad implementation; returns the previous mode."""
    global _CONV_WGRAD
    assert mode in ("xla", "shift", "stride2"), mode
    prev = _CONV_WGRAD
    _CONV_WGRAD = mode
    return prev


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] = 0,
    precision=None,
) -> jax.Array:
    """2D convolution, NHWC input, HWIO kernel, symmetric integer padding.

    Matches ``torch.nn.Conv2d(stride=stride, padding=padding)`` numerics
    (cross-correlation, zero padding). Under ``set_conv_wgrad("shift")``
    (all convs) or ``set_conv_wgrad("stride2")`` (strided convs only) the
    weight-gradient is computed by :func:`wgrad_shift_gemm` (values and
    data-grads unchanged).
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if _CONV_WGRAD == "shift" or (
            _CONV_WGRAD == "stride2" and stride != (1, 1)):
        return _conv2d_sw(x, w, b, stride, padding, precision)
    return _conv2d_xla(x, w, b, stride, padding, precision)


def conv2d_shift_smallcout(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    padding: int = 0,
    precision=None,
) -> jax.Array:
    """``conv2d`` for tiny output widths, as 1x1-conv + tap shift-sum.

    A k*k conv with cout=2 (the M/S flow-delta heads, reference
    ``src/models.py:154-163,209-217``) is pathological on the MXU: the output
    window is 2 lanes, so XLA's conv fusion re-reads the full input once per
    window tap — measured 18.4 ms/batch EACH for the two L1 k7 heads at
    b4 1024^2 (~13 GB of HBM traffic; work/trace_v1.log fusion.120/125).

    Reformulation: one 1x1 conv to k*k*cout channels (input read ONCE, the
    GEMM runs 98/128 lanes wide), then a shift-sum of the k*k tap planes
    (bandwidth-bound, f32 accumulation). Measured 47.2 -> 16.1 ms/batch
    standalone (work/lastconv.log). Equals ``conv2d`` up to summation order.

    Training bonus: the backward also avoids the tiny-N/tiny-K convs the
    direct head differentiates into (grad_x through a cin=2 k7 conv).
    Stride-1 only (the tap shift-sum assumes a dense output grid; asserted).
    """
    kh, kw, cin, cout = w.shape
    assert cout <= 32, f"shift head is for tiny cout (flow heads), got {cout}"
    bsz, h, win, _ = x.shape
    # w1[0,0,c,(dy*kw+dx)*cout+o] = w[dy,dx,c,o]
    w1 = jnp.transpose(w, (2, 0, 1, 3)).reshape(1, 1, cin, kh * kw * cout)
    z = conv2d(x, w1, None, 1, 0, precision)  # [B,H,W,kh*kw*cout]
    zp = jnp.pad(z, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    h_out = h + 2 * padding - kh + 1
    w_out = win + 2 * padding - kw + 1
    acc = jnp.zeros((bsz, h_out, w_out, cout), jnp.float32)
    for dy in range(kh):
        for dx in range(kw):
            t = dy * kw + dx
            sl = lax.slice(zp, (0, dy, dx, t * cout),
                           (bsz, dy + h_out, dx + w_out, (t + 1) * cout))
            acc = acc + sl.astype(jnp.float32)
    if b is not None:
        acc = acc + b.astype(jnp.float32)
    return acc.astype(x.dtype)


def netc_head_parity(
    x: jax.Array,
    w1: jax.Array,
    b1: Optional[jax.Array],
    w2: jax.Array,
    b2: Optional[jax.Array],
    precision=None,
) -> jax.Array:
    """``lrelu(conv_3x3_s2(lrelu(conv_7x7_s1(x))))`` — the NetC L1→L2 head
    (reference ``src/models.py:70-76``) — parity-decomposed so the full-res
    intermediate is never materialized.

    Motivation (v2 trace, work/trace_v2.log + hlo_map_v2.log): the cin=3
    7x7 conv runs at ~5% MXU rate (K = 3·7 = 21 of 128 packed lanes) and its
    full-res output round-trips HBM into XLA's space-to-batch banding with
    ~10.5 ms/exec of relayout copies. When the decoder starts at L2
    (``lowest_level>=2``, i.e. LiteFlowNet2), that intermediate has no other
    consumer, so the composite can run in parity space:

    - space-to-depth the input 2x2 → [B,H/2,W/2,4·cin];
    - conv1 splits into FOUR 4x4 convs (one per output-pixel parity class),
      K = 12·4 = 48 packed lanes (2.3x the MXU utilization), each directly
      emitting a half-res parity plane of lrelu(conv1);
    - the stride-2 3x3 conv2 splits into a 1x1 + 1x2 + 2x1 + 2x2 conv over
      those parity planes (its taps hit each parity class disjointly), summed.

    Exact up to f32 summation order. Stride/padding are fixed to the NetC
    head's (s1 p3 k7, then s2 p1 k3); H and W must be even.
    """
    import numpy as np

    b, h, w, cin = x.shape
    kh, kw, _, cout = w1.shape
    assert kh == 7 and kw == 7 and h % 2 == 0 and w % 2 == 0
    xd = x.reshape(b, h // 2, 2, w // 2, 2, cin)
    xd = xd.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * cin)

    d = np.arange(7)

    def parity_maps(p):
        s = p + d - 3
        e = s // 2
        return e - (p - 2), s - 2 * e  # kernel row 0..3, source parity 0/1

    DY, DX, C = np.meshgrid(d, d, np.arange(cin), indexing="ij")
    planes = {}
    for py in (0, 1):
        ky, qy = parity_maps(py)
        for px in (0, 1):
            kx, qx = parity_maps(px)
            wt = jnp.zeros((4, 4, 4 * cin, cout), w1.dtype)
            wt = wt.at[ky[DY], kx[DX],
                       (qy[DY] * 2 + qx[DX]) * cin + C].set(w1[DY, DX, C])
            o = lax.conv_general_dilated(
                xd, wt, (1, 1),
                [(2 - py, 1 + py), (2 - px, 1 + px)],
                dimension_numbers=DIMNUMS, precision=precision,
            )
            if b1 is not None:
                o = o + b1
            planes[(py, px)] = leaky_relu(o)

    # stride-2 3x3: row taps dy∈{0,2} read parity-1 rows (offsets -1, 0),
    # dy=1 reads parity-0 rows (offset 0); likewise columns.
    def c2(plane, wsub, pad):
        return lax.conv_general_dilated(
            plane, wsub, (1, 1), pad, dimension_numbers=DIMNUMS,
            precision=precision,
        )

    out = (
        c2(planes[(0, 0)], w2[1:2, 1:2], [(0, 0), (0, 0)])
        + c2(planes[(0, 1)], w2[1:2, ::2], [(0, 0), (1, 0)])
        + c2(planes[(1, 0)], w2[::2, 1:2], [(1, 0), (0, 0)])
        + c2(planes[(1, 1)], w2[::2, ::2], [(1, 0), (1, 0)])
    )
    if b2 is not None:
        out = out + b2
    return leaky_relu(out)


def depthwise_deconv4x2(x: jax.Array, w_flipped: jax.Array, precision=None) -> jax.Array:
    """Depthwise ``ConvTranspose2d(C, C, kernel=4, stride=2, padding=1, groups=C)``.

    The reference uses this as a *trainable* 2x flow / cost-volume upsampler
    (reference ``src/models.py:144-152``).

    Implemented as the transposed-conv identity: dilate the input by 2 and
    run a stride-1 depthwise conv with the spatially flipped kernel and
    padding k-1-p = 2. A 16-tap PHASE DECOMPOSITION (``_deconv4x2_phases``)
    was measured and is kept for reference: although the profiler attributes
    9.1 ms to the 2-ch conv-path fusions, swapping in the decomposition made
    the FULL MODEL 14 ms/pair slower (158 vs 144, b2 @1024^2) — the conv
    fusions overlap work the explicit interleave serializes. Measured, kept
    off.

    ``w_flipped`` must already be spatially flipped and laid out ``(4, 4, 1, C)``
    (the torch->JAX converter performs the flip once at load time).
    """
    c = x.shape[-1]
    return lax.conv_general_dilated(
        x,
        w_flipped,
        window_strides=(1, 1),
        padding=[(2, 2), (2, 2)],
        lhs_dilation=(2, 2),
        dimension_numbers=DIMNUMS,
        feature_group_count=c,
        precision=precision,
    )


def _deconv4x2_phases(x: jax.Array, w_flipped: jax.Array) -> jax.Array:
    """Phase-decomposed depthwise deconv (see ``depthwise_deconv4x2``; exact,
    covered by test_ops, measured net-slower in-model):
      out[2u]   = wf[0]*x[u-1] + wf[2]*x[u]
      out[2u+1] = wf[1]*x[u]   + wf[3]*x[u+1]   (per dim)"""
    b, h, w, c = x.shape
    wf = w_flipped[:, :, 0, :]  # [4, 4, C]

    # x with a 1-px zero border so the u-1 / u+1 taps are plain slices
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    def tap(dy, dx):  # x[u+dy, v+dx] for every (u, v)
        return lax.slice(xp, (0, 1 + dy, 1 + dx, 0), (b, 1 + dy + h, 1 + dx + w, c))

    # (ky, dy) pairs per output-row parity a (same for columns with b)
    taps = {0: ((0, -1), (2, 0)), 1: ((1, 0), (3, 1))}
    phases = []
    for a in (0, 1):
        row = []
        for bb in (0, 1):
            o = None
            for ky, dy in taps[a]:
                for kx, dx in taps[bb]:
                    t = wf[ky, kx] * tap(dy, dx)
                    o = t if o is None else o + t
            row.append(o)
        phases.append(row)
    # interleave phases: [B, h, 2, w, 2, C] -> [B, 2h, 2w, C]
    out = jnp.stack([jnp.stack(r, axis=3) for r in phases], axis=2)
    return out.reshape(b, 2 * h, 2 * w, c)


def torch_conv_init(
    key: jax.Array,
    kh: int,
    kw: int,
    c_in: int,
    c_out: int,
    bias: bool = True,
    transpose_groups: Optional[int] = None,
):
    """Initialize conv params with torch's default scheme.

    torch uses ``kaiming_uniform_(a=sqrt(5))`` which reduces to
    ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))``, and the same bound for bias.
    For ``ConvTranspose2d`` torch computes fan_in from ``weight.size(1)``
    (= out_channels/groups), which we mirror via ``transpose_groups``.

    Returns ``(w, b)`` with ``w`` in HWIO layout (for transposed depthwise
    convs: already in the ``depthwise_deconv4x2`` layout).
    """
    kw_, kb_ = jax.random.split(key)
    if transpose_groups is None:
        fan_in = c_in * kh * kw
        shape = (kh, kw, c_in, c_out)
    else:
        fan_in = (c_out // transpose_groups) * kh * kw
        # depthwise transpose: stored (kh, kw, 1, C)
        shape = (kh, kw, c_in // transpose_groups, c_out)
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw_, shape, jnp.float32, -bound, bound)
    b = jax.random.uniform(kb_, (c_out,), jnp.float32, -bound, bound) if bias else None
    return w, b


def unfold_nhwc(x: jax.Array, k: int) -> jax.Array:
    """Extract k*k zero-padded sliding patches of a 1-channel NHWC map.

    Equivalent to ``torch.nn.functional.unfold(kernel_size=k, padding=(k-1)//2)``
    on a ``[B,1,H,W]`` tensor followed by a view back to ``[B,k*k,H,W]``
    (reference ``src/models.py:288-300``), but returned NHWC: ``[B,H,W,k*k]``.
    Patch channel order matches torch: d = dy*k + dx, row-major over the window.
    """
    b, h, w, c = x.shape
    assert c == 1
    pad = (k - 1) // 2
    xp = jnp.pad(x[..., 0], ((0, 0), (pad, pad), (pad, pad)))
    outs = []
    for dy in range(k):
        for dx in range(k):
            outs.append(lax.slice(xp, (0, dy, dx), (b, dy + h, dx + w)))
    return jnp.stack(outs, axis=-1)
