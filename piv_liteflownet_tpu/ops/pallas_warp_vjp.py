"""Pallas tent-transpose warp VJP: the image-gradient of ``backwarp`` as a
bounded-support GATHER over the adjoint, not a scatter.

The r4 train-step bill put the warp category at ~42 ms/step busy (256^2 b8
bf16), 21.4 ms of it the image-gradient scatter-add — XLA lowers
``d backwarp / d img`` to a 4-tap row scatter at 2.3x the forward gather's
cost (work/warpbwd.log). The r4 handoff's feasibility math killed the naive
source-stationary transpose (~4x forward-tent work, commit ee5f43a). This
kernel uses the reformulation that math missed: the adjoint of a
bounded-support gather is itself a bounded-support gather over the adjoint
output,

    g_img[n] = sum_d tent(d_x + u(n+d)) * tent(d_y + v(n+d)) * gout[n+d]

— structurally the FORWARD tent kernel (ops/pallas_feat_warp.py) with two
changes: the tap weights read the flow at the TAP position (so u, v ride the
slab as two extra planar channels and each tap pays ~5 extra VPU ops for its
weight plane, shared across channels), and the tap window is (2*ry+3)^2
instead of (2*ry+2)^2. Estimated work ~1.3-1.4x the forward tent — under the
handoff's <2x go bar, vs the XLA scatter's measured 2.3x-of-forward-gather.

Exactness: complete tap coverage needs, for every read position
m = n - b_T + e, |f(m) - b_T| <= ry, where b_T is the per-tile integer base.
``warp_img_grad_bounds_ok`` checks the sufficient pair (global per-tile
residual r1) + (windowed tile-base spread within DMA reach) <= ry on device;
``backwarp_tvjp`` falls back to the exact XLA scatter when it fails, so the
custom VJP is exact-always (same guard discipline as the forward kernels).

Training-only shape gate: w >= 128, h >= 16, stride == 1 (the strided M-warp
keeps the XLA scatter). Reference semantics being differentiated:
``grid_sample(bilinear, zeros, align_corners=True)`` (reference
``src/models.py:20-35``); reference backward precedent: the per-sample
scatter-kernel loop at ``src/correlation.py:361-396``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from piv_liteflownet_tpu.ops.pallas_rgb_warp import _tile_mean


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _warp_vjp_kernel(sy_ref, phase_ref, bu_ref, bv_ref, gf_ref, out_ref,
                     slab_ref, sem, *, c, th, sh, re, nt):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ib = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    sy = pl.multiple_of(sy_ref[ib, ti, tj], 8)
    dma = pltpu.make_async_copy(
        gf_ref.at[ib, :, pl.ds(sy, sh), pl.ds(128 * tj, 384)],
        slab_ref,
        sem,
    )
    dma.start()

    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    phase = phase_ref[ib, ti, tj]
    bu = bu_ref[ib, ti, tj]
    bv = bv_ref[ib, ti, tj]
    dma.wait()

    def rot(plane):
        # same dynamic-rotate rules as the forward kernel: widen to f32 first
        # (no bf16 rotate lowering) and normalize shifts non-negative
        # (negative shifts mis-rotate on device; r4 probes /tmp/roll_bias).
        plane = pltpu.roll(plane, jnp.remainder(-phase, sh), axis=0)
        return pltpu.roll(plane, jnp.remainder(bu, 384), axis=1)

    # tap weight planes from the flow channels (slab planes c and c+1),
    # shared by every gout channel:
    #   w_t = tent(ex + u(tap) - bu) * tent(ey + v(tap) - bv)
    # where u/v are read AT the tap position (the structural difference from
    # the forward tent, whose weights use the center pixel's flow) and bu/bv
    # are THIS tile's integer base (taps may cross into neighbor tiles; the
    # host-side guard bounds |f(tap) - b_mine| <= ry there).
    uplane = rot(slab_ref[c].astype(jnp.float32)) - bu.astype(jnp.float32)
    vplane = rot(slab_ref[c + 1].astype(jnp.float32)) - bv.astype(jnp.float32)
    wprod = []
    for dy in range(nt):
        ey = jnp.float32(dy - re)
        for dx in range(nt):
            ex = jnp.float32(dx - re)
            us = uplane[dy : dy + th, 128 - re + dx : 256 - re + dx]
            vs = vplane[dy : dy + th, 128 - re + dx : 256 - re + dx]
            wx = jnp.maximum(zero, one - jnp.abs(ex + us))
            wy = jnp.maximum(zero, one - jnp.abs(ey + vs))
            wprod.append(wx * wy)

    def cbody(ci, carry):
        plane = rot(slab_ref[ci].astype(jnp.float32))
        acc = jnp.zeros((th, 128), jnp.float32)
        t = 0
        for dy in range(nt):
            for dx in range(nt):
                tap = plane[dy : dy + th, 128 - re + dx : 256 - re + dx]
                acc = acc + wprod[t] * tap
                t += 1
        out_ref[0, ci] = acc.astype(out_ref.dtype)
        return carry

    lax.fori_loop(0, c, cbody, 0)


@functools.partial(
    jax.jit, static_argnames=("ry", "vlim", "tile_h", "interpret"))
def warp_img_grad_pallas(
    gout: jax.Array,
    flow: jax.Array,
    ry: int = 4,
    vlim: int = 8,
    tile_h: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """UNGUARDED tent-transpose image gradient (exact iff the bounds of
    :func:`warp_img_grad_bounds_ok` hold — ``backwarp_tvjp`` enforces them).

    gout [B,H,W,C] (adjoint of the warp output), flow [B,H,W,2] (pixel
    units, the same flow the forward warped with). -> g_img [B,H,W,C].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = gout.shape
    th = min(tile_h, h)
    nty = -(-h // th)
    hp = nty * th
    cw = _round_up(w, 128)
    ns = cw // 128
    re = ry + 1
    nt = 2 * re + 1
    sh = _round_up(th + nt + 7, 8)   # tap rows + DMA alignment phase
    my = vlim + re + 8               # y margin: clipped base + taps + phase
    dtype = gout.dtype

    # planar [B, C+2, H, W]: gout channels + the u and v planes (the taps
    # read flow at the same shifted positions as gout — one shared slab DMA)
    gf = jnp.concatenate(
        [jnp.moveaxis(gout, -1, 1), jnp.moveaxis(flow, -1, 1)], axis=1)
    gf = jnp.pad(
        gf.astype(dtype),
        ((0, 0), (0, 0), (my, my + (hp - h) + sh), (128, 256 + cw - w)),
    )

    f = flow.astype(jnp.float32)
    if hp != h or cw != w:
        f = jnp.pad(f, ((0, 0), (0, hp - h), (0, cw - w), (0, 0)), mode="edge")
    u, v = f[..., 0], f[..., 1]

    def tile_base(comp, lim):
        m = _tile_mean(comp, nty, th, ns)  # [B, nty, ns]
        return jnp.clip(jnp.round(m), -float(lim), float(lim)).astype(jnp.int32)

    bv = tile_base(v, vlim)
    bu = tile_base(u, min(vlim, 126 - re))

    # The u/v slab planes carry RAW flow (taps cross tile boundaries, so a
    # per-pixel residual pre-subtraction would bake in the WRONG base for
    # cross-tile taps); the kernel subtracts this tile's scalar base after
    # the rotate — two scalar-broadcast subtracts per tile.
    iy = lax.broadcasted_iota(jnp.int32, (1, nty, 1), 1) * th
    sy_raw = iy - bv + (my - re)
    sy = (sy_raw // 8) * 8
    phase = sy_raw - sy  # 0..7

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # sy, phase, bu, bv
        grid=(b, nty, ns),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # gf (HBM)
        ],
        out_specs=pl.BlockSpec((1, c, th, 128), lambda ib, i, j, *_: (ib, 0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c + 2, sh, 384), dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_warp_vjp_kernel, c=c, th=th, sh=sh, re=re, nt=nt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c, hp, cw), dtype),
        interpret=interpret,
    )(sy, phase, bu, bv, gf)
    return jnp.moveaxis(out[:, :, :h, :w], 1, -1)


def warp_img_grad_bounds_ok(flow: jax.Array, ry: int = 4, vlim: int = 8,
                            tile_h: int = 16) -> jax.Array:
    """Scalar bool: the tent-transpose tap window covers every contribution.

    Sufficient condition per component: (global per-tile residual vs the
    tile's own base) + (tile-base spread over the tiles a tile's taps can
    read from) <= ry. The spread window is the DMA reach: +-ceil((vlim+re)/
    tile_h) row tiles, +-ceil((vlim+re)/128) lane tiles."""
    b, h, w, _ = flow.shape
    th = min(tile_h, h)
    nty = -(-h // th)
    cw = _round_up(w, 128)
    ns = cw // 128
    re = ry + 1
    f = flow.astype(jnp.float32)
    if nty * th != h or cw != w:
        f = jnp.pad(f, ((0, 0), (0, nty * th - h), (0, cw - w), (0, 0)),
                    mode="edge")
    kr = -(-(vlim + re) // th)
    kc = -(-(min(vlim, 126 - re) + re) // 128)

    def comp_ok(comp, lim):
        m = _tile_mean(comp, nty, th, ns)  # [B, nty, ns]
        base = jnp.clip(jnp.round(m), -float(lim), float(lim))
        r1 = jnp.max(jnp.abs(comp.reshape(b, nty, th, ns, 128)
                             - base[:, :, None, :, None]))
        lo = lax.reduce_window(base, jnp.inf, lax.min,
                               (1, 2 * kr + 1, 2 * kc + 1), (1, 1, 1), "SAME")
        hi = lax.reduce_window(base, -jnp.inf, lax.max,
                               (1, 2 * kr + 1, 2 * kc + 1), (1, 1, 1), "SAME")
        return r1 + jnp.max(hi - lo) <= float(ry)

    return comp_ok(f[..., 0], min(vlim, 126 - re)) & comp_ok(f[..., 1], vlim)


def _pallas_ok() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def make_backwarp_tvjp(ry: int = 4, vlim: int = 8, tile_h: int = 16,
                       interpret: bool = False):
    """Build a ``backwarp(img, flow)``-equivalent (stride 1) whose VJP uses
    the tent-transpose kernel for the image gradient when the bounds hold
    (exact XLA-scatter fallback otherwise; flow gradient always the exact
    gather-shaped formula via ``jax.vjp``)."""
    from piv_liteflownet_tpu.ops.warp import backwarp

    @jax.custom_vjp
    def bw(img, flow):
        return backwarp(img, flow)

    def fwd(img, flow):
        return backwarp(img, flow), (img, flow)

    def bwd(res, g):
        img, flow = res
        _, pull_f = jax.vjp(lambda f: backwarp(img, f), flow)
        (gflow,) = pull_f(g)

        def scatter_img_grad(gg):
            _, pull_i = jax.vjp(lambda a: backwarp(a, flow), img)
            (gimg,) = pull_i(gg)
            return gimg

        h, w = img.shape[1], img.shape[2]
        # Mixed dtypes never occur in the model (bf16 training's flow IS
        # bf16); routing them to the scatter avoids silently quantizing an
        # f32 flow to the slab dtype for the tap weights.
        if (w < 128 or h < 16 or img.dtype != flow.dtype
                or not (_pallas_ok() or interpret)):
            return scatter_img_grad(g), gflow
        gimg = lax.cond(
            warp_img_grad_bounds_ok(flow, ry, vlim, tile_h),
            lambda gg: warp_img_grad_pallas(gg, flow, ry, vlim, tile_h,
                                            interpret=interpret),
            scatter_img_grad,
            g,
        )
        return gimg, gflow

    bw.defvjp(fwd, bwd)
    return bw


#: default instance. The r5 in-model adjudication (BASELINE.md round-5
#: table; work/r5_train_tentvjp*.log) is monotone in radius — 121/81/49
#: taps = 154.7/149.2/145.1 ms/step — so the kernel is VPU-work-bound and
#: ry=2 ships as the default: it covers the training regime's per-tile
#: residuals while steep flows take the exact scatter fallback (the guard
#: makes every radius exact-always). PIV_TVJP_RY stays as the probe knob.
backwarp_tvjp = make_backwarp_tvjp(
    ry=int(__import__("os").environ.get("PIV_TVJP_RY", "2")))
