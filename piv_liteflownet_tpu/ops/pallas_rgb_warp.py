"""Fused rgb backwarp + occlusion norm as a planar Pallas kernel.

The NetE-R occlusion proxy is ``norm = sqrt(sum_c (img1 - warp(img2, flow))^2)``
(reference ``src/models.py:276-277``) — the warped rgb itself is never consumed.
The r2 profile attributed ~34 ms/pair (b4, 1024^2) to this rgb warp + norm: the
packed gather is descriptor-bound (~18 ns/row regardless of width), and an
NHWC tent kernel wastes 128/3 of every vector op on channel padding.

This kernel computes the norm directly, planar and per-channel:

- Layout: ``img2`` as padded planes ``[B, 3, Hp, Wp]`` — rows in sublanes,
  x in lanes, channels a *python* loop (3 iterations sharing every weight
  plane). Full VPU utilization at c=3.
- y: per-row-band base shift ``round(mean v)``, applied as an 8-aligned HBM
  window DMA; the 0..7 alignment phase is absorbed into the v residual, so
  the y tent spans ``2r+9`` taps (13 at r=2).
- x: NO dynamic lane offsets (Mosaic would need 128-alignment) — a global
  tent over ``|u| <= lim`` (2*lim+2 static lane-shifted taps). PIV u
  displacements at the R warp are a few px (flow * scale_factor), so lim=8
  covers real data; the on-device guard falls back to the exact gather path
  otherwise.
- Tent weights ``relu(1 - |res - d|)`` are nonzero exactly at the true 4
  bilinear taps, so the result is EXACT (grid_sample bilinear/zeros/
  align_corners=True semantics, reference ``src/models.py:20-35``) whenever
  the residual bounds hold — which ``rgb_warp_norm`` checks on device,
  ``lax.cond``-falling back to the gather otherwise.
- All tap accumulation is by VALUE in unrolled loops (the r2 NHWC kernel's
  ``acc_ref[...] +=`` round-tripped VMEM per tap and lost 2x).

The norm is differentiation-free by construction: the reference detaches it
(``.detach()``), so this forward-only kernel is valid in training too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _tile_mean(comp: jax.Array, nty: int, th: int, ns: int) -> jax.Array:
    """Per-(th x 128)-tile mean of a [B, nty*th, ns*128] component as a
    reshape-reduce: [B, nty, ns]. Replaces ``lax.reduce_window`` (same
    values), whose TPU lowering is several times slower than a plain reduce
    over reshaped minor dims — this runs in the critical path of every
    pyramid level's guard (measured ~3.7 ms/pair of guard cost at v1
    1024^2, work/ROUND4_NOTES.md)."""
    b = comp.shape[0]
    return comp.reshape(b, nty, th, ns, 128).mean(axis=(2, 4))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _norm_kernel(sy_ref, img1_ref, u_ref, rv_ref, img2_ref, out_ref,
                 slab_ref, sems, *, th, cw, sh, r, lim, nx, ny, ns):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ib = pl.program_id(0)
    ti = pl.program_id(1)

    # One 384-lane slab per 128-column segment: each segment has its own
    # y-base (the r2-granularity 16x128 tiling — a single full-width base
    # fails real flows whose v varies more than r across the row band).
    # Slab x origin for segment j is padded-image lane 128*j (128-aligned,
    # the lane-dim DMA constraint); output col c samples slab-local lane
    # c + 128 + u, so tap dx reads [128 - lim + dx : ... + 128).
    dmas = []
    for j in range(ns):
        sy = pl.multiple_of(sy_ref[ib, ti, j], 8)
        d = pltpu.make_async_copy(
            img2_ref.at[ib, :, pl.ds(sy, sh), pl.ds(128 * j, 384)],
            slab_ref.at[j],
            sems.at[j],
        )
        d.start()
        dmas.append(d)

    dt = slab_ref.dtype
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)

    u = u_ref[0]    # (th, cw) f32
    rv = rv_ref[0]  # (th, cw) f32: per-segment v residual incl. DMA phase

    out = []
    for j in range(ns):
        dmas[j].wait()
        sl = 128 * j
        uj = u[:, sl:sl + 128]
        rvj = rv[:, sl:sl + 128]
        wxs = [jnp.maximum(zero, one - jnp.abs(uj - jnp.float32(dx - lim)))
               for dx in range(nx)]
        accs = [jnp.zeros((th, 128), jnp.float32) for _ in range(3)]
        for dy in range(ny):
            wy = jnp.maximum(zero, one - jnp.abs(rvj - jnp.float32(dy - r)))
            for dx in range(nx):
                wprod = wy * wxs[dx]
                base = 128 - lim + dx
                for c in range(3):
                    tap = slab_ref[j, c, dy:dy + th, base:base + 128]
                    accs[c] = accs[c] + wprod * tap.astype(jnp.float32)
        nsq = jnp.zeros((th, 128), jnp.float32)
        for c in range(3):
            d = img1_ref[0, c, :, sl:sl + 128].astype(jnp.float32) - accs[c]
            nsq = nsq + d * d
        out.append(jnp.sqrt(nsq))
    out_ref[0] = jnp.concatenate(out, axis=1).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("r", "lim", "tile_h", "interpret"),
)
def rgb_warp_norm_pallas(
    img1: jax.Array,
    img2: jax.Array,
    flow: jax.Array,
    r: int = 3,
    lim: int = 8,
    tile_h: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """UNGUARDED fused warp+norm (callers wanting guaranteed exactness use
    :func:`rgb_warp_norm`). img1/img2 [B,H,W,3], flow [B,H,W,2] (pixel units,
    pre-scaled). Returns [B,H,W,1]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, _ = img1.shape
    assert lim <= 120, "x tent must fit the 128-lane segment halo"
    th = min(tile_h, h)
    nty = -(-h // th)
    hp_rows = nty * th
    nx = 2 * lim + 2
    ny = 2 * r + 9  # r-tent + 0..7 DMA alignment phase
    cw = _round_up(w, 128)  # compute width (lanes); ns 128-col segments
    ns = cw // 128
    sh = _round_up(th + ny - 1, 8)
    dtype = img1.dtype

    # planar images; img2 padded so any guarded window stays in bounds.
    # x: 128 lanes each side (segment slabs are 3 aligned 128-blocks wide,
    # origin at padded lane 128*j = global x 128*(j-1)).
    my = lim + r + 16
    p1 = jnp.moveaxis(img1, -1, 1)  # [B,3,H,W]
    p1 = jnp.pad(p1, ((0, 0), (0, 0), (0, hp_rows - h), (0, cw - w)))
    p2 = jnp.moveaxis(img2, -1, 1)
    p2 = jnp.pad(
        p2,
        ((0, 0), (0, 0), (my, my + (hp_rows - h) + sh), (128, 256 + cw - w)),
    )

    f = flow.astype(jnp.float32)
    if hp_rows != h or cw != w:
        f = jnp.pad(f, ((0, 0), (0, hp_rows - h), (0, cw - w), (0, 0)),
                    mode="edge")
    u, v = f[..., 0], f[..., 1]
    # per-(th x 128)-tile y base
    vmean = _tile_mean(v, nty, th, ns)  # [B, nty, ns]
    bv = jnp.clip(jnp.round(vmean), -float(lim), float(lim)).astype(jnp.int32)

    iy = lax.broadcasted_iota(jnp.int32, (1, nty, 1), 1) * th
    sy_raw = iy + bv + (my - r)
    sy = (sy_raw // 8) * 8
    phase = (sy_raw - sy).astype(jnp.float32)  # 0..7
    corr = phase - bv.astype(jnp.float32)      # [B, nty, ns]
    rv = (v.reshape(b, nty, th, ns, 128)
          + corr[:, :, None, :, None]).reshape(b, hp_rows, cw)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nty),
        in_specs=[
            pl.BlockSpec((1, 3, th, cw), lambda ib, i, *_: (ib, 0, i, 0),
                         memory_space=pltpu.VMEM),  # img1 planes
            pl.BlockSpec((1, th, cw), lambda ib, i, *_: (ib, i, 0),
                         memory_space=pltpu.VMEM),  # u
            pl.BlockSpec((1, th, cw), lambda ib, i, *_: (ib, i, 0),
                         memory_space=pltpu.VMEM),  # rv
            pl.BlockSpec(memory_space=pl.ANY),      # img2 planes (HBM)
        ],
        out_specs=pl.BlockSpec((1, th, cw), lambda ib, i, *_: (ib, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ns, 3, sh, 384), dtype),
            pltpu.SemaphoreType.DMA((ns,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_norm_kernel, th=th, cw=cw, sh=sh, r=r,
                          lim=lim, nx=nx, ny=ny, ns=ns),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hp_rows, cw), dtype),
        interpret=interpret,
    )(sy, p1, u, rv, p2)
    return out[:, :h, :w, None]


def rgb_norm_bounds_ok(flow: jax.Array, r: int = 3, lim: int = 8,
                       tile_h: int = 16) -> jax.Array:
    """Scalar bool: the kernel's exactness conditions hold — |u| <= lim and
    per-(th x 128)-tile |v - round(tile mean v)| <= r (mean clipped to lim)."""
    b, h, w, _ = flow.shape
    th = min(tile_h, h)
    nty = -(-h // th)
    cw = _round_up(w, 128)
    f = flow.astype(jnp.float32)
    if nty * th != h or cw != w:
        f = jnp.pad(f, ((0, 0), (0, nty * th - h), (0, cw - w), (0, 0)),
                    mode="edge")
    u, v = f[..., 0], f[..., 1]
    ns = cw // 128
    vmean = _tile_mean(v, nty, th, ns)
    bv = jnp.clip(jnp.round(vmean), -float(lim), float(lim))
    rv = v.reshape(b, nty, th, ns, 128) - bv[:, :, None, :, None]
    return (jnp.max(jnp.abs(u)) <= float(lim)) & (jnp.max(jnp.abs(rv)) <= float(r))


def rgb_warp_norm_gather(img1: jax.Array, img2: jax.Array,
                         flow: jax.Array) -> jax.Array:
    """Exact fallback: packed-gather warp + norm (the pre-kernel formulation)."""
    from piv_liteflownet_tpu.ops.warp import backwarp

    d = img1 - backwarp(img2, flow)
    return jnp.sqrt(jnp.sum(jnp.square(d), axis=-1, keepdims=True))


#: (r, lim) tent tiers for the guarded path, narrow->wide. Chosen from the
#: measured per-level bounds of the TRAINED v1 model on synthetic PIV fields
#: (work/guard_resid.log, r4): benign flows (vortex s3 / shear 4 / sine 2.5)
#: reach |u| 5.0 and tile residual 3.2 at L1 -> (r=4, lim=8) covers them.
#: A second wide tier (11, 13) for steep flows (|u| to 12, residual 10.1) was
#: tried and REVERTED (r4): its 868-tap unrolled body blows Mosaic's 16M
#: scoped-VMEM stack at small levels (18.77M frame at the 128^2 f32 level),
#: and lax.switch compiles every branch — so it broke ALL device inference,
#: not just steep flows. The feat-warp analog also measured a wide tent 2.3x
#: WORSE than the gather it replaces, so steep flows go straight to the exact
#: gather fallback instead.
RGB_NORM_TIERS = ((4, 8),)


def rgb_warp_norm(img1: jax.Array, img2: jax.Array, flow: jax.Array,
                  tiers=RGB_NORM_TIERS, tile_h: int = 16,
                  interpret: bool = False) -> jax.Array:
    """Exact occlusion norm ``sqrt(sum_c (img1 - backwarp(img2, flow))^2)``:
    the narrowest tent kernel whose exactness bounds hold on the actual flow
    (checked ON DEVICE), packed-gather fallback when none do."""
    idx = jnp.int32(len(tiers))  # default: gather fallback
    for i in range(len(tiers) - 1, -1, -1):
        r, lim = tiers[i]
        idx = jnp.where(rgb_norm_bounds_ok(flow, r, lim, tile_h), jnp.int32(i), idx)
    branches = [
        (lambda a, b_, f, rl=rl: rgb_warp_norm_pallas(
            a, b_, f, rl[0], rl[1], tile_h, interpret))
        for rl in tiers
    ]
    branches.append(lambda a, b_, f: rgb_warp_norm_gather(a, b_, f))
    return lax.switch(idx, branches, img1, img2, flow)


def _zero_tangent(fn):
    """Wrap ``fn`` so differentiation treats it as a constant (zero tangent/
    cotangent). The model stop-gradients the occlusion norm anyway (reference
    keeps it out of the grad path), but ``stop_gradient`` on the *output*
    still JVP-traces the producer — which a pallas_call cannot do."""
    f = jax.custom_jvp(fn)

    @f.defjvp
    def _jvp(primals, tangents):  # noqa: ANN001
        out = fn(*primals)
        return out, jnp.zeros_like(out)

    return f


rgb_warp_norm_nograd = _zero_tangent(
    lambda a, b_, f: rgb_warp_norm(a, b_, f))
rgb_warp_norm_pallas_nograd = _zero_tangent(
    lambda a, b_, f: rgb_warp_norm_pallas(a, b_, f))
